package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.AppProtocols

/** Unit coverage for the round-3 classifier additions (the tail of
  * capture/parsers/misc.c plus nfs.c, rpc.c, dhcpv6, isakmp).
  */
class MiscClassifierSpec extends AnyFunSuite {

  private val empty = Array.emptyByteArray
  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def s(str: String): Array[Byte] =
    str.getBytes(StandardCharsets.ISO_8859_1)

  private def tcp(src: Array[Byte], dst: Array[Byte] = empty,
      srcPort: Int = 40000, dstPort: Int = 8000): Seq[String] =
    AppProtocols.classify(6, srcPort, dstPort, src, dst, src, dst)

  private def udp(src: Array[Byte], dst: Array[Byte] = empty,
      srcPort: Int = 40000, dstPort: Int = 8000,
      isV6: Boolean = false): Seq[String] =
    AppProtocols.classify(17, srcPort, dstPort, src, dst, src, dst, isV6)

  test("tcp misc classifiers") {
    assert(tcp(b(0xf9, 0xbe, 0xb4, 0xd9) ++ s("rest")).contains("bitcoin"))
    assert(tcp(s("NSClient++ here")).contains("nsclient"))
    assert(tcp(s("ZBXD\u0001xx")).contains("zabbix"))
    assert(tcp(s("JRMI\u0000\u0002K")).contains("rmi"))
    assert(tcp(s("<policy-file-request/>")).contains("flash-policy"))
    assert(tcp(s("\u00a4\u0000\u0000\u0000VT01payload")).contains("stream-ihscp"))
    assert(tcp(s("CBKPPR\u0005P...")).contains("honeywell-tcc"))
    assert(tcp(s("@PJL INFO ID\r\n")).contains("pjl"))
    assert(tcp(s("\u001b%-12345X@PJL")).contains("pjl"))
    assert(tcp(s("\u0005\u0000\u000brest of bind")).contains("dcerpc"))
    assert(tcp(s("\u0000\u0000\u0000\u0008\u0000\u0001\u0000\u0003"))
      .contains("nzsql"))
    assert(tcp(s("--splunk-cooked-mode ")).contains("splunk"))
    assert(tcp(s("abcdef\u0000\u0006\u0000\u0000\u0000\u0005_raw"))
      .contains("splunk-replication"))
    assert(tcp(s("l\u0000\u000b\u0000aaaa")).contains("x11"))
    assert(tcp(s("VALUE key 0 5\r\nhello")).contains("memcached"))
    assert(tcp(s("HBas\u0000P")).contains("hbase"))
    assert(tcp(s("hrpc\u0009rest")).contains("hadoop"))
    assert(tcp(b(0x00, 0x1c, 0x50, 1, 2, 0x0a, 3, 4, 5, 6)).contains("hdfs"))
    assert(tcp(s("zk_version 3.4")).contains("zookeeper"))
    assert(tcp(s("mntr\nzk")).contains("zookeeper"))
    assert(tcp(s("ES\u0000\u0000rest")).contains("elasticsearch"))
    assert(tcp(s("RTSP/1.0 200 OK")).contains("rtsp"))
    // mqtt CONNECT: 0x10, remaining-length, 00 04 'MQTT'
    assert(tcp(b(0x10, 0x20, 0x00, 0x04) ++ s("MQTT") ++
      Array.fill[Byte](26)(0)).contains("mqtt"))
    // gh0st windows-framing: len LE at 5-6, zlib 0x78 at 13
    val gh = b(0, 0, 0, 0, 0, 20, 0, 0, 0, 0, 0, 0, 0, 0x78, 0x9c) ++
      Array.fill[Byte](5)(1)
    assert(tcp(gh).contains("gh0st"))
    // flap: '*' channel frame, length matches
    assert(tcp(b(0x2a, 0x01, 0, 1, 0, 4, 9, 9, 9, 9)).contains("flap"))
    assert(tcp(s("whois.iana.org\r\n"), dstPort = 43).contains("whois"))
    assert(!tcp(empty, dstPort = 43).contains("whois"))
    // sccp: dst 2000, len-byte + 7 NULs
    assert(tcp(b(16, 0, 0, 0, 0, 0, 0, 0) ++ Array.fill[Byte](16)(2),
      dstPort = 2000).contains("sccp"))
    // wudo: dst 7680
    assert(tcp(b(0, 0, 0, 0) ++ s("blockdata__"), dstPort = 7680)
      .contains("wudo"))
    // nfs over tcp: 4-byte record mark + rpc call v2 + prog 100003
    val nfsTcp = b(0x80, 0, 0, 40, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 2,
      0x00, 0x01, 0x86, 0xa3) ++ Array.fill[Byte](8)(0)
    assert(tcp(nfsTcp).contains("nfs"))
  }

  test("udp misc classifiers") {
    assert(udp(s("M-SEARCH * HTTP/1.1\r\n")).contains("ssdp"))
    assert(udp(s("BJNP")).contains("bjnp"))
    assert(udp(s("VS01xx")).contains("steam-friends"))
    assert(udp(s("\u00ff\u00ff\u00ff\u00ffTSource Engine Query"))
      .contains("valve-a2s"))
    assert(udp(b(2, 1, 0, 0) ++ Array.fill[Byte](20)(0), dstPort = 520)
      .contains("rip"))
    assert(!udp(b(2, 1, 0, 0) ++ Array.fill[Byte](20)(0)).contains("rip"))
    // netflow v5: count=2, systime 2020-ish
    val nf = b(0, 5, 0, 2, 0, 0, 0, 1, 0x5e, 0, 0, 0) ++ Array.fill[Byte](36)(0)
    assert(udp(nf).contains("netflow"))
    // 8-byte frame header (id, seq, count, reserved=0) then the command —
    // the needle sits at offset 6 (misc.c:510)
    assert(udp(b(0, 7, 0, 0, 0, 1, 0, 0) ++ s("stats\r\n"))
      .contains("memcached"))
    assert(udp(b(0, 7, 0, 0, 0, 1, 0, 0) ++ s("gets k\r\n"))
      .contains("memcached"))
    // command at the OLD wrong offset (6) must not classify
    assert(!udp(b(0, 0, 0, 0, 0, 0) ++ s("stats") ++ s("junk"))
      .contains("memcached"))
    // nfs/rpc over udp: xid + call v2 at offset 4, prog 1000xx
    def rpc(last: Int) = b(9, 9, 9, 9, 0, 0, 0, 0, 0, 0, 0, 2,
      0x00, 0x01, 0x86, last) ++ Array.fill[Byte](8)(0)
    assert(udp(rpc(0xa3)).contains("nfs"))
    assert(udp(rpc(0xa0)).contains("portmap"))
    assert(udp(rpc(0xa5)).contains("mount"))
    assert(udp(rpc(0xff)) == Seq("udp"))
    assert(udp(b(1, 0, 0, 0), dstPort = 547, isV6 = true).contains("dhcpv6"))
    assert(!udp(b(1, 0, 0, 0), dstPort = 547).contains("dhcpv6"))
    assert(!udp(b(2, 0, 0, 0), dstPort = 547, isV6 = true).contains("dhcpv6"))
    val isakmp = Array.fill[Byte](16)(7) ++ b(1, 0x10) ++ Array.fill[Byte](8)(0)
    assert(udp(isakmp, dstPort = 500).contains("isakmp"))
    assert(!udp(isakmp, dstPort = 501).contains("isakmp"))
    assert(udp(s("Ir") ++ Array.fill[Byte](20)(0), dstPort = 8211)
      .contains("aruba-papi"))
    assert(udp(b(0, 3, 16) ++ Array.fill[Byte](17)(0), srcPort = 1985,
      dstPort = 1985).contains("hsrp"))
    assert(udp(b(1, 40, 2) ++ Array.fill[Byte](17)(0), srcPort = 2029,
      dstPort = 2029).contains("hsrpv2"))
    val safet = b(0, 0, 24) ++ Array.fill[Byte](21)(0)
    assert(udp(safet, dstPort = 23294).contains("safet"))
    assert(udp(s("x{\"host_int\": 1}"), dstPort = 17500)
      .contains("dropbox-lan-sync"))
  }

  test("tacacs: needle + port-49 gate, both transports") {
    val hdr = b(0xc0, 0x01, 0x01) ++ Array.fill[Byte](9)(0)
    assert(tcp(hdr, dstPort = 49).contains("tacacs"))
    assert(udp(hdr, srcPort = 49).contains("tacacs"))
    assert(tcp(b(0xc1, 0x01, 0x02) ++ Array.fill[Byte](9)(0), dstPort = 49)
      .contains("tacacs"))
    // needle without the port gate stays untagged (tacacs_classify checks
    // port1/port2 == 49 — misc.c:185-189)
    assert(!tcp(hdr, dstPort = 4949).contains("tacacs"))
    // port without the needle stays untagged
    assert(!tcp(s("hello"), dstPort = 49).contains("tacacs"))
  }

  test("body magic: split-zip needle replicates the C escape quirk") {
    import graft.etl.Magic
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // The reference needle "PK\007\008PK" is really PK \x07 \x00 '8' P K
    // (\008 = \0 + '8'): that sequence must match...
    assert(Magic.detect(bytes('P', 'K', 7, 0, '8', 'P', 'K', 0))
      .contains("application/zip"))
    // ...while the spec-correct PK\x07\x08 "PK" data descriptor must NOT
    // (the reference returns no magic for it).
    assert(Magic.detect(bytes('P', 'K', 7, 8, 'P', 'K', 0, 0)).isEmpty)
    // len > 7 guard: a 7-byte body is one short of the needle
    assert(Magic.detect(bytes('P', 'K', 7, 0, '8', 'P', 'K')).isEmpty)
  }

  test("body magic: JSON detection is ASCII-isalpha, not Latin-1") {
    import graft.etl.Magic
    assert(Magic.detect("{\"k\":1}".getBytes("ISO-8859-1"))
      .contains("application/json"))
    // 0xB5 (µ) is a letter in Latin-1 but not under C-locale isalpha()
    assert(Magic.detect(Array[Byte]('{', '"', 0xb5.toByte, '"')).isEmpty)
    assert(Magic.detect(Array[Byte]('{', '"', 0xc0.toByte, '"')).isEmpty)
  }
}
