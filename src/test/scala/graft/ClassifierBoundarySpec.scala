package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.AppProtocols

/** Boundary sweep for the first-bytes/port protocol-classifier registry
  * (reference: capture/parsers.c:1062-1144 dispatch; needle + gate
  * definitions in capture/parsers/{misc,nfs,rpc,dhcp}.c). Every
  * classifier gets a minimal matching payload typed from the
  * reference's registration (needle at offset, `sizeof(bytes)-1`
  * match length, dispatch gate `remaining >= offset + matchlen`, the
  * global `remaining < 2` refusal) plus its callback's own length and
  * content gates — then `classify` is swept over EVERY truncation of
  * that payload and the tag must appear exactly where the reference's
  * gates say it does (for the several callbacks that compare an
  * embedded frame length against the payload length — kafka, safet,
  * stun, gh0st, flap — that is a single exact length, not a floor).
  * Near-miss byte flips on the load-bearing needle/gate bytes and
  * wrong-port variants must never tag.
  */
class ClassifierBoundarySpec extends AnyFunSuite {

  private val empty = Array.emptyByteArray
  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def s(str: String): Array[Byte] =
    str.getBytes(StandardCharsets.ISO_8859_1)
  private def fill(n: Int): Array[Byte] = Array.fill[Byte](n)('9')

  /** One sweep case: `expect(cut)` says whether `tag` must be present
    * when classify sees the first `cut` bytes of `payload`.
    */
  private final case class E(name: String, tag: String, proto: Int,
      payload: Array[Byte], expect: Int => Boolean,
      srcPort: Int = 40000, dstPort: Int = 8000, isV6: Boolean = false)

  private def run(e: E, cut: Int): Boolean = {
    val p = e.payload.take(cut)
    AppProtocols.classify(e.proto, e.srcPort, e.dstPort, p, empty, p, empty,
      e.isV6).contains(e.tag)
  }

  // --- simple needles: tag iff cut >= needle length (all needles are
  // >= 2 bytes, so the dispatcher's 2-byte floor is subsumed) ---------
  private def simple(name: String, proto: Int, needle: Array[Byte]): E =
    E(name, name, proto, needle ++ fill(6), _ >= needle.length)

  private val simples = Seq(
    simple("bittorrent", 6, b(0x13) ++ s("BitTorrent protocol")),
    simple("bittorrent", 6, s("BSYNC") ++ b(0)),
    simple("bittorrent", 17, s("d1:a")),
    simple("bittorrent", 17, s("d1:r")),
    simple("bittorrent", 17, s("d1:q")),
    simple("bitcoin", 6, b(0xf9, 0xbe, 0xb4, 0xd9)),
    simple("bitcoin", 6, b(0xf9, 0xbe, 0xb4, 0xfe)),
    simple("pop3", 6, s("+OK ")),
    simple("redis", 6, s("+PONG")),
    simple("redis", 6, s("-NOAUTH ")),
    simple("redis", 6, b(0x2a, '1', 0x0d, 0x0a, 0x24)),
    simple("redis", 6, b(0x2a, '5', 0x0d, 0x0a, 0x24)),
    simple("sip", 6, s("SIP/2.0")),
    simple("sip", 17, s("SIP/2.0")),
    simple("sip", 17, s("REGISTER sip:")),
    simple("sip", 6, s("NOTIFY sip:")),
    simple("thrift", 6, b(0x80, 0x01, 0x00, 0x01, 0x00, 0x00, 0x00)),
    simple("aerospike", 6,
      b(0x02, 0x01, 0, 0, 0, 0, 0, 0x4e) ++ s("node")),
    simple("aerospike", 6,
      b(0x02, 0x01, 0, 0, 0, 0, 0, 0x23) ++ s("node")),
    simple("cassandra", 6,
      b(0, 0, 0, 0x25, 0x80, 1, 0, 1, 0, 0, 0, 0x0c) ++ s("set_")),
    simple("cassandra", 6,
      b(0, 0, 0, 0x1d, 0x80, 1, 0, 1, 0, 0, 0, 0x10) ++ s("desc")),
    simple("nsclient", 6, s("NSClient")),
    simple("nsclient", 6, s("None&")),
    simple("ssdp", 17, s("M-SEARCH ")),
    simple("ssdp", 17, s("NOTIFY * ")),
    simple("zabbix", 6, s("ZBXD") ++ b(1)),
    simple("rmi", 6, s("JRMI") ++ b(0)),
    simple("flash-policy", 6, s("<policy-file-request/>")),
    simple("steam-friends", 17, s("VS01")),
    simple("valve-a2s", 17, b(0xff, 0xff, 0xff, 0xff) ++ s("TSou")),
    simple("stream-ihscp", 6, b(0xa4, 0, 0, 0) ++ s("VT01")),
    simple("honeywell-tcc", 6, s("CBKPPR") ++ b(5, 'P')),
    simple("pjl", 6, b(0x1b) ++ s("%-12345")),
    simple("pjl", 6, s("@PJL ")),
    simple("dcerpc", 6, b(5, 0, 0x0b)),
    simple("nzsql", 6, b(0, 0, 0, 8, 0, 1, 0, 3)),
    simple("splunk", 6, s("--splunk-cooked-mode")),
    simple("x11", 6, b(0x6c, 0, 0x0b, 0)),
    simple("memcached", 6, s("flush_all")),
    simple("memcached", 6, s("STORED\r\n")),
    simple("memcached", 6, s("END\r\n")),
    simple("memcached", 6, s("VALUE ")),
    simple("hbase", 6, s("HBas") ++ b(0)),
    simple("hadoop", 6, s("hrpc") ++ b(9)),
    simple("zookeeper", 6, s("zk_version")),
    simple("zookeeper", 6, s("mntr\n")),
    simple("zookeeper", 6, b(0, 0, 0, 0x2c, 0, 0, 0, 0)),
    simple("zookeeper", 6, b(0, 0, 0, 0x2d, 0, 0, 0, 0)),
    simple("elasticsearch", 6, s("ES") ++ b(0, 0)),
    simple("rtsp", 6, s("RTSP/1.0 ")),
    simple("bjnp", 17, s("BJNP")),
    simple("ssh", 6, s("SSH")), // bare needle: "SSHX" is ssh (ssh.c:251)
    // the full 24-byte preface is the needle (http2.c:493)
    simple("http2", 6, s("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"))) ++
    // every http_parser method is a BARE needle, no separator required
    // (http.c:1038-1042 registers strlen(method)); "HTTP" likewise
    (Seq("DELETE", "GET", "HEAD", "POST", "PUT", "CONNECT", "OPTIONS",
      "TRACE", "COPY", "LOCK", "MKCOL", "MOVE", "PROPFIND", "PROPPATCH",
      "SEARCH", "UNLOCK", "REPORT", "MKACTIVITY", "CHECKOUT", "MERGE",
      "M-SEARCH", "NOTIFY", "SUBSCRIBE", "UNSUBSCRIBE", "PATCH", "PURGE",
      "HTTP").map(m => simple("http", 6, s(m))))

  test("simple needles: tag at the needle length exactly, never below") {
    simples.foreach { e =>
      (0 to e.payload.length).foreach { cut =>
        assert(run(e, cut) == e.expect(cut),
          s"${e.name}/${e.payload.length} cut=$cut")
      }
    }
  }

  // --- gated callbacks: expected window typed from the C gates -------
  private val gated: Seq[E] = {
    val rdp = b(3, 0, 0, 11, 6, 0xe0) ++ fill(9) // data[3]=11 <= len gates
    val imap = s("* OK 77IMAP99")
    // LE frame length 15 == full payload length, zlib at 13; byte 14 is
    // NOT 0x9c so the no-length-echo branch can't mask the equality
    val gh0stWin = b(0, 0, 0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0x78, 0x77)
    val gh0stZlib = // second branch: no length echo, 78 9c at 13-14
      b(1, 1, 1, 1, 1, 7, 7, 0, 0, 1, 1, 0, 0, 0x78, 0x9c) ++ fill(3)
    val vnc = s("RFB 003.008\n") ++ fill(3)
    val jabber = s("<?xml77jabber99")
    val ntp = b(0x1b, 3) ++ fill(46) // stratum 3, len 48
    val snmp = b(0x30, 0x16, 0x02, 0x01, 0x03) ++ fill(19) // SEQ len 22
    val syslog = s("<13>77")
    val stunA = b(0, 1, 0, 8, 0x21, 0x12, 0xa4, 0x42) ++ fill(20) // len 28
    // BOTH stun branches sit behind the 20+data[3]==len echo
    // (misc.c:149-161): data[3]=6 -> len 26, attr echo data[23]=2
    val stunB = b(0, 1, 0, 6) ++ fill(19) ++ b(2) ++ fill(2) // len 26
    val stunRsp = s("RSP/777STUN")
    val flapExact = b(0x2a, 1, 9, 9, 0, 4) ++ fill(4) // flen 10 == len
    val flapChain = b(0x2a, 1, 9, 9, 0, 4) ++ fill(4) ++ s("*") ++ fill(3)
    val tacacs = b(0xc0, 1, 1) ++ fill(9)
    val dropbox = s("7host_int99")
    val kafka = b(0, 0, 0, 6, 0, 3, 9, 0) ++ fill(2) // flen 10 == len
    val thriftF = b(0, 0, 0, 0x19, 0x80, 1, 0) ++ fill(18) // len 25 > 20
    val rip = b(2, 1, 0, 0) ++ fill(4)
    val isakmp = fill(16) ++ b(33, 0x10) ++ fill(4)
    val aruba = b(0x49, 0x72) ++ fill(18)
    val sccp = b(12, 0, 0, 0, 0, 0, 0, 0) ++ fill(16) // len 24 > 20
    val wudoZ = b(0, 0, 0, 0) ++ fill(12)
    val wudoS = b(0x0e) ++ s("Swarm protocol") ++ fill(3)
    val mqtt = b(0x10, 0x20, 0, 4) ++ s("MQ") ++ fill(26) // len 32
    val hdfs = b(0, 0x1c, 0x50, 9, 9, 0x0a) ++ fill(4)
    val hsrp = b(0, 3, 16) ++ fill(3)
    val hsrpv2 = b(1, 40, 2) ++ fill(3)
    val safet = b(9, 9, 24) ++ fill(21) // data[2]=24 == len
    val telnet = b(0xff, 0xfb, 1) ++ fill(2)
    val netflow = b(0, 5, 0, 2, 9, 9, 9, 9, 0x5e, 0, 0, 0) ++ fill(20)
    val whois = s("example.org\r\n")
    val mongo0 = fill(8) ++ b(0, 0, 0, 0, 0xd4, 7, 0, 0) ++ fill(3)
    val mongoF = fill(8) ++
      b(0xff, 0xff, 0xff, 0xff, 0xd4, 7, 0, 0) ++ fill(3)
    val splunkR = fill(6) ++ b(0, 6, 0, 0, 0, 5) ++ s("_raw") ++ fill(3)
    val memcU = b(9, 9, 9, 9, 9, 9, 0, 0) ++ s("stats\r\n")
    val nfsTcp = b(0x80, 0, 0, 40, 9, 9, 9, 9, 0, 0, 0, 0, 0, 0, 0, 2,
      0, 1, 0x86, 0xa3) ++ fill(4)
    val nfsUdp = b(9, 9, 9, 9, 0, 0, 0, 0, 0, 0, 0, 2, 0, 1, 0x86, 0xa3) ++
      fill(4)
    val portmap = b(9, 9, 9, 9, 0, 0, 0, 0, 0, 0, 0, 2, 0, 1, 0x86, 0xa0) ++
      fill(4)
    val dhcpv6 = b(1, 9) ++ fill(4)
    val dhcp = b(1) ++ fill(235) ++ b(0x63, 0x82, 0x53, 0x63) ++ fill(60)

    Seq(
      E("rdp", "rdp", 6, rdp, _ >= 11),
      E("imap", "imap", 6, imap, _ >= 11),
      E("gh0st-win", "gh0st", 6, gh0stWin, _ == 15),
      E("gh0st-zlib", "gh0st", 6, gh0stZlib, _ >= 15),
      E("vnc", "vnc", 6, vnc, _ >= 12),
      E("jabber", "jabber", 6, jabber, _ >= 13),
      E("ntp", "ntp", 17, ntp, _ >= 48, dstPort = 123),
      E("snmp", "snmp", 17, snmp, _ >= 18), // alen clamp: 16 content bytes
      E("syslog-tcp", "syslog", 6, syslog, _ >= 4),
      E("syslog-udp", "syslog", 17, syslog, _ >= 4),
      E("stun-cookie", "stun", 17, stunA, _ == 28),
      E("stun-attr", "stun", 17, stunB, _ == 26),
      E("stun-rsp-tcp", "stun", 6, stunRsp, _ >= 11),
      E("stun-rsp-udp", "stun", 17, stunRsp, _ >= 11),
      E("flap-exact", "flap", 6, flapExact, _ == 10),
      E("flap-chain", "flap", 6, flapChain, c => c == 10 || c >= 11),
      E("tacacs-tcp", "tacacs", 6, tacacs, _ >= 3, srcPort = 49),
      E("tacacs-udp", "tacacs", 17, tacacs, _ >= 3, dstPort = 49),
      E("dropbox", "dropbox-lan-sync", 17, dropbox, _ >= 9,
        dstPort = 17500),
      E("kafka", "kafka", 6, kafka, _ == 10),
      E("thrift-framed", "thrift", 6, thriftF, _ >= 21),
      E("rip", "rip", 17, rip, _ >= 4, srcPort = 520),
      E("isakmp", "isakmp", 17, isakmp, _ >= 18, dstPort = 500),
      E("isakmp-4500", "isakmp", 17, isakmp, _ >= 18, srcPort = 4500),
      E("aruba-papi", "aruba-papi", 17, aruba, _ >= 20, dstPort = 8211),
      E("sccp", "sccp", 6, sccp, _ >= 21, dstPort = 2000),
      E("wudo-zeros", "wudo", 6, wudoZ, _ >= 15, dstPort = 7680),
      E("wudo-swarm", "wudo", 6, wudoS, _ >= 15, dstPort = 7680),
      E("mqtt", "mqtt", 6, mqtt, _ >= 30),
      E("hdfs", "hdfs", 6, hdfs, _ >= 10),
      E("hsrp", "hsrp", 17, hsrp, _ >= 3, srcPort = 1985, dstPort = 1985),
      E("hsrpv2", "hsrpv2", 17, hsrpv2, _ >= 3,
        srcPort = 2029, dstPort = 2029),
      E("safet", "safet", 17, safet, _ == 24, dstPort = 23294),
      E("telnet", "telnet", 6, telnet, _ >= 3, dstPort = 23),
      E("netflow", "netflow", 17, netflow, _ >= 32),
      E("whois", "whois", 6, whois, _ >= 2, dstPort = 43),
      E("mongo-zero", "mongo", 6, mongo0, _ >= 16),
      E("mongo-ff", "mongo", 6, mongoF, _ >= 16),
      E("splunk-repl", "splunk-replication", 6, splunkR, _ >= 16),
      E("memcached-udp", "memcached", 17, memcU, _ >= 13),
      E("nfs-tcp", "nfs", 6, nfsTcp, _ >= 20),
      E("nfs-udp", "nfs", 17, nfsUdp, _ >= 16),
      E("rpc-portmap", "portmap", 17, portmap, _ >= 16),
      E("dhcpv6", "dhcpv6", 17, dhcpv6, _ >= 2, srcPort = 547,
        isV6 = true),
      E("dhcp", "dhcp", 17, dhcp, _ >= 256, srcPort = 67),
      // dtls: 4 needles + len >= 100 + handshake type 1 at 13
      // (dtls.c:314-327)
      E("dtls", "dtls", 17,
        b(0x16, 0xfe, 0xfd) ++ fill(10) ++ b(1) ++ fill(86), _ >= 100),
      E("dtls-feff", "dtls", 17,
        b(0x16, 0xfe, 0xff) ++ fill(10) ++ b(1) ++ fill(86), _ >= 100),
      E("dtls-fefe", "dtls", 17,
        b(0x16, 0xfe, 0xfe) ++ fill(10) ++ b(1) ++ fill(86), _ >= 100),
      E("dtls-0100", "dtls", 17,
        b(0x16, 0x01, 0x00) ++ fill(10) ++ b(1) ++ fill(86), _ >= 100),
      // radius: needle 01-05 at 0, EXACT u16 length echo at 2-3, a
      // 1812-1813/1645-1646 port on either side (radius.c:91-104,134-138)
      E("radius-1812", "radius", 17,
        b(1, 0x2a, 0, 20) ++ fill(16), _ == 20, srcPort = 1812),
      E("radius-1646", "radius", 17,
        b(5, 0x2a, 0, 20) ++ fill(16), _ == 20, dstPort = 1646),
      E("radius-1813", "radius", 17,
        b(3, 0x2a, 0, 20) ++ fill(16), _ == 20, dstPort = 1813),
      // llmnr/mdns: the dns header gate (17-byte floor, opcode <= 5,
      // 1..10 questions — dns.c:211-245) behind ports 5355/5353, port
      // 53 absent on both sides (dns.c:509,687-688)
      E("llmnr", "llmnr", 17,
        b(0x12, 0x34, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0) ++ fill(5), _ >= 17,
        dstPort = 5355),
      E("mdns", "mdns", 17,
        b(0x12, 0x34, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0) ++ fill(5), _ >= 17,
        srcPort = 5353, dstPort = 5353),
      // cldap: \x30 needle, then SEQ { INTEGER messageID, constructed
      // protocolOp tag <= 25 } with asn lengths CLAMPED to the buffer
      // (ldap.c:145-180, parsers.c:413-414) — three TLV headers = 7 bytes
      E("cldap", "ldap", 17,
        b(0x30, 0x0b, 0x02, 0x01, 0x07, 0x61, 0x06) ++ fill(6), _ >= 7),
      // irc needles + the ':'/'U' callback guards (irc.c:95-138)
      E("irc-nick", "irc", 6, s("NICK joe99"), _ >= 8),
      E("irc-server-notice", "irc", 6, s(":irc.x NOTICE AUTH hi"),
        _ >= 14),
      E("irc-notice-auth", "irc", 6, s("NOTICE AUTH :checking"), _ >= 11),
      E("irc-cap-req", "irc", 6, s("CAP REQ :sasl"), _ >= 8),
      E("irc-user-nick", "irc", 6, s("USER a 0 * :x\nNICK b99"), _ >= 19),
      E("irc-user-iw", "irc", 6, s("USER guest +iw guest :r"), _ >= 15),
      // smtp: exact-case HELO /EHLO with the space, or a 220 banner
      // carrying "SMTP" (smtp.c:884-897)
      E("smtp-helo", "smtp", 6, s("HELO x.com\r\n"), _ >= 5),
      E("smtp-ehlo", "smtp", 6, s("EHLO x.com\r\n"), _ >= 5),
      E("smtp-banner", "smtp", 6, s("220 77SMTP ready"), _ >= 10))
  }

  test("gated classifiers: the reference's length gates, per truncation") {
    gated.foreach { e =>
      (0 to e.payload.length).foreach { cut =>
        assert(run(e, cut) == e.expect(cut),
          s"${e.name} cut=$cut want=${e.expect(cut)}")
      }
    }
  }

  test("ftp/lmtp from the 220 banner: visibility windows per truncation") {
    // LMTP visible from 10 -> ftp only inside [4, 10)
    val lmtp = s("220 77LMTP")
    (0 to lmtp.length).foreach { cut =>
      val tags = AppProtocols.classify(6, 40000, 8000,
        lmtp.take(cut), empty, lmtp.take(cut), empty)
      assert(tags.contains("lmtp") == (cut >= 10), s"lmtp cut=$cut")
      assert(tags.contains("ftp") == (cut >= 4 && cut < 10), s"ftp cut=$cut")
    }
    // SMTP visible from 10 -> ftp stops, nothing replaces it
    val smtp = s("220 77SMTP")
    (0 to smtp.length).foreach { cut =>
      val tags = AppProtocols.classify(6, 40000, 8000,
        smtp.take(cut), empty, smtp.take(cut), empty)
      assert(tags.contains("ftp") == (cut >= 4 && cut < 10), s"smtp cut=$cut")
      assert(!tags.contains("lmtp") && !tags.contains("smtp-banner"))
    }
    // " TLS" visible from 9
    val tls = s("220 9 TLS")
    (0 to tls.length).foreach { cut =>
      val tags = AppProtocols.classify(6, 40000, 8000,
        tls.take(cut), empty, tls.take(cut), empty)
      assert(tags.contains("ftp") == (cut >= 4 && cut < 9), s"tls cut=$cut")
    }
    // BOTH directions' 220 banners are classified (other220 runs per
    // matching packet): src says SMTP, dst says LMTP -> lmtp tags
    val tags2 = AppProtocols.classify(6, 40000, 8000,
      s("220 77SMTP"), s("220 77LMTP"), empty, empty)
    assert(tags2.contains("lmtp") && !tags2.contains("ftp"))
  }

  test("near-miss flips and wrong ports never tag") {
    def tagsOf(proto: Int, sp: Int, dp: Int, p: Array[Byte],
        v6: Boolean = false): Seq[String] =
      AppProtocols.classify(proto, sp, dp, p, empty, p, empty, v6)
    // kafka: nonzero length-high bytes fail the \x00\x00 needle
    assert(!tagsOf(6, 1, 2, b(1, 0, 0, 6, 0, 3, 9, 0) ++ fill(2))
      .contains("kafka"))
    assert(!tagsOf(6, 1, 2, b(0, 1, 0, 6, 0, 3, 9, 0) ++ fill(2))
      .contains("kafka"))
    // mongo at 15 bytes (needle needs 16)
    assert(!tagsOf(6, 1, 2, fill(8) ++ b(0, 0, 0, 0, 0xd4, 7, 0))
      .contains("mongo"))
    // nfs needles: program-number high bytes must be 00 01
    assert(!tagsOf(6, 1, 2, b(0x80, 0, 0, 40, 9, 9, 9, 9,
      0, 0, 0, 0, 0, 0, 0, 2, 5, 1, 0x86, 0xa3)).contains("nfs"))
    assert(!tagsOf(17, 1, 2, b(9, 9, 9, 9, 0, 0, 0, 0, 0, 0, 0, 2,
      0, 9, 0x86, 0xa3) ++ fill(4)).contains("nfs"))
    // rpc: unknown program suffix
    assert(tagsOf(17, 1, 2, b(9, 9, 9, 9, 0, 0, 0, 0, 0, 0, 0, 2,
      0, 1, 0x86, 0xee) ++ fill(4)) == Seq("udp"))
    // snmp: application-class tag 16 (0x70) fails the \x30 needle
    assert(!tagsOf(17, 1, 2, b(0x70, 0x16, 2, 1, 3) ++ fill(19))
      .contains("snmp"))
    // snmp: version 4 rejected, constructed INTEGER accepted (the
    // callback never checks the constructed bit, misc.c:125)
    assert(!tagsOf(17, 1, 2, b(0x30, 0x16, 2, 1, 4) ++ fill(19))
      .contains("snmp"))
    assert(tagsOf(17, 1, 2, b(0x30, 0x16, 0x22, 1, 3) ++ fill(19))
      .contains("snmp"))
    // syslog: "<0" is not a registered needle; non-digit before '>'
    assert(!tagsOf(17, 1, 2, s("<03>7")).contains("syslog"))
    assert(!tagsOf(17, 1, 2, s("<1a>7")).contains("syslog"))
    // ntp: stratum 17, or the right shape on the wrong port
    assert(!tagsOf(17, 123, 2, b(0x1b, 17) ++ fill(46)).contains("ntp"))
    assert(!tagsOf(17, 1, 2, b(0x1b, 3) ++ fill(46)).contains("ntp"))
    // port-only classifiers on the wrong port
    assert(!tagsOf(6, 1, 2, s("example.org\r\n")).contains("whois"))
    // registered TCP_DST only (misc.c:552): src-side 43 is not whois
    assert(!tagsOf(6, 43, 2, s("example.org\r\n")).contains("whois"))
    assert(!tagsOf(17, 1, 2, b(1, 9) ++ fill(4), v6 = true)
      .contains("dhcpv6"))
    // dhcpv6 registers 547 only — a bare 546<->ephemeral flow is not it
    assert(!tagsOf(17, 546, 40000, b(1, 9) ++ fill(4), v6 = true)
      .contains("dhcpv6"))
    assert(!tagsOf(17, 547, 40000, b(1, 9) ++ fill(4)).contains("dhcpv6"))
    // dhcp: port 68 without 67, v6, bad op, missing cookie
    val bootp = b(1) ++ fill(235) ++ b(0x63, 0x82, 0x53, 0x63) ++ fill(60)
    assert(tagsOf(17, 68, 67, bootp).contains("dhcp"))
    assert(!tagsOf(17, 68, 40000, bootp).contains("dhcp"))
    assert(!tagsOf(17, 67, 68, bootp, v6 = true).contains("dhcp"))
    assert(!tagsOf(17, 67, 68, b(3) ++ bootp.drop(1)).contains("dhcp"))
    val noCookie = bootp.clone(); noCookie(238) = 0x7f
    assert(!tagsOf(17, 67, 68, noCookie).contains("dhcp"))
    // memcached udp: reserved bytes must sit at 6-7, command at 8
    assert(!tagsOf(17, 1, 2, b(9, 9, 9, 9, 0, 0) ++ s("stats\r\n"))
      .contains("memcached"))
    // stun: length echo off by one
    assert(!tagsOf(17, 1, 2,
      b(0, 1, 0, 9, 0x21, 0x12, 0xa4, 0x42) ++ fill(20)).contains("stun"))
    // radius: code 6 is past the five registered needles (radius.c:134-138)
    assert(!tagsOf(17, 1812, 40000, b(6, 0x2a, 0, 20) ++ fill(16))
      .contains("radius"))
    // radius: length echo off by one, and a non-radius port pair
    assert(!tagsOf(17, 1812, 40000, b(1, 0x2a, 0, 21) ++ fill(16))
      .contains("radius"))
    assert(!tagsOf(17, 1814, 40000, b(1, 0x2a, 0, 20) ++ fill(16))
      .contains("radius"))
    // dtls: fe fc is not a registered needle; handshake type 2 at 13
    assert(!tagsOf(17, 1, 2,
      b(0x16, 0xfe, 0xfc) ++ fill(10) ++ b(1) ++ fill(86)).contains("dtls"))
    assert(!tagsOf(17, 1, 2,
      b(0x16, 0xfe, 0xfd) ++ fill(10) ++ b(2) ++ fill(86)).contains("dtls"))
    // llmnr: suppressed when port 53 sits on either side (dns.c:509)
    val dnsHdr = b(0x12, 0x34, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0) ++ fill(5)
    assert(!tagsOf(17, 53, 5355, dnsHdr).contains("llmnr"))
    assert(tagsOf(17, 53, 5355, dnsHdr).contains("dns"))
    // cldap near-misses: application-class outer tag fails the \x30
    // needle; constructed messageID; primitive protocolOp; op tag 26
    assert(!tagsOf(17, 1, 2, b(0x70, 0x0b, 0x02, 0x01, 0x07, 0x61, 0x06)
      ++ fill(6)).contains("ldap"))
    assert(!tagsOf(17, 1, 2, b(0x30, 0x0b, 0x22, 0x01, 0x07, 0x61, 0x06)
      ++ fill(6)).contains("ldap"))
    assert(!tagsOf(17, 1, 2, b(0x30, 0x0b, 0x02, 0x01, 0x07, 0x41, 0x06)
      ++ fill(6)).contains("ldap"))
    assert(!tagsOf(17, 1, 2, b(0x30, 0x0b, 0x02, 0x01, 0x07, 0x7a, 0x06)
      ++ fill(6)).contains("ldap"))
    // telnet: second byte below 0xfa
    assert(!tagsOf(6, 1, 23, b(0xff, 0xf0, 1) ++ fill(2))
      .contains("telnet"))
    // netflow: v6 header version, count 0, stale systime, port 53
    assert(!tagsOf(17, 1, 2, b(0, 6, 0, 2, 9, 9, 9, 9, 0x5e, 0, 0, 0) ++
      fill(20)).contains("netflow"))
    assert(!tagsOf(17, 1, 2, b(0, 5, 0, 0, 9, 9, 9, 9, 0x5e, 0, 0, 0) ++
      fill(20)).contains("netflow"))
    assert(!tagsOf(17, 1, 2, b(0, 5, 0, 2, 9, 9, 9, 9, 0, 0, 0, 9) ++
      fill(20)).contains("netflow"))
    assert(!tagsOf(17, 53, 2, b(0, 5, 0, 2, 9, 9, 9, 9, 0x5e, 0, 0, 0) ++
      fill(20)).contains("netflow"))
    // dropbox-lan-sync: memstr starts at offset 1 — a needle AT 0 only
    assert(!tagsOf(17, 1, 17500, s("host_int")).contains("dropbox-lan-sync"))
    // http needles are TCP-only registrations (http.c:1038-1042): a UDP
    // payload with a method prefix (SSDP NOTIFY, SIP-over-UDP) is not http
    assert(!tagsOf(17, 1, 2, s("GET /index HTTP/1.1")).contains("http"))
    assert(!tagsOf(17, 1, 2, s("NOTIFY sip:a@b SIP/2.0")).contains("http"))
    // bare-prefix semantics on tcp: no separator needed after the method
    assert(tagsOf(6, 1, 2, s("GETX")).contains("http"))
    assert(tagsOf(6, 1, 2, s("HTTPX")).contains("http"))
    // tls: hello types 1/2 only, version minor <= 3, len >= 6
    // (tls.c:749-763)
    assert(tagsOf(6, 1, 2, b(0x16, 3, 1, 0, 5, 1) ++ fill(5))
      .contains("tls"))
    assert(tagsOf(6, 1, 2, b(0x16, 3, 3, 0, 5, 2) ++ fill(5))
      .contains("tls"))
    assert(!tagsOf(6, 1, 2, b(0x16, 3, 1, 0, 5, 11) ++ fill(5))
      .contains("tls")) // certificate-first stream
    assert(!tagsOf(6, 1, 2, b(0x16, 3, 4, 0, 5, 1) ++ fill(5))
      .contains("tls")) // version minor 4
    assert(!tagsOf(6, 1, 2, b(0x16, 3, 1, 0, 5)).contains("tls")) // len 5
    // irc guards: plain USER login (ftp) and a ':' line without NOTICE
    assert(!tagsOf(6, 1, 2, s("USER guest 0 * :real name")).contains("irc"))
    assert(!tagsOf(6, 1, 2, s(":server 001 welcome")).contains("irc"))
    assert(!tagsOf(6, 1, 2, s("CAP LS 302\r\n")).contains("irc"))
    // smtp: lowercase helo and a missing trailing space never classify
    assert(!tagsOf(6, 1, 2, s("helo x.com\r\n")).contains("smtp"))
    assert(!tagsOf(6, 1, 2, s("HELOX.com\r\n")).contains("smtp"))
    assert(!tagsOf(6, 1, 2, s("220 mail ready")).contains("smtp"))
    // dns: udp tags only on the parser's header gate — 17-byte floor,
    // opcode <= 5, 1..10 questions (dns.c:211-245); tcp tags on DST
    // port 53 alone (dns.c:498-504), never src-side 53
    val q = b(0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0) ++ fill(5)
    assert(tagsOf(17, 40000, 53, q).contains("dns"))
    assert(!tagsOf(17, 40000, 53, q.take(16)).contains("dns")) // 16 bytes
    assert(!tagsOf(17, 40000, 53, fill(17)).contains("dns")) // opcode 7
    val q0 = q.clone(); q0(4) = 0; q0(5) = 0 // zero questions
    assert(!tagsOf(17, 40000, 53, q0).contains("dns"))
    assert(tagsOf(6, 40000, 53, fill(3)).contains("dns")) // tcp dst 53
    assert(!tagsOf(6, 53, 40000, fill(3)).contains("dns")) // tcp src 53
    assert(tagsOf(17, 5353, 40000, q).contains("mdns"))
    assert(!tagsOf(17, 5353, 40000, q0).contains("mdns"))
    // mysql: the tag needs BOTH the server greeting (needle 00 00 00 0a
    // at 1, printable version) AND a plausible client login packet
    // (mysql.c:30-117) — a greeting alone is not mysql
    val greet = b(10, 0, 0, 0, 0x0a) ++ s("5.7.30") ++ b(0) ++ fill(3)
    val login = b(60, 0, 0, 1) ++ fill(32) ++ s("root") ++ b(0) ++ fill(23)
    def my(src: Array[Byte], dst: Array[Byte]): Boolean =
      AppProtocols.classify(6, 40000, 3306, src, dst, src, dst)
        .contains("mysql")
    assert(my(login, greet))
    assert(!my(empty, greet)) // greeting alone
    assert(!my(login, b(10, 1, 0, 0, 0x0a) ++ s("8.0") ++ b(0))) // len>255
    assert(!my(b(60, 0, 0, 3) ++ login.drop(4), greet)) // seq 3
    assert(!my(b(60, 0, 0, 1) ++ fill(32) ++ b(7, 0) ++ fill(26), greet))
    // rdp: version byte, length > payload, cookie offset byte
    assert(!tagsOf(6, 1, 2, b(3, 1, 0, 11, 6, 0xe0) ++ fill(9))
      .contains("rdp"))
    assert(!tagsOf(6, 1, 2, b(3, 0, 0, 11, 7, 0xe0) ++ fill(9))
      .contains("rdp"))
  }

  test("random payloads never throw on any transport or port") {
    var seed = 0x5eedL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    val ports = Seq(49, 53, 67, 123, 500, 520, 547, 1985, 2000, 8211,
      17500, 23294, 40000)
    (0 until 400).foreach { _ =>
      val p = Array.fill(nextInt(300))(nextInt(256).toByte)
      val proto = Seq(1, 6, 17, 132)(nextInt(4))
      AppProtocols.classify(proto, ports(nextInt(ports.size)),
        ports(nextInt(ports.size)), p, p, p, p, nextInt(2) == 1)
    }
  }
}
