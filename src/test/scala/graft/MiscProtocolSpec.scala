package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** Golden fidelity for the misc classifier batch and the shared fields:
  * icmp type/code, bgp type, user (ftp/socks/rdp/smtp-auth/tds/oracle),
  * oracle connect info, fbzero CHLO.
  */
class MiscProtocolSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()
  private def bodies(name: String) =
    mapper.readTree(new java.io.File(s"/root/reference/tests/pcap/$name.test"))
      .get("sessions3").elements().asScala.map(_.get("body")).toSeq
  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    if (n == null) Nil else n.elements().asScala.map(_.asText()).toSeq.sorted
  private def ints(n: com.fasterxml.jackson.databind.JsonNode): Seq[Int] =
    if (n == null) Nil else n.elements().asScala.map(_.asInt()).toSeq.sorted
  private def run(name: String) =
    SessionBuilder.sessionizeRef(spark, s"/root/reference/tests/pcap/$name.pcap")
      .collect().toSeq

  test("icmp type/code match goldens") {
    for (name <- Seq("bigendian", "gre-sample", "v6")) {
      val want = bodies(name).filter(_.has("icmp"))
        .map(b => (ints(b.get("icmp").get("type")), ints(b.get("icmp").get("code"))))
        .sortBy(_.toString)
      val got = run(name).filter(_.icmpType.nonEmpty)
        .map(r => (r.icmpType, r.icmpCode)).sortBy(_.toString)
      assert(got == want, name)
    }
  }

  test("bgp classify floor: 16-byte marker alone is not bgp (bgp.c:41)") {
    import graft.etl.Decode
    def pkt(i: Int, src: Boolean, flags: Int, seq: Long,
        payload: Array[Byte]): Decode.DecodedPacket =
      Decode.DecodedPacket("s", i, 1700000000000000L + i * 1000L,
        i.toLong * 100, 70 + payload.length, 54,
        "aa:aa:aa:aa:aa:01", "ff:ff:ff:ff:ff:ff", 6,
        if (src) "1.1.1.1" else "2.2.2.2", if (src) "2.2.2.2" else "1.1.1.1",
        if (src) 1234 else 179, if (src) 179 else 1234,
        flags, 1000, seq, 0L, payload,
        prevTsMicros = 1700000000000000L + math.max(0, i - 1) * 1000L,
        l4Offset = 54)
    val S = Decode.TH_SYN; val A = Decode.TH_ACK
    def tags(markerLen: Int): Seq[String] = {
      val marker = Array.fill[Byte](markerLen)(-1)
      val ps = Seq(
        pkt(0, src = true, S, 1000L, Array.emptyByteArray),
        pkt(1, src = false, S | A, 5000L, Array.emptyByteArray),
        pkt(2, src = true, A, 1001L, marker))
      val key = SessionBuilder.sessionKey(ps.head)
      SessionBuilder.buildSessionsCarry(key, ps.iterator, "test", carry = None)._1
        .flatMap(_.protocol)
    }
    // bgp_tcp_classify: len < 19 refuses — the bare 16-byte marker and
    // a 17/18-byte prefix never tag; the full 19-byte header does
    assert(!tags(16).contains("bgp"))
    assert(!tags(18).contains("bgp"))
    assert(tags(19).contains("bgp"))
    // marker with a cleared byte never tags at any length
    val broken = Array.fill[Byte](19)(-1); broken(7) = 0
    val ps = Seq(
      pkt(0, src = true, S, 1000L, Array.emptyByteArray),
      pkt(1, src = false, S | A, 5000L, Array.emptyByteArray),
      pkt(2, src = true, A, 1001L, broken))
    val key = SessionBuilder.sessionKey(ps.head)
    assert(!SessionBuilder.buildSessionsCarry(key, ps.iterator, "test", carry = None)._1
      .flatMap(_.protocol).contains("bgp"))
  }

  test("bgp types match golden") {
    val want = bodies("cloudshark-bgp-md5")
      .map(b => strs(b.get("bgp").get("type"))).sortBy(_.toString)
    val got = run("cloudshark-bgp-md5").sortBy(_.segmentSeq).map(_.bgpType)
    assert(got.sortBy(_.toString) == want)
  }

  test("user field: ftp, socks5+rdp, tds, smtp auth") {
    assert(run("ftp").flatMap(_.user) == Seq("anonymous"))
    val rdp = run("socks5-rdp")
    assert(rdp.flatMap(_.user).distinct == Seq("xxx"))
    assert(rdp.exists(_.protocol.contains("rdp")))
    val tds = run("tds5")
    assert(tds.flatMap(_.user) == Seq("user___user"))
    assert(tds.exists(_.protocol.contains("tds")))
    assert(run("smtp-data-250").flatMap(_.user) == Seq("12345678@aol.com"))
  }

  test("oracle connect info matches golden") {
    val got = run("oracle").filter(_.protocol.contains("oracle"))
    assert(got.nonEmpty)
    val w = bodies("oracle").find(_.has("oracle")).get.get("oracle")
    assert(got.head.oracleUser == w.get("user").asText())
    assert(got.head.oracleHost == w.get("host").asText())
    assert(got.head.oracleService == w.get("service").asText())
  }

  test("fbzero CHLO fields") {
    val got = run("fbzero-android")
    assert(got.exists(_.protocol.contains("fbzero")), got.map(_.protocol).toString)
    val w = bodies("fbzero-android").find(_.has("quic"))
    w.foreach { b =>
      val g = got.find(_.protocol.contains("fbzero")).get
      assert(g.quicHost.sorted == strs(b.get("quic").get("host")))
    }
  }

  test("radius attributes match golden") {
    val got = run("radius").filter(_.protocol.contains("radius"))
    assert(got.nonEmpty)
    val w = bodies("radius").find(_.has("radius")).get.get("radius")
    assert(got.head.radiusUser == strs(w.get("user")))
    assert(got.head.radiusFramedIp == strs(w.get("framedIp")))
    assert(got.head.radiusMac == strs(w.get("mac")))
  }

  test("dtls certificates match golden") {
    for (name <- Seq("wireshark-dtls0", "cloudshark-dtls1")) {
      val got = run(name).filter(_.cert.nonEmpty)
      val want = bodies(name).filter(_.has("cert"))
      assert(got.size == want.size, name)
      got.sortBy(_.cert.head.serial).zip(want.sortBy(
        _.get("cert").elements().asScala.next().get("serial").asText()))
        .foreach { case (g, wb) =>
          val wc = wb.get("cert").elements().asScala.next()
          val gc = g.cert.head
          assert(gc.serial == wc.get("serial").asText(), name)
          assert(gc.issuerON == strs(wc.get("issuerON")), name)
          assert(gc.notAfter == wc.get("notAfter").asLong(), name)
          assert(gc.validDays == wc.get("validDays").asLong(), name)
        }
    }
  }

  test("http rich fields match goldens") {
    // 301 redirect: path/headers/location
    val g301 = run("http-301-get").head
    val w301 = bodies("http-301-get").head.get("http")
    assert(g301.httpPath == strs(w301.get("path")))
    assert(g301.httpRequestHeader == strs(w301.get("requestHeader")))
    assert(g301.httpResponseHeader == strs(w301.get("responseHeader")))
    assert(g301.httpLocation == strs(w301.get("response-location")))
    assert(g301.httpUri.sorted == strs(w301.get("uri")))
    // gzip body: md5 over the transferred (still-compressed) bytes
    val gz = run("http-content-gzip").head
    val wgz = bodies("http-content-gzip").head.get("http")
    assert(gz.httpMd5.sorted == strs(wgz.get("md5")))
    assert(gz.httpCookieKey.sorted == strs(wgz.get("cookieKey")))
    assert(gz.httpCookieValue.sorted == strs(wgz.get("cookieValue")))
  }

  test("dns answers match goldens") {
    val mx = run("dns-mx").head
    val wmx = bodies("dns-mx").head.get("dns")
    assert(mx.dnsQname.sorted == strs(wmx.get("host")))
    assert(mx.dnsOpcode == strs(wmx.get("opcode")))
    assert(mx.dnsQclass == strs(wmx.get("qc")))
    assert(mx.dnsQtype == strs(wmx.get("qt")))
    assert(mx.dnsRcode == strs(wmx.get("status")))
    assert(mx.dnsMailserverHost.sorted == strs(wmx.get("mailserverHost")))
    assert(mx.dnsNameserverHost.sorted == strs(wmx.get("nameserverHost")))
    assert(mx.dnsNameserverIp.sorted == strs(wmx.get("nameserverIp")))
    val err = run("dns-error").head
    val werr = bodies("dns-error").head.get("dns")
    assert(err.dnsOpcode == strs(werr.get("opcode")))
    assert(err.dnsRcode == strs(werr.get("status")))
  }

  test("misc protocol tags present") {
    def protosOf(name: String): Set[String] = run(name).flatMap(_.protocol).toSet
    assert(protosOf("stun").contains("stun"))
    assert(protosOf("mpls-basic").contains("telnet"))
    assert(protosOf("gre-sample").contains("ntp"))
    assert(protosOf("imap-tag").contains("imap"))
    assert(protosOf("pop3-tag").contains("pop3"))
    assert(protosOf("kafka").contains("kafka"))
    assert(protosOf("mongo").contains("mongo"))
    assert(protosOf("aerospike").contains("aerospike"))
    assert(protosOf("thrift").contains("thrift"))
    assert(protosOf("cassandra1").contains("cassandra"))
    assert(protosOf("bt-tcp").contains("bittorrent"))
    assert(protosOf("bt-udp").contains("bittorrent"))
    assert(protosOf("wireshark-dtls0").contains("dtls"))
    assert(protosOf("http2-nghttp2").contains("http2"))
    assert(protosOf("gtp-iphone").contains("sip"))
  }

  test("corpus protocol-tag fidelity floor") {
    val dir = new java.io.File("/root/reference/tests/pcap")
    var matched = 0
    var total = 0
    val mismatches = Seq.newBuilder[String]
    dir.listFiles().filter(_.getName.endsWith(".pcap")).map(_.getPath).sorted
      .foreach { p =>
        val name = new java.io.File(p).getName.stripSuffix(".pcap")
        val goldenFile = new java.io.File(s"$dir/$name.test")
        if (goldenFile.exists()) {
          total += 1
          try {
            val want = mapper.readTree(goldenFile).get("sessions3")
              .elements().asScala.map(_.get("body")).toSeq
              .map(b => strs(b.get("protocol")).mkString("+")).sorted
            val got = SessionBuilder.sessionizeRef(spark, p).collect()
              .map(_.protocol.sorted.mkString("+")).toSeq.sorted
            if (got == want) matched += 1 else mismatches += name
          } catch { case _: Exception => mismatches += name }
        }
      }
    info(s"protocol-tag matches: $matched / $total; mismatched: " +
      mismatches.result().mkString(", "))
    assert(matched >= 145, s"protocol fidelity regressed: $matched")
  }
}
