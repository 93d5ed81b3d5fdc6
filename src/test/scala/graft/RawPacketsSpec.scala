package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Decode, SessionBuilder}
import graft.ops.RawPackets

/** The /api/session/raw endpoints and the direction-run division they
  * are built on (viewer/pcap.js reassemble_tcp/udp/icmp,
  * apiSessions.js:2804-2885 getPacketPNG/getRawPackets).
  */
class RawPacketsSpec extends AnyFunSuite with SparkSpecBase {

  private def pkt(src: String, sport: Int, dst: String, dport: Int,
      proto: Int, seq: Long, ack: Long, flags: Int, data: String,
      idx: Int): Decode.DecodedPacket =
    Decode.DecodedPacket("f", idx, idx * 1000L, 0L, 0, 0, "", "",
      proto, src, dst, sport, dport, flags, 0, seq, ack,
      data.getBytes("ISO-8859-1"))

  private def a(seq: Long, ack: Long, data: String, idx: Int,
      flags: Int = Decode.TH_ACK) =
    pkt("10.0.0.1", 1111, "10.0.0.2", 80, 6, seq, ack, flags, data, idx)
  private def b(seq: Long, ack: Long, data: String, idx: Int) =
    pkt("10.0.0.2", 80, "10.0.0.1", 1111, 6, seq, ack, Decode.TH_ACK,
      data, idx)

  private val srcKey = "10.0.0.1:1111"

  test("udp and icmp runs merge consecutive same-direction packets") {
    def u(src: String, sport: Int, data: String, idx: Int) =
      pkt(src, sport, "9.9.9.9", 53, 17, 0, 0, 0, data, idx)
    val ch = RawPackets.chunks(IndexedSeq(
      u("1.1.1.1", 10, "ab", 0), u("1.1.1.1", 10, "cd", 1),
      u("2.2.2.2", 20, "XY", 2), u("1.1.1.1", 10, "ef", 3)),
      "1.1.1.1:10")
    assert(ch.map(c => (c.key, new String(c.data))) == IndexedSeq(
      ("1.1.1.1:10", "abcd"), ("2.2.2.2:20", "XY"), ("1.1.1.1:10", "ef")))
    // icmp keys on the bare address (pcap.js:766)
    def i(src: String, data: String, idx: Int) =
      pkt(src, 0, "9.9.9.9", 0, 1, 0, 0, 0, data, idx)
    val ic = RawPackets.chunks(IndexedSeq(
      i("1.1.1.1", "ping", 0), i("2.2.2.2", "pong", 1)), "1.1.1.1:0")
    assert(ic.map(_.key) == IndexedSeq("1.1.1.1", "2.2.2.2"))
    // unhandled protocols answer no chunks, like the reference
    assert(RawPackets.chunks(IndexedSeq(
      pkt("1.1.1.1", 0, "2.2.2.2", 0, 47, 0, 0, 0, "x", 0)), "k").isEmpty)
  }

  test("tcp: syn/rst/empty dropped, runs seq-merged, retransmits deduped") {
    val ch = RawPackets.chunks(IndexedSeq(
      a(999, 0, "", 0, flags = Decode.TH_SYN), // syn dropped
      a(1000, 5000, "GET ", 1),
      a(1004, 5000, "/ HT", 2),
      a(1004, 5000, "/ HT", 3), // exact retransmit — deduped
      b(5000, 1008, "200 ", 4),
      a(1008, 5004, "TP", 5),
      a(1010, 5004, "", 6), // empty dropped
      b(5004, 1010, "OK", 7)),
      srcKey)
    assert(ch.map(c => (c.key, new String(c.data))) == IndexedSeq(
      (srcKey, "GET / HT"), ("10.0.0.2:80", "200 "),
      (srcKey, "TP"), ("10.0.0.2:80", "OK")))
    // even indices = src, odd = dst (getRawPackets' i += 2 walk)
    assert(new String(RawPackets.sideData(ch, "src").reduce(_ ++ _)) ==
      "GET / HTTP")
    assert(new String(RawPackets.sideData(ch, "dst").reduce(_ ++ _)) ==
      "200 OK")
  }

  test("tcp: out-of-order within a run lands at its seq offset") {
    val ch = RawPackets.chunks(IndexedSeq(
      a(1000, 0, "abcd", 0),
      a(1008, 0, "ijkl", 1), // arrives early
      a(1004, 0, "efgh", 2)),
      srcKey)
    assert(ch.length == 1 && new String(ch.head.data) == "abcdefghijkl")
  }

  test("tcp: dst-first conversations get an empty leading src chunk") {
    val ch = RawPackets.chunks(IndexedSeq(
      b(5000, 1000, "hello", 0),
      a(1000, 5005, "hi", 1)),
      srcKey)
    assert(ch.length == 3)
    assert(ch(0).key == srcKey && ch(0).data.isEmpty)
    assert(new String(ch(1).data) == "hello" && new String(ch(2).data) == "hi")
  }

  test("tcp: a >64k same-direction gap starts a separated new run") {
    val ch = RawPackets.chunks(IndexedSeq(
      a(1000, 0, "one", 0),
      a(1000 + 0x20000, 0, "two", 1)),
      srcKey)
    assert(ch.length == 3)
    assert(new String(ch(0).data) == "one")
    assert(ch(1).key == "" && ch(1).data.isEmpty) // the gap separator
    assert(new String(ch(2).data) == "two")
  }

  test("png: 256-wide grayscale, runs padded with 0xff separator lines") {
    // one 300-byte src run: occupies 300 + 2*256 - 44 = 768 bytes
    // (3 lines), final line dropped → 2 rows
    val d = Array.tabulate(300)(i => (i % 251).toByte)
    val bytes = RawPackets.renderPng(Seq(d))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 256 && img.getHeight == 2)
    val raster = img.getRaster
    assert(raster.getSample(0, 0, 0) == 0) // data byte 0
    assert(raster.getSample(100, 0, 0) == 100 % 251)
    assert(raster.getSample(100, 1, 0) == 0xff) // padding line
    // nothing to draw → the 1×1 placeholder
    val empty = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(RawPackets.emptyPng))
    assert(empty.getWidth == 1 && empty.getHeight == 1)
    assert(RawPackets.renderPng(Nil).sameElements(RawPackets.emptyPng))
  }

  test("end-to-end: raw src/dst equals the reassembled direction streams") {
    val srcPcap = "/root/reference/tests/pcap/socks-http-example.pcap"
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(srcPcap))
    val byKey = graft.etl.Pcap.parseFile(bytes, srcPcap)
      .flatMap(Decode.decode(_)).toSeq.groupBy(SessionBuilder.sessionKey)
    val rows = sessions.collect()
    val testable = rows.filter(s => s.ipProtocol == 6 &&
      !s.sessionId.contains("|r") && s.segmentCnt == 1 &&
      rows.count(_.sessionId == s.sessionId) == 1 &&
      byKey.contains(s.sessionId) && s.srcDataBytes > 0 && s.dstDataBytes > 0)
    assert(testable.nonEmpty)
    testable.take(3).foreach { s =>
      val pkts = byKey(s.sessionId)
      def side(d: Int) = pkts.filter(p =>
        (if (p.srcIp == s.srcIp && p.srcPort == s.srcPort) 0 else 1) == d)
      assert(RawPackets.raw(sessions, s.sessionId, "src")
        .sameElements(SessionBuilder.reassemble(side(0))), s.sessionId)
      assert(RawPackets.raw(sessions, s.sessionId, "dst")
        .sameElements(SessionBuilder.reassemble(side(1))), s.sessionId)
    }
    // a png for a real session round-trips with sane dimensions
    val s = testable.head
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      RawPackets.png(sessions, s.sessionId, "src")))
    assert(img.getWidth == 256 && img.getHeight >= 1)
    assert(RawPackets.raw(sessions, "nope").isEmpty)
  }
}
