package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Decode, Hex, Pcap, SessionBuilder}
import graft.ops.CyberChef

/** E40 CyberChef handoff (viewer.js:2039, apiMisc.js:262-284): one
  * direction's reassembled session payload as hex, `{data: …}`.
  */
class CyberChefSpec extends AnyFunSuite with SparkSpecBase {

  private val srcPcap = "/root/reference/tests/pcap/socks-http-example.pcap"

  test("src/dst hex equal the raw reassembled direction streams") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    // independent oracle: decode the capture directly and reassemble
    // each direction (RAW streams — CyberChef hands off the bytes as
    // captured; the stored payload8 may be SOCKS-peeled)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(srcPcap))
    val byKey = Pcap.parseFile(bytes, srcPcap).flatMap(Decode.decode(_))
      .toSeq.groupBy(SessionBuilder.sessionKey)
    val rows = sessions.collect()
    // plain ids only (no |rN reuse suffix), single-segment sessions
    val testable = rows.filter(s => s.ipProtocol == 6 &&
      !s.sessionId.contains("|r") && s.segmentCnt == 1 &&
      rows.count(_.sessionId == s.sessionId) == 1 &&
      byKey.contains(s.sessionId) && s.srcDataBytes > 0 && s.dstDataBytes > 0)
    assert(testable.nonEmpty)
    testable.take(4).foreach { s =>
      val pkts = byKey(s.sessionId)
      def side(d: Int) = pkts.filter(p =>
        (if (p.srcIp == s.srcIp && p.srcPort == s.srcPort) 0 else 1) == d)
      val expSrc = Hex.hex(SessionBuilder.reassemble(side(0)))
      val expDst = Hex.hex(SessionBuilder.reassemble(side(1)))
      assert(CyberChef.sessionData(sessions, s.sessionId, "src") == expSrc,
        s.sessionId)
      assert(CyberChef.sessionData(sessions, s.sessionId, "dst") == expDst,
        s.sessionId)
      // any unrecognized type falls back to src (apiMisc.js:278)
      assert(CyberChef.sessionData(sessions, s.sessionId, "weird") == expSrc)
    }
  }

  test("unknown session id yields empty data; json shape matches") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    assert(CyberChef.sessionData(sessions, "nope") == "")
    assert(CyberChef.sessionJson(sessions, "nope") == """{"data":""}""")
    val s = sessions.collect().find(s =>
      s.ipProtocol == 6 && s.srcDataBytes > 0).get
    val j = CyberChef.sessionJson(sessions, s.sessionId)
    assert(j.startsWith("""{"data":"""") && j.endsWith("\"}"))
  }
}
