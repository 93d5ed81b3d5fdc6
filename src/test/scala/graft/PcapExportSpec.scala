package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder
import graft.ops.PcapExport

/** sessions.pcap export (viewer/apiSessions.js:685-744, 853-894): header
  * + verbatim records, and the exported file must round-trip through the
  * sessionizer unchanged.
  */
class PcapExportSpec extends AnyFunSuite with SparkSpecBase {

  private val srcPcap = "/root/reference/tests/pcap/socks-http-example.pcap"

  private def contentFields(path: String) =
    SessionBuilder.sessionize(spark, path).toDF()
      .select("sessionId", "srcIp", "srcPort", "dstIp", "dstPort",
        "totPackets", "totBytes", "srcPayload8", "dstPayload8")
      .collect().toSet

  test("exported pcap round-trips: same sessions, header verbatim") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val out = Files.createTempDirectory("graft-export").resolve("all.pcap")
    val n = PcapExport.writeFile(sessions, out.toString)
    assert(n > 0)
    val exported = Files.readAllBytes(out)
    val original = Files.readAllBytes(Paths.get(srcPcap))
    assert(exported.slice(0, 24).sameElements(original.slice(0, 24)))
    // every original packet is referenced by some session here, so the
    // export is a byte-preserving permutation: same size, same sessions
    assert(exported.length === original.length)
    assert(contentFields(out.toString) === contentFields(srcPcap))
  }

  test("single-session export contains exactly that session") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val one = sessions.collect().minBy(_.firstPacket)
    val out = Files.createTempDirectory("graft-export").resolve("one.pcap")
    val n = PcapExport.writeFile(
      sessions.filter(_.sessionId == one.sessionId), out.toString)
    assert(n === one.totPackets)
    val re = SessionBuilder.sessionize(spark, out.toString).collect()
    assert(re.map(_.sessionId).toSeq === Seq(one.sessionId))
    assert(re.head.totBytes === one.totBytes)
    assert(re.head.srcPayload8 === one.srcPayload8)
  }

  test("pcapng export: well-formed SHB/IDB/EPB block chain, µs timestamps") {
    import java.nio.{ByteBuffer, ByteOrder}
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val out = Files.createTempDirectory("graft-export").resolve("all.pcapng")
    val n = PcapExport.writePcapNg(sessions, out.toString)
    val bytes = Files.readAllBytes(out)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var types = List.empty[Int]
    var minTs = Long.MaxValue
    while (bb.remaining() >= 12) {
      val start = bb.position()
      val tpe = bb.getInt; val len = bb.getInt
      types ::= tpe
      assert(len % 4 === 0)
      if (tpe == 6) {
        bb.getInt // interface id
        val ts = (bb.getInt.toLong << 32) | (bb.getInt.toLong & 0xffffffffL)
        minTs = math.min(minTs, ts)
      }
      // trailing block-length mirrors the leading one
      assert(bb.getInt(start + len - 4) === len)
      bb.position(start + len)
    }
    assert(bb.remaining() === 0) // chain consumes the file exactly
    val t = types.reverse
    assert(t.head === 0x0a0d0d0a && t(1) === 1)
    assert(t.count(_ == 6) === n && n === sessions.collect().map(_.totPackets).sum)
    // earliest EPB timestamp (µs) is the earliest session start (ms)
    assert(minTs / 1000 === sessions.collect().map(_.firstPacket).min)
  }

  test("writeHeader=false omits the global header") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val out = Files.createTempDirectory("graft-export").resolve("nohdr.pcap")
    PcapExport.writeFile(sessions, out.toString, writeHeader = false)
    val bytes = Files.readAllBytes(out)
    val magic = Seq(0xa1, 0xb2, 0xc3, 0xd4, 0xd4, 0xc3, 0xb2, 0xa1)
    assert(!magic.contains(bytes(0) & 0xff))
  }
}
