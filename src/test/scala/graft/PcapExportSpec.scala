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

  test("pcapng ingest: export->transcode->sessionize round-trips content") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val dir = Files.createTempDirectory("graft-png")
    val ng = dir.resolve("all.pcapng")
    assert(PcapExport.writePcapNg(sessions, ng.toString) > 0)
    // the pcapng re-ingests directly (parseFile transcodes in-memory)
    assert(contentFields(ng.toString) === contentFields(srcPcap))
    // and a DIRECT pcapng sessionize leaves packet references that the
    // slice readers resolve (PcapStore.Local serves the transcoded
    // image for pcapng files, so stored offsets stay meaningful)
    val direct = SessionBuilder.sessionize(spark, ng.toString)
    val directOut = dir.resolve("direct-export.pcap").toString
    assert(PcapExport.writeFile(direct, directOut) > 0)
    assert(contentFields(directOut) === contentFields(srcPcap))
    // and the transcoder emits classic records bit-identical to the
    // classic exporter's (same packets, same µs timestamps)
    val classic = dir.resolve("all.pcap")
    PcapExport.writeFile(sessions, classic.toString)
    val trans = graft.etl.Pcap.pcapngToPcap(Files.readAllBytes(ng)).get
    val a = graft.etl.Pcap.parseFile(trans, "t").toSeq
    val b = graft.etl.Pcap.parseFile(
      Files.readAllBytes(classic), "c").toSeq
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.tsMicros == y.tsMicros && x.data.toSeq == y.data.toSeq)
    }
  }

  test("pcapng upload: durable copy is classic pcap; store hunts/exports work") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val dir = Files.createTempDirectory("graft-pngup")
    val ng = dir.resolve("posted.pcapng")
    PcapExport.writePcapNg(sessions, ng.toString)
    val r = graft.ops.Upload.upload(spark, ng.toString,
      dir.resolve("store").toString, dir.resolve("pcap").toString,
      tags = Seq("ng"))
    assert(r.sessions == sessions.count())
    val durable = Files.readAllBytes(Paths.get(r.pcapPath))
    assert(!graft.etl.Pcap.isPcapng(durable)) // transcoded at copy time
    // stored packet references seek correctly into the durable copy
    import spark.implicits._
    val rows = spark.read.parquet(dir.resolve("store").toString)
      .drop("day").as[SessionBuilder.SessionRow]
    val out = dir.resolve("roundtrip.pcap").toString
    assert(PcapExport.writeFile(rows, out) > 0)
    assert(contentFields(out) === contentFields(srcPcap))
  }

  test("pcapng transcoder: big-endian sections and if_tsresol units") {
    import java.nio.{ByteBuffer, ByteOrder}
    def block(order: ByteOrder, tpe: Int, body: Array[Byte]): Array[Byte] = {
      val pad = (4 - body.length % 4) % 4
      val len = 12 + body.length + pad
      val bb = ByteBuffer.allocate(len).order(order)
      bb.putInt(tpe).putInt(len).put(body)
        .position(bb.position() + pad)
      bb.putInt(len)
      bb.array()
    }
    def mk(order: ByteOrder): Array[Byte] = {
      val shbBody = ByteBuffer.allocate(16).order(order)
        .putInt(0x1a2b3c4d).putShort(1).putShort(0).putLong(-1L).array()
      // IDB: linktype 1, snap 4096, if_tsresol = 9 (nanoseconds)
      val idbBody = {
        val bb = ByteBuffer.allocate(16).order(order)
        bb.putShort(1).putShort(0).putInt(4096)
        bb.putShort(9).putShort(1).put(9.toByte) // if_tsresol: 10^-9
        bb.array()
      }
      // EPB: iface 0, ts = 5e9 ns = 5.000000 s, 4 data bytes
      val ts = 5000000000L
      val epbBody = ByteBuffer.allocate(24).order(order)
        .putInt(0).putInt((ts >>> 32).toInt).putInt(ts.toInt)
        .putInt(4).putInt(4)
        .put(Array[Byte](1, 2, 3, 4)).array()
      block(order, 0x0a0d0d0a, shbBody) ++
        block(order, 1, idbBody) ++ block(order, 6, epbBody)
    }
    for (order <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val out = graft.etl.Pcap.pcapngToPcap(mk(order)).get
      val pkts = graft.etl.Pcap.parseFile(out, "t").toSeq
      assert(pkts.length == 1, s"order $order")
      assert(pkts.head.tsMicros == 5000000L) // ns -> µs
      assert(pkts.head.data.toSeq == Seq[Byte](1, 2, 3, 4))
      assert(pkts.head.linkType == 1)
    }
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
