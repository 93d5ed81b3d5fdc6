package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Decode, Pcap, SessionBuilder}
import graft.streaming.StreamSessionize

/** The streaming sessionizer must emit the same sessions as the batch
  * path once the watermark passes the inactivity timeouts.
  */
class StreamSessionizeSpec extends AnyFunSuite with SparkSpecBase {

  test("streaming equals batch on socks-http-example after timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val pcap = "/root/reference/tests/pcap/socks-http-example.pcap"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pcap))
    val packets = Pcap.parseFile(bytes, pcap).flatMap(Decode.decode(_)).toSeq

    val input = MemoryStream[Decode.DecodedPacket]
    val q = StreamSessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode("append").start()
    try {
      input.addData(packets)
      q.processAllAvailable()
      // advance the watermark far past the TCP timeout with a dummy packet
      val late = packets.last.copy(
        tsMicros = packets.map(_.tsMicros).max + 1000L * 1000000L,
        srcIp = "203.0.113.99", srcPort = 1)
      input.addData(Seq(late))
      q.processAllAvailable()
      input.addData(Seq(late.copy(tsMicros = late.tsMicros + 1)))
      q.processAllAvailable()

      val streamed = spark.table("stream_sessions")
        .as[SessionBuilder.SessionRow].collect()
        .filter(_.srcIp != "203.0.113.99")
        .sortBy(_.firstPacket)
      val batch = SessionBuilder.sessionizeRef(spark, pcap)
        .collect().sortBy(_.firstPacket)
      assert(streamed.length == batch.length)
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.sessionId == b.sessionId)
        assert(s.totPackets == b.totPackets)
        assert(s.totBytes == b.totBytes)
        assert(s.srcPayload8 == b.srcPayload8)
        assert(s.httpMethod == b.httpMethod)
        assert(s.protocol == b.protocol)
      }
    } finally q.stop()
  }
}
