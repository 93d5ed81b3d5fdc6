package graft

import java.net.ServerSocket

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pcap

/** The pcap-over-ip streaming source must deliver exactly the records a
  * batch parse of the same capture yields (count, bytes, timestamps).
  */
class PcapOverIpSourceSpec extends AnyFunSuite with SparkSpecBase {

  private def roundTrip(pcapPath: String, table: String): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pcapPath))
    val want = Pcap.parseFile(bytes, pcapPath).toSeq

    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val serve = new Thread(() => {
      try {
        val s = server.accept()
        s.getOutputStream.write(bytes)
        s.getOutputStream.flush()
        // keep the connection open: a live capture stream does not EOF
        Thread.sleep(30000)
        s.close()
      } catch { case _: Exception => }
    })
    serve.setDaemon(true)
    serve.start()

    val stream = spark.readStream
      .format("graft.sources.PcapOverIpProvider")
      .option("host", "127.0.0.1")
      .option("port", server.getLocalPort.toString)
      .load()
    val q = stream.writeStream.format("memory").queryName(table)
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < want.length && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table(table).count()
        if (n < want.length) Thread.sleep(100)
      }
      val got = spark.table(table)
        .orderBy("ts_micros")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getAs[Array[Byte]](4).toSeq))
      assert(got.length == want.length)
      val wantTuples = want.sortBy(_.tsMicros).map(p =>
        (p.tsMicros, p.inclLen, p.origLen, p.linkType, p.data.toSeq))
      assert(got.toSeq == wantTuples)
    } finally {
      q.stop()
      server.close()
    }
  }

  test("streams a served pcap byte-for-byte into micro-batches") {
    roundTrip("/root/reference/tests/pcap/http-301-get.pcap", "pcap_over_ip")
  }

  test("nanosecond-magic capture streams with microsecond truncation") {
    roundTrip("/root/reference/tests/pcap/ipv6-gtp6.pcap", "pcap_over_ip_nanos")
  }

  test("retries until the capture endpoint comes up") {
    val pcapPath = "/root/reference/tests/pcap/http-301-get.pcap"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pcapPath))
    val want = Pcap.parseFile(bytes, pcapPath).size
    // reserve a port, then release it so the first connects are refused
    val probe = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port = probe.getLocalPort
    probe.close()
    val q = spark.readStream.format("pcap-over-ip")
      .option("host", "127.0.0.1").option("port", port.toString)
      .load()
      .writeStream.format("memory").queryName("pcap_late_server")
      .outputMode("append").start()
    try {
      Thread.sleep(400) // let the reader hit ConnectException at least once
      val server = new ServerSocket(port, 1, java.net.InetAddress.getLoopbackAddress)
      val serve = new Thread(() => {
        try {
          val s = server.accept()
          s.getOutputStream.write(bytes)
          s.getOutputStream.flush()
          Thread.sleep(30000)
          s.close()
        } catch { case _: Exception => }
      })
      serve.setDaemon(true)
      serve.start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        var n = 0L
        while (n < want && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          n = spark.table("pcap_late_server").count()
          if (n < want) Thread.sleep(100)
        }
        assert(n == want)
      } finally server.close()
    } finally q.stop()
  }

  test("restart adopts the checkpointed offset instead of dropping records") {
    import graft.sources.{PcapCountOffset, PcapOverIpStream}
    // no endpoint on port 1: the reader thread just retries, buffer stays
    // empty — exactly the state of a freshly restarted driver
    val s = new PcapOverIpStream("127.0.0.1", 1, 1L << 20)
    try {
      assert(s.latestOffset() == PcapCountOffset(0L))
      // restore from a checkpoint that had committed offset 100: the
      // stream must rebase so the next arriving record is offset 100,
      // not silently discarded until the fresh count passes 100
      s.deserializeOffset("100")
      assert(s.latestOffset() == PcapCountOffset(100L))
      // replay of the in-flight batch (40, 100] against the rebased
      // empty buffer yields an empty partition, never a negative slice
      val parts = s.planInputPartitions(PcapCountOffset(40L), PcapCountOffset(100L))
      assert(parts.length == 1)
      assert(parts(0).asInstanceOf[graft.sources.PcapSlicePartition].recs.isEmpty)
      // deserializing an offset at/below the current high-water mark
      // (start of the replayed batch) must NOT rebase anything
      s.deserializeOffset("40")
      assert(s.latestOffset() == PcapCountOffset(100L))
    } finally s.stop()
  }

  test("short name pcap-over-ip resolves via DataSourceRegister") {
    val df = spark.readStream.format("pcap-over-ip")
      .option("host", "127.0.0.1").option("port", "1").load()
    assert(df.schema == graft.sources.PcapOverIp.schema)
    assert(df.isStreaming)
  }

  test("live path end-to-end: socket -> decode -> sessionize matches batch") {
    import spark.implicits._
    val pcap = "/root/reference/tests/pcap/http-301-get.pcap"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pcap))
    val batch = graft.etl.SessionBuilder.sessionizeRef(spark, pcap)
      .collect().sortBy(_.firstPacket)

    // craft watermark-advancing records: copies of the last capture
    // record with ts pushed past the TCP timeout and a mangled src ip
    // (distinct 5-tuple) so the real sessions time out and flush
    val last = Pcap.parseFile(bytes, pcap).toSeq.last
    val header = Pcap.parseHeader(bytes).get
    val order = if (header.bigEndian) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN
    def lateRec(i: Int): Array[Byte] = {
      val rec = java.util.Arrays.copyOfRange(bytes,
        last.fileOffset.toInt, (last.fileOffset + 16 + last.inclLen).toInt)
      val bb = java.nio.ByteBuffer.wrap(rec).order(order)
      val sec = bb.getInt(0)
      bb.putInt(0, sec + 2000 + 600 * i) // march past every timeout
      rec(16 + 26) = (200 + i).toByte // ipv4 src octet → new session key
      rec
    }
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val serve = new Thread(() => {
      try {
        val s = server.accept()
        s.getOutputStream.write(bytes)
        s.getOutputStream.flush()
        (0 until 8).foreach { i =>
          Thread.sleep(400)
          s.getOutputStream.write(lateRec(i))
          s.getOutputStream.flush()
        }
        Thread.sleep(30000)
        s.close()
      } catch { case _: Exception => }
    })
    serve.setDaemon(true)
    serve.start()

    val q = graft.streaming.StreamSessionize
      .fromPcapOverIp(spark, "127.0.0.1", server.getLocalPort)
      .writeStream.format("memory").queryName("live_sessions")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def flushed(): Array[graft.etl.SessionBuilder.SessionRow] =
        spark.table("live_sessions")
          .as[graft.etl.SessionBuilder.SessionRow].collect()
          .filter(s => batch.exists(_.sessionId == s.sessionId))
      var n = -1
      while (n < batch.length && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = flushed().length
        if (n < batch.length) Thread.sleep(200)
      }
      val live = flushed().sortBy(_.firstPacket)
      assert(live.length == batch.length)
      live.zip(batch).foreach { case (s, b) =>
        assert(s.sessionId == b.sessionId)
        assert(s.totPackets == b.totPackets && s.totBytes == b.totBytes)
        assert(s.protocol == b.protocol)
      }
    } finally {
      q.stop()
      server.close()
    }
  }
}
