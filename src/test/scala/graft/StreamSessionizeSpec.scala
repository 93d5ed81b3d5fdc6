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

  test("streaming equals batch under RANDOM flush boundaries (seeded)") {
    // the fixed 3-flush golden pins one boundary placement; state-carry
    // bugs live at arbitrary ones (a flush mid-handshake, mid-reassembly,
    // between a FIN and its ACK). Random contiguous splits of the same
    // capture must all converge to the batch answer. Seeded LCG —
    // failures reproduce.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val pcap = "/root/reference/tests/pcap/socks-http-example.pcap"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pcap))
    val packets = Pcap.parseFile(bytes, pcap).flatMap(Decode.decode(_)).toSeq
    val batch = SessionBuilder.sessionizeRef(spark, pcap)
      .collect().sortBy(_.firstPacket)
    var seed = 0xcafef00dL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 0 until 3) {
      val nCuts = 1 + nextInt(6)
      val cuts = Seq.fill(nCuts)(1 + nextInt(packets.length - 1))
        .distinct.sorted
      val chunks = (Seq(0) ++ cuts ++ Seq(packets.length))
        .sliding(2).map { case Seq(a, b) => packets.slice(a, b) }
        .filter(_.nonEmpty).toSeq
      val input = MemoryStream[Decode.DecodedPacket]
      val name = s"stream_sessions_rnd_$trial"
      val q = StreamSessionize.sessions(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        chunks.foreach { c =>
          input.addData(c)
          q.processAllAvailable()
        }
        val late = packets.last.copy(
          tsMicros = packets.map(_.tsMicros).max + 1000L * 1000000L,
          srcIp = "203.0.113.99", srcPort = 1)
        input.addData(Seq(late))
        q.processAllAvailable()
        input.addData(Seq(late.copy(tsMicros = late.tsMicros + 1)))
        q.processAllAvailable()
        val streamed = spark.table(name)
          .as[SessionBuilder.SessionRow].collect()
          .filter(_.srcIp != "203.0.113.99")
          .sortBy(_.firstPacket)
        assert(streamed.length == batch.length,
          s"trial $trial (cuts at $cuts): ${streamed.length} sessions " +
            s"vs batch ${batch.length}")
        streamed.zip(batch).foreach { case (s, b) =>
          assert(s.sessionId == b.sessionId, s"trial $trial cuts $cuts")
          assert(s.totPackets == b.totPackets, s"trial $trial cuts $cuts")
          assert(s.totBytes == b.totBytes, s"trial $trial cuts $cuts")
          assert(s.srcPayload8 == b.srcPayload8, s"trial $trial cuts $cuts")
          assert(s.httpMethod == b.httpMethod, s"trial $trial cuts $cuts")
          assert(s.protocol == b.protocol, s"trial $trial cuts $cuts")
        }
      } finally q.stop()
    }
  }

  test("carry: FIN direction stays consistent when a slice starts with the other endpoint") {
    // client FIN ends slice 1; slice 2 STARTS with the server's FIN —
    // with head-relative direction bits both FINs would land on bit 1
    // and the reuse SYN would not split (reviewed bug)
    def pkt(i: Int, src: Boolean, flags: Int, seq: Long): Decode.DecodedPacket =
      Decode.DecodedPacket("s", i, 1700000000000000L + i * 1000L,
        i.toLong * 100, 70, 54, "aa:aa:aa:aa:aa:01", "ff:ff:ff:ff:ff:ff", 6,
        if (src) "1.1.1.1" else "2.2.2.2", if (src) "2.2.2.2" else "1.1.1.1",
        if (src) 1234 else 80, if (src) 80 else 1234,
        flags, 1000, seq, 0L, Array.emptyByteArray,
        prevTsMicros = 1700000000000000L + math.max(0, i - 1) * 1000L,
        l4Offset = 54)
    val S = Decode.TH_SYN; val A = Decode.TH_ACK; val F = Decode.TH_FIN
    val key = SessionBuilder.sessionKey(pkt(0, src = true, S, 1000L))
    val slice1 = Seq(
      pkt(0, src = true, S, 1000L), pkt(1, src = false, S | A, 5000L),
      pkt(2, src = true, F | A, 1001L)) // client FIN
    val slice2 = Seq(
      pkt(3, src = false, F | A, 5001L), // server FIN — head of this slice
      pkt(4, src = true, S, 9000L), // bare SYN: port reuse
      pkt(5, src = false, S | A, 7000L))
    val (rows1, c1) = SessionBuilder.buildSessionsCarry(key,
      slice1.iterator, "test", carry = None)
    assert(c1.get.finDirs == 1)
    val (rows2, _) = SessionBuilder.buildSessionsCarry(key,
      slice2.iterator, "test", carry = c1)
    // batch over the whole list splits the reuse into |r1
    val batch = SessionBuilder.buildSessions(key,
      (slice1 ++ slice2).iterator, "test").toSeq
    assert(batch.map(_.sessionId).distinct.sorted == Seq(key, s"$key|r1"))
    assert((rows1 ++ rows2).exists(_.sessionId == s"$key|r1"),
      "carried FIN bits must detect the cross-slice close + reuse")

    // pending-split carry: the reuse SYN is the LAST packet of a slice
    // (it files into the OLD session per closingQ), and the next slice
    // must open |r1 even though it starts with a SYN-ACK
    val sliceA = Seq(
      pkt(0, src = true, S, 1000L), pkt(1, src = false, S | A, 5000L),
      pkt(2, src = true, F | A, 1001L), pkt(3, src = false, F | A, 5001L),
      pkt(4, src = true, S, 9000L)) // reuse SYN, last of the slice
    val sliceB = Seq(
      pkt(5, src = false, S | A, 7000L),
      pkt(6, src = true, A, 9001L))
    val (rowsA, cA) = SessionBuilder.buildSessionsCarry(key,
      sliceA.iterator, "test", carry = None)
    assert(cA.get.splitPendingNew, "pending reuse split must be carried")
    val (rowsB, _) = SessionBuilder.buildSessionsCarry(key,
      sliceB.iterator, "test", carry = cA)
    assert(rowsB.nonEmpty && rowsB.forall(_.sessionId == s"$key|r1"),
      s"next slice must open the reused session: ${rowsB.map(_.sessionId)}")
    val batchA = SessionBuilder.buildSessions(key,
      (sliceA ++ sliceB).iterator, "test").toSeq
    assert(batchA.map(_.sessionId).distinct.sorted == Seq(key, s"$key|r1"))
    // and the old session's rows in the slice walk match batch's count
    assert(rowsA.map(_.sessionId).distinct == Seq(key))
  }

  test("carry: BGP 5s pq timer spans a flush boundary") {
    val base = 1700000000L * 1000000L
    val keepalive = Array.fill(16)(0xff.toByte) ++ Array[Byte](0, 19, 4)
    def pkt(i: Int, tsOffUs: Long, src: Boolean, flags: Int,
        payload: Array[Byte]): Decode.DecodedPacket =
      Decode.DecodedPacket("s", i, base + tsOffUs, i.toLong * 100,
        70 + payload.length, 54 + payload.length,
        "aa:aa:aa:aa:aa:01", "ff:ff:ff:ff:ff:ff", 6,
        if (src) "1.1.1.1" else "2.2.2.2", if (src) "2.2.2.2" else "1.1.1.1",
        if (src) 1234 else 179, if (src) 179 else 1234,
        flags, 1000, 1000L + i, 0L, payload,
        prevTsMicros = base + tsOffUs, l4Offset = 54)
    val S = Decode.TH_SYN; val A = Decode.TH_ACK; val P = Decode.TH_PSH
    val slice1 = Seq(
      pkt(0, 0L, src = true, S, Array.emptyByteArray),
      pkt(1, 100000L, src = false, S | A, Array.emptyByteArray),
      pkt(2, 200000L, src = true, P | A, keepalive), // marker → bgpActive
      pkt(3, 1000000L, src = true, P | A, keepalive)) // arms pq at t=1.0s
    // next flush: first packet lands 6 s after the armed ts — the
    // carried deadline must fire a pq save exactly as the batch walk
    // would have, ending a segment at that packet
    val slice2 = Seq(
      pkt(4, 7000000L, src = true, P | A, keepalive),
      pkt(5, 7500000L, src = true, P | A, keepalive),
      pkt(6, 8000000L, src = true, P | A, keepalive))
    val key = SessionBuilder.sessionKey(slice1.head)
    val (rows1, c1) = SessionBuilder.buildSessionsCarry(key,
      slice1.iterator, "test", carry = None)
    assert(rows1.length == 1)
    assert(c1.get.bgpActive, "BGP classification must be carried")
    assert(c1.get.bgpArmedTs == base + 1000000L, "pq deadline base carried")
    val (rows2, c2) = SessionBuilder.buildSessionsCarry(key,
      slice2.iterator, "test", carry = c1)
    // pq fires on packet 4: [p4] saves, [p5,p6] continues — two rows,
    // same session, consecutive segment ordinals after slice1's
    assert(rows2.length == 2,
      s"carried pq timer must split: ${rows2.map(_.totPackets)}")
    assert(rows2.forall(_.sessionId == key))
    assert((rows1 ++ rows2).map(_.segmentSeq) == Seq(0, 1, 2))
    assert(c2.get.bgpActive && c2.get.bgpArmedTs == base + 8000000L)
  }

  test("exact-drain flush keeps the carry: next micro-batch continues segmentSeq") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = 1700000000L * 1000000L
    def pkt(i: Int, src: Boolean, flags: Int, seq: Long): Decode.DecodedPacket =
      Decode.DecodedPacket("s", i, base + i * 1000L, i.toLong * 100, 70, 54,
        "aa:aa:aa:aa:aa:01", "ff:ff:ff:ff:ff:ff", 6,
        if (src) "1.1.1.1" else "2.2.2.2", if (src) "2.2.2.2" else "1.1.1.1",
        if (src) 1234 else 80, if (src) 80 else 1234,
        flags, 1000, seq, 0L, Array.emptyByteArray,
        prevTsMicros = base + math.max(0, i - 1) * 1000L, l4Offset = 54)
    val S = Decode.TH_SYN; val A = Decode.TH_ACK
    val n = StreamSessionize.maxPackets
    // micro-batch 1 holds EXACTLY one flush: the buffer drains to zero
    // and the carry must survive in state (reviewed bug: state.remove()
    // here restarted the key at segmentSeq 0)
    val first: Seq[Decode.DecodedPacket] =
      Seq(pkt(0, src = true, S, 1000L), pkt(1, src = false, S | A, 5000L)) ++
        (2 until n).map(i => pkt(i, src = true, A, 1001L))
    val tail = (n until n + 3).map(i => pkt(i, src = true, A, 1001L))
    val key = SessionBuilder.sessionKey(first.head)
    val batch = SessionBuilder.buildSessions(key, (first ++ tail).iterator,
      "test").toSeq.sortBy(_.segmentSeq)
    assert(batch.map(_.segmentSeq) == Seq(0, 1))

    val input = MemoryStream[Decode.DecodedPacket]
    val q = StreamSessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("stream_sessions_drain")
      .outputMode("append").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(tail)
      q.processAllAvailable()
      val late = tail.last.copy(tsMicros = tail.last.tsMicros + 1000L * 1000000L,
        srcIp = "203.0.113.99", srcPort = 1)
      input.addData(Seq(late)); q.processAllAvailable()
      input.addData(Seq(late.copy(tsMicros = late.tsMicros + 1)))
      q.processAllAvailable()

      val streamed = spark.table("stream_sessions_drain")
        .as[SessionBuilder.SessionRow].collect()
        .filter(_.srcIp != "203.0.113.99").sortBy(_.segmentSeq)
      assert(streamed.map(r => (r.sessionId, r.segmentSeq)).distinct.length ==
        streamed.length, "no duplicate (sessionId, segmentSeq)")
      assert(streamed.length == batch.length)
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.sessionId == b.sessionId)
        assert(s.segmentSeq == b.segmentSeq)
        assert(s.totPackets == b.totPackets)
        assert(s.firstPacket == b.firstPacket)
      }
    } finally q.stop()
  }

  test("3-flush session: protocol/mac accumulation and port-reuse suffix match batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val base = 1700000000L * 1000000L
    def pkt(i: Int, src: Boolean, flags: Int, seq: Long,
        payload: Array[Byte], mac: String): Decode.DecodedPacket =
      Decode.DecodedPacket(
        file = "synthetic", index = i, tsMicros = base + i * 1000L,
        fileOffset = i.toLong * 100, recLen = 70 + payload.length,
        wireLen = 54 + payload.length,
        macSrc = mac, macDst = "ff:ff:ff:ff:ff:ff",
        ipProtocol = 6,
        srcIp = if (src) "1.1.1.1" else "2.2.2.2",
        dstIp = if (src) "2.2.2.2" else "1.1.1.1",
        srcPort = if (src) 1234 else 80, dstPort = if (src) 80 else 1234,
        tcpFlags = flags, tcpWindow = 1000, tcpSeq = seq, tcpAck = 0L,
        payload = payload,
        prevTsMicros = base + math.max(0, i - 1) * 1000L, l4Offset = 54)

    val S = Decode.TH_SYN; val A = Decode.TH_ACK
    val P = Decode.TH_PSH; val R = Decode.TH_RST
    val get = "GET / HTTP/1.1\r\nHost: h\r\n\r\n".getBytes("ISO-8859-1")
    val resp = "HTTP/1.1 200 OK\r\n\r\n".getBytes("ISO-8859-1")
    val none = Array.emptyByteArray
    val m1 = "aa:aa:aa:aa:aa:01"
    val m2 = "aa:aa:aa:aa:aa:02"
    val n = StreamSessionize.maxPackets // one flush's worth
    val packets: Seq[Decode.DecodedPacket] =
      Seq(
        pkt(0, src = true, S, 1000L, none, m1),
        pkt(1, src = false, S | A, 5000L, none, m1),
        pkt(2, src = true, P | A, 1001L, get, m1),
        pkt(3, src = false, P | A, 5001L, resp, m1)) ++
        // fill flush 1 with bare ACKs on mac m1
        (4 until n).map(i => pkt(i, src = true, A, 1001L + get.length, none, m1)) ++
        // flush 2: the src mac changes — its rows must still carry m1 too
        (n until 2 * n - 1).map(i =>
          pkt(i, src = true, A, 1001L + get.length, none, m2)) ++
        // last packet of flush 2: client RST-closes the connection
        Seq(pkt(2 * n - 1, src = true, R | A, 1001L + get.length, none, m2)) ++
        // tail (third flush, emitted at timeout): port reuse — a bare
        // SYN against the RST-closed carry opens session |r1
        Seq(
          pkt(2 * n, src = true, S, 9000L, none, m2),
          pkt(2 * n + 1, src = false, S | A, 7000L, none, m2),
          pkt(2 * n + 2, src = true, P | A, 9001L, get, m2),
          pkt(2 * n + 3, src = true, A, 9001L + get.length, none, m2))

    val key = SessionBuilder.sessionKey(packets.head)
    val batch = SessionBuilder.buildSessions(key, packets.iterator, "test")
      .toSeq.sortBy(r => (r.sessionId, r.segmentSeq))
    assert(batch.map(_.sessionId).distinct.sorted == Seq(key, s"$key|r1"),
      "batch must see the port reuse as a second session")
    assert(batch.length == 3, "2 mid-save segments + the reused session")

    val input = MemoryStream[Decode.DecodedPacket]
    val q = StreamSessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("stream_sessions3")
      .outputMode("append").start()
    try {
      input.addData(packets)
      q.processAllAvailable()
      val late = packets.last.copy(
        tsMicros = packets.last.tsMicros + 1000L * 1000000L,
        srcIp = "203.0.113.99", srcPort = 1)
      input.addData(Seq(late))
      q.processAllAvailable()
      input.addData(Seq(late.copy(tsMicros = late.tsMicros + 1)))
      q.processAllAvailable()

      val streamed = spark.table("stream_sessions3")
        .as[SessionBuilder.SessionRow].collect()
        .filter(_.srcIp != "203.0.113.99")
        .sortBy(r => (r.sessionId, r.segmentSeq))
      assert(streamed.length == batch.length)
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.sessionId == b.sessionId)
        assert(s.segmentSeq == b.segmentSeq && s.segmentCnt == b.segmentCnt)
        // the three verdict fields: protocol and macs accumulate across
        // flushes, the reuse suffix continues across the flush boundary
        assert(s.protocol == b.protocol, s"protocol of ${b.sessionId}/${b.segmentSeq}")
        assert(s.srcMac == b.srcMac, s"srcMac of ${b.sessionId}/${b.segmentSeq}")
        assert(s.dstMac == b.dstMac)
        assert(s.srcPayload8 == b.srcPayload8)
        assert(s.dstPayload8 == b.dstPayload8)
        assert(s.firstPacket == b.firstPacket && s.length == b.length)
        assert(s.totPackets == b.totPackets)
      }
      // the continuation segment (no GET of its own) still carries http
      // and both macs — the accumulation under test
      val seg2 = streamed.find(r => r.sessionId == key && r.segmentSeq == 1).get
      assert(seg2.protocol.contains("http"))
      // m1 and m2 both present (plus the broadcast dst of the server
      // direction, which folds into srcMac like the reference)
      assert(Set(m1, m2).subsetOf(seg2.srcMac.toSet))
    } finally q.stop()
  }

  test("SessionRow equality is by content, not array reference") {
    // packetPos/packetLen/packetFileIdx are primitive Array fields —
    // the synthesized case-class equals would compare them by reference
    // identity, so two independent builds of the same packets would
    // compare unequal and Set/distinct would silently keep duplicates.
    def pkt(i: Int, src: Boolean): Decode.DecodedPacket =
      Decode.DecodedPacket("s", i, 1700000000000000L + i * 1000L,
        i.toLong * 100, 70, 54, "aa:aa:aa:aa:aa:01", "ff:ff:ff:ff:ff:ff", 6,
        if (src) "1.1.1.1" else "2.2.2.2", if (src) "2.2.2.2" else "1.1.1.1",
        if (src) 1234 else 80, if (src) 80 else 1234,
        Decode.TH_ACK, 1000, 1000L + i, 0L, Array.emptyByteArray,
        prevTsMicros = 1700000000000000L + math.max(0, i - 1) * 1000L,
        l4Offset = 54)
    val packets = Seq(pkt(0, src = true), pkt(1, src = false),
      pkt(2, src = true))
    val key = SessionBuilder.sessionKey(packets.head)
    val a = SessionBuilder.buildSessions(key, packets.iterator, "test").toSeq
    val b = SessionBuilder.buildSessions(key, packets.iterator, "test").toSeq
    assert(a == b, "independently built identical sessions must compare ==")
    assert(a.head.hashCode == b.head.hashCode)
    assert((a ++ b).toSet.size == a.size, "Set must dedupe rebuilt rows")
    assert(a.head != a.head.copy(totPackets = a.head.totPackets + 1))
  }

  test("soak: state-store row count plateaus over many timeout horizons") {
    // A long-lived capture node sees an unbounded stream of NEW session
    // keys; the only thing keeping state bounded is the event-time
    // timeout eviction. Push 12 waves of 50 fresh single-packet UDP
    // sessions, each wave 120 s of event time apart (2x the 60 s UDP
    // timeout), and assert the state store PLATEAUS near one-to-two
    // waves of live sessions instead of growing with the 600 total —
    // i.e. evictions keep pace with arrivals.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val waves = 12
    val perWave = 50
    val baseMicros = 1700000000000000L
    def pkt(wave: Int, i: Int): Decode.DecodedPacket = {
      val ts = baseMicros + wave * 120L * 1000000L + i * 1000L
      Decode.DecodedPacket("s", wave * perWave + i, ts,
        0L, 70, 54, "aa:aa:aa:aa:aa:01", "ff:ff:ff:ff:ff:ff", 17,
        s"10.7.${wave}.${i % 250}", "10.99.99.99",
        10000 + i, 53, 0, 0, 0L, 0L, Array[Byte](0x68, 0x69),
        prevTsMicros = ts, l4Offset = 54)
    }
    val input = MemoryStream[Decode.DecodedPacket]
    val q = StreamSessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("stream_soak")
      .outputMode("append").start()
    try {
      val stateRows = Seq.newBuilder[Long]
      for (w <- 0 until waves) {
        input.addData((0 until perWave).map(i => pkt(w, i)))
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateRows += p.stateOperators.head.numRowsTotal
      }
      // flush the tail: advance the watermark far past the last timeout
      val late = pkt(waves + 20, 0).copy(srcIp = "203.0.113.99")
      input.addData(Seq(late))
      q.processAllAvailable()
      input.addData(Seq(late.copy(tsMicros = late.tsMicros + 1)))
      q.processAllAvailable()

      val series = stateRows.result()
      assert(series.nonEmpty)
      // the plateau: by wave 3 the store holds at most ~2 waves of live
      // sessions (the watermark lags one batch) — 3x one wave is the
      // pinned ceiling, 4x under the 600-key linear-growth failure mode
      val steady = series.drop(3)
      assert(steady.max <= 3L * perWave,
        s"state must plateau near $perWave live rows, got $series")
      assert(series.max >= perWave,
        s"soak must actually hold a wave of live state, got $series")
      // every session seen was emitted exactly once after its timeout
      val out = spark.table("stream_soak")
        .as[SessionBuilder.SessionRow].collect()
        .filter(_.srcIp != "203.0.113.99")
      assert(out.length == waves * perWave,
        s"expected ${waves * perWave} sessions, got ${out.length}")
      assert(out.map(_.sessionId).distinct.length == out.length)
    } finally q.stop()
  }

  test("RocksDB state store: streaming equals batch and survives kill-and-restart") {
    // HDFSBackedStateStoreProvider holds every key in executor heap —
    // at capture scale (millions of live sessions per executor) the
    // 100 TB deployment runs RocksDB. Same pipeline, same checkpoint
    // recovery contract, state off-heap: one mid-session kill trial
    // must still converge to the batch answer with no dupes.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val pcap = "/root/reference/tests/pcap/socks-http-example.pcap"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pcap))
    val packets = Pcap.parseFile(bytes, pcap).flatMap(Decode.decode(_)).toSeq
    val batch = SessionBuilder.sessionizeRef(spark, pcap)
      .collect().sortBy(_.firstPacket)
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocksdb").toString
    val buf = new scala.collection.mutable.ArrayBuffer[
      SessionBuilder.SessionRow]()
    val input = MemoryStream[Decode.DecodedPacket]
    def startQuery() = StreamSessionize.sessions(input.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[
          SessionBuilder.SessionRow], _: Long) =>
        val rows = ds.collect()
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    var q = startQuery()
    try {
      val cut = packets.length / 2
      input.addData(packets.take(cut))
      q.processAllAvailable()
      q.stop(); q.awaitTermination()
      q = startQuery() // recover RocksDB state from the checkpoint
      input.addData(packets.drop(cut))
      q.processAllAvailable()
      val late = packets.last.copy(
        tsMicros = packets.map(_.tsMicros).max + 1000L * 1000000L,
        srcIp = "203.0.113.99", srcPort = 1)
      input.addData(Seq(late))
      q.processAllAvailable()
      input.addData(Seq(late.copy(tsMicros = late.tsMicros + 1)))
      q.processAllAvailable()
      val streamed = buf.synchronized { buf.toSeq }
        .filter(_.srcIp != "203.0.113.99").sortBy(_.firstPacket)
      val segKeys = streamed.map(s => (s.sessionId, s.segmentSeq))
      assert(segKeys.distinct.length == segKeys.length)
      assert(streamed.length == batch.length,
        s"${streamed.length} sessions vs batch ${batch.length}")
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.sessionId == b.sessionId)
        assert(s.totPackets == b.totPackets)
        assert(s.totBytes == b.totBytes)
        assert(s.srcPayload8 == b.srcPayload8)
        assert(s.protocol == b.protocol)
      }
    } finally {
      try q.stop() finally {
        prev match {
          case Some(v) => spark.conf.set(confKey, v)
          case None => spark.conf.unset(confKey)
        }
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(ckpt)
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("checkpoint kill-and-restart: GroupCarry state and segmentSeq survive recovery") {
    // The reference survives a capture restart by losing only in-flight
    // sessions; our claim is STRONGER — a killed query restarted from its
    // Structured Streaming checkpoint recovers the open sessions (packet
    // buffers, GroupCarry orientation/accumulators/segment ordinals, the
    // restored watermark) and the union of rows emitted before and after
    // the kill equals the uninterrupted batch answer, with no duplicate
    // (sessionId, segmentSeq) and no loss. Seeded split points put the
    // kill mid-session (open TCP state at every cut of this capture).
    // The memory sink refuses checkpoint recovery in append mode, so the
    // sink is foreachBatch into a driver buffer — batches are only
    // appended once committed (clean stop between micro-batches), which
    // is exactly the exactly-once contract being asserted.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val pcap = "/root/reference/tests/pcap/socks-http-example.pcap"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pcap))
    val packets = Pcap.parseFile(bytes, pcap).flatMap(Decode.decode(_)).toSeq
    val batch = SessionBuilder.sessionizeRef(spark, pcap)
      .collect().sortBy(_.firstPacket)
    var seed = 0x5eedb00fL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 0 until 3) {
      // two kills per trial: both cuts land strictly inside the capture
      val cuts = Seq.fill(2)(1 + nextInt(packets.length - 1)).distinct.sorted
      val phases = (Seq(0) ++ cuts ++ Seq(packets.length))
        .sliding(2).map { case Seq(a, b) => packets.slice(a, b) }
        .filter(_.nonEmpty).toSeq
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_ckpt_$trial").toString
      val buf = new scala.collection.mutable.ArrayBuffer[
        SessionBuilder.SessionRow]()
      val input = MemoryStream[Decode.DecodedPacket]
      def startQuery() = StreamSessionize.sessions(input.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[
            SessionBuilder.SessionRow], _: Long) =>
          val rows = ds.collect()
          buf.synchronized { buf ++= rows }
          ()
        }
        .start()
      var q = startQuery()
      try {
        phases.zipWithIndex.foreach { case (chunk, i) =>
          input.addData(chunk)
          q.processAllAvailable()
          if (i < phases.length - 1) {
            // kill mid-session: open TCP groups sit in the state store
            q.stop()
            q.awaitTermination()
            q = startQuery() // recover from the checkpoint
          }
        }
        val late = packets.last.copy(
          tsMicros = packets.map(_.tsMicros).max + 1000L * 1000000L,
          srcIp = "203.0.113.99", srcPort = 1)
        input.addData(Seq(late))
        q.processAllAvailable()
        input.addData(Seq(late.copy(tsMicros = late.tsMicros + 1)))
        q.processAllAvailable()
        val streamed = buf.synchronized { buf.toSeq }
          .filter(_.srcIp != "203.0.113.99")
          .sortBy(_.firstPacket)
        // no duplicate emission across the kills (exactly-once sink view)
        val segKeys = streamed.map(s => (s.sessionId, s.segmentSeq))
        assert(segKeys.distinct.length == segKeys.length,
          s"trial $trial cuts $cuts: duplicate (sessionId, segmentSeq) " +
            "rows across restart")
        assert(streamed.length == batch.length,
          s"trial $trial (cuts at $cuts): ${streamed.length} sessions " +
            s"vs batch ${batch.length}")
        streamed.zip(batch).foreach { case (s, b) =>
          assert(s.sessionId == b.sessionId, s"trial $trial cuts $cuts")
          assert(s.totPackets == b.totPackets, s"trial $trial cuts $cuts")
          assert(s.totBytes == b.totBytes, s"trial $trial cuts $cuts")
          assert(s.srcPayload8 == b.srcPayload8, s"trial $trial cuts $cuts")
          assert(s.httpMethod == b.httpMethod, s"trial $trial cuts $cuts")
          assert(s.protocol == b.protocol, s"trial $trial cuts $cuts")
        }
      } finally {
        try q.stop() finally {
          import scala.jdk.CollectionConverters._
          val root = java.nio.file.Paths.get(ckpt)
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    }
  }
}
