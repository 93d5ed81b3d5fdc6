package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.etl.{Decode, SessionBuilder}
import graft.etl.Decode.DecodedPacket
import graft.etl.SessionBuilder.SessionRow

/** Streaming sessionization: the live-capture path of the reference
  * (capture/session.c find-or-create + timeout scans) as a Structured
  * Streaming stateful operator.
  *
  *   - state per session key = buffered packets + emitted-segment count;
  *   - event-time timeout = inactivity timeout for the session's protocol
  *     (ICMP 10 s … TCP 480 s), armed at each batch from the latest packet;
  *   - mid-save: when a session exceeds `maxPackets` buffered, a segment
  *     row is emitted immediately and counters restart — the reference's
  *     long-session segmenting (session.c:312-357);
  *   - on timeout the remaining packets become the final segment(s) and
  *     state is dropped. A packet arriving later simply opens a new
  *     session row, exactly like the reference (SURVEY §2.4 late data).
  *
  * Scale: state is bounded by maxPackets × live sessions per key-range;
  * the shuffle is the same hash-partition by sessionId as batch. The
  * watermark delay bounds how long evicted state lingers.
  */
object StreamSessionize {

  /** `carry` is the batch builder's cross-segment session state
    * ([[SessionBuilder.GroupCarry]]) threaded across mid-save flushes:
    * orientation, the protocol/mac/firstBytes accumulators, session
    * firstPacket, segment ordinals, SYN/FIN/RST flag state and the
    * port-reuse suffix ordinal all survive a flush exactly as they
    * survive a mid-save in the batch walk. Remaining known divergence
    * from batch on mid-saved sessions: flush edges force segment
    * boundaries at buffer multiples (the reference's maxPackets save
    * does the same from segment start), and a FIN-close port-reuse SYN
    * lands in the NEW session's first segment instead of the old one's
    * last (see [[SessionBuilder.buildSessionsCarry]]).
    */
  final case class StreamState(packets: Seq[DecodedPacket],
      carry: Option[SessionBuilder.GroupCarry])

  val WatermarkDelay = "10 seconds"

  def maxPackets: Int = SessionBuilder.MaxPackets

  def processGroup(node: String)(
      key: String,
      newPackets: Iterator[DecodedPacket],
      state: GroupState[StreamState]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      return SessionBuilder.buildSessionsCarry(key, st.packets.iterator,
        node, carry = st.carry)._1.iterator
    }
    val prev = state.getOption.getOrElse(StreamState(Nil, None))
    var packets = prev.packets ++ newPackets
    var carry = prev.carry
    var lastTsMicros = 0L
    var lastProto = 6
    val out = Seq.newBuilder[SessionRow]
    // mid-save: flush full segments, keep the session open; the carry
    // threads the open group's state into the next flush
    while (packets.length >= maxPackets) {
      val (seg, rest) = packets.splitAt(maxPackets)
      val (rows, c2) = SessionBuilder.buildSessionsCarry(key, seg.iterator,
        node, carry = carry)
      out ++= rows
      carry = c2
      lastTsMicros = math.max(lastTsMicros, seg.map(_.tsMicros).max)
      lastProto = seg.head.ipProtocol
      packets = rest
    }
    if (packets.nonEmpty) {
      state.update(StreamState(packets, carry))
      val timeoutMs =
        SessionBuilder.timeoutSecs(packets.head.ipProtocol) * 1000
      val lastEventMs = packets.map(_.tsMicros).max / 1000
      state.setTimeoutTimestamp(lastEventMs + timeoutMs)
    } else if (carry.isDefined) {
      // the buffer drained to an exact maxPackets multiple: the session
      // is still open and the carry (segment ordinals, orientation,
      // accumulators) must survive to the next micro-batch — dropping it
      // here would restart the key at segmentSeq 1 and emit duplicate
      // (sessionId, segmentSeq) rows. Keep an empty-buffer state with the
      // same inactivity timeout; at timeout the empty buffer emits
      // nothing (matching batch, where a group ending exactly on a
      // mid-save boundary adds no extra row) and the state is dropped.
      state.update(StreamState(Nil, carry))
      val timeoutMs = SessionBuilder.timeoutSecs(lastProto) * 1000
      state.setTimeoutTimestamp(lastTsMicros / 1000 + timeoutMs)
    } else {
      state.remove()
    }
    out.result().iterator
  }

  /** Wire a (possibly streaming) packet Dataset into session rows.
    * `node` stamps every emitted row (a capture node passes its
    * configured name; the default matches the batch sessionizer's).
    */
  def sessions(packets: Dataset[DecodedPacket],
      node: String = "test"): Dataset[SessionRow] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packets
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", WatermarkDelay)
      .as[DecodedPacket]
      .groupByKey(SessionBuilder.sessionKey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processGroup(node))
  }

  /** Streaming pipeline over a live pcap-over-ip endpoint — the I1 live
    * path end-to-end: socket records → decode → stateful sessionize.
    * `prevTsMicros` is set to the packet's own ts; live streams drive
    * idle/save timeouts from the event-time watermark, not the offline
    * file clock.
    */
  def fromPcapOverIp(
      spark: SparkSession, host: String, port: Int,
      node: String = "test", bpf: Option[String] = None):
      Dataset[SessionRow] = {
    import spark.implicits._
    // the live-capture role of the reference's `bpf=` filter: compiled
    // once on the driver, applied map-side before any stateful work
    val capture = bpf.map(graft.etl.Bpf.packetPredicate(_))
    val raw = spark.readStream.format("pcap-over-ip")
      .option("host", host).option("port", port.toString).load()
      .as[(Long, Int, Int, Int, Array[Byte])]
    val packets = raw.flatMap { case (ts, incl, orig, link, data) =>
      Decode.decode(graft.etl.Pcap.RawPacket(
        s"pcap-over-ip://$host:$port", 0, ts, incl, orig, 0L, link, data, ts))
        .filter(d => capture.forall(_(d)))
    }
    sessions(packets, node)
  }

  /** Streaming pipeline over a directory of pcap files (file-source). */
  def fromPcapDir(spark: SparkSession, dir: String,
      node: String = "test", bpf: Option[String] = None):
      Dataset[SessionRow] = {
    import spark.implicits._
    val capture = bpf.map(graft.etl.Bpf.packetPredicate(_))
    val files = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.pcap")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
    val packets = files.flatMap { case (p, bytes) =>
      graft.etl.Pcap.assembleFrags4(graft.etl.Pcap.parseFile(bytes, p))
        .flatMap(Decode.decode(_)).filter(d => capture.forall(_(d)))
    }
    sessions(packets, node)
  }
}
