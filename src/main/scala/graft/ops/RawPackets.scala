package graft.ops

import org.apache.spark.sql.Dataset

import graft.etl.Decode
import graft.etl.Decode.DecodedPacket
import graft.etl.SessionBuilder.SessionRow

/** The raw-packet viewer endpoints — `GET /api/session/raw/:node/:id`
  * (one direction's conversation bytes, apiSessions.js:2854-2885
  * getRawPackets) and `GET /api/session/raw/:node/:id.png` (the bitmap
  * rendering, apiSessions.js:2804-2851 getPacketPNG) — plus the
  * direction-run division both are built on (viewer/pcap.js:762-1040
  * reassemble_icmp/udp/sctp/tcp): the session's packets divided into
  * ALTERNATING-direction chunks, consecutive same-direction packets
  * merged into one run, TCP runs seq-reassembled, and an empty source
  * chunk prepended when the conversation opens with the destination —
  * so even chunk indices are always the source direction.
  *
  * Spark-first shape: like [[CyberChef]], these are interactive
  * single-session fetches — seek-only blob reads of one session's
  * stored packets on the calling thread, capped at
  * [[CyberChef.MaxPackets]]; no job is launched.
  */
object RawPackets {

  /** One direction run. `key` is `srcIp:srcPort` of the run's sender
    * ("" for the gap separators reassemble_tcp inserts); `tsMs` is the
    * run's first packet time.
    */
  final case class Chunk(key: String, data: Array[Byte], tsMs: Long)

  /** apiStats-side rendering constant (viewer/internals.js:43). */
  val PngLineWidth = 256

  /** A run merge may not materialize more than this many bytes (the
    * reference buffers the whole conversation in node; a hostile
    * 4 GB-seq-span session would OOM either — we clamp instead).
    */
  val MaxRunBytes: Int = 256 << 20

  private def key(p: DecodedPacket): String = s"${p.srcIp}:${p.srcPort}"
  private def tsMs(p: DecodedPacket): Long = p.tsMicros / 1000L

  /** Divide a session's decoded packets (capture order) into the
    * viewer's alternating direction runs. `srcKey` is the session's
    * source `ip:port` (reassemble_tcp's skey).
    */
  def chunks(packets: IndexedSeq[DecodedPacket],
      srcKey: String): IndexedSeq[Chunk] = {
    if (packets.isEmpty) return IndexedSeq.empty
    packets.head.ipProtocol match {
      case 6 => tcpChunks(packets, srcKey)
      // udp/sctp key runs on ip:port, icmp on bare ip
      // (pcap.js:766,789,815)
      case 17 | 132 => simpleRuns(packets, key)
      case 1 => simpleRuns(packets, p => p.srcIp)
      case _ => IndexedSeq.empty // the reference answers [] (apiSessions.js:1551+)
    }
  }

  private def simpleRuns(packets: Seq[DecodedPacket],
      keyOf: DecodedPacket => String): IndexedSeq[Chunk] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    packets.foreach { p =>
      val k = keyOf(p)
      if (out.isEmpty || out.last.key != k)
        out += Chunk(k, p.payload, tsMs(p))
      else out(out.length - 1) =
        out.last.copy(data = out.last.data ++ p.payload)
    }
    out.toIndexedSeq
  }

  private def tcpChunks(all: IndexedSeq[DecodedPacket],
      srcKey: String): IndexedSeq[Chunk] = {
    // drop syn/rst/empty (pcap.js:913-915)
    val packets = all.filter(p => p.payload.nonEmpty &&
      (p.tcpFlags & (Decode.TH_SYN | Decode.TH_RST)) == 0)
    if (packets.isEmpty) return IndexedSeq.empty

    // per-direction seq wrap detection (pcap.js:934-961): a >2^31 span
    // means the 32-bit sequence wrapped mid-session; low halves get
    // +0xffffffff exactly like the reference
    val dirs = packets.map(key).distinct
    val span = dirs.map { k =>
      val seqs = packets.filter(p => key(p) == k).map(_.tcpSeq)
      k -> (seqs.min, seqs.max)
    }.toMap
    val wrapSeq = dirs.filter(k => span(k)._2 - span(k)._1 > 0x7fffffffL).toSet
    // a direction's ACKs wrap when the OTHER direction's seqs did
    val wrapAck =
      dirs.filter(k => dirs.exists(o => o != k && wrapSeq(o))).toSet
    def seqOf(p: DecodedPacket): Long =
      if (wrapSeq(key(p)) && p.tcpSeq < 0x7fffffffL) p.tcpSeq + 0xffffffffL
      else p.tcpSeq
    def ackOf(p: DecodedPacket): Long =
      if (wrapAck(key(p)) && p.tcpAck < 0x7fffffffL) p.tcpAck + 0xffffffffL
      else p.tcpAck

    // conversation sort (pcap.js:963-976): same direction by seq;
    // across directions by data-end vs ack, anchored at the first
    // packet's direction. Stable merge sort — the relational comparator
    // is not a total order on pathological captures and TimSort would
    // reject it.
    val clientKey = key(packets.head)
    val arr = packets.toArray
    scala.util.Sorting.stableSort[DecodedPacket](arr,
      (a: DecodedPacket, b: DecodedPacket) =>
        (if (key(a) == key(b)) seqOf(a) - seqOf(b)
        else if (key(a) == clientKey)
          (seqOf(a) + a.payload.length - 1) - ackOf(b)
        else ackOf(a) - (seqOf(b) + b.payload.length - 1)) < 0)

    // run division with per-direction cumulative-seq dedup
    // (pcap.js:981-1026)
    var clientSeq = 0L
    var hostSeq = 0L
    var start = 0L
    var previous = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    arr.iterator.take(CyberChef.MaxPackets).foreach { p =>
      val pkey = key(p)
      val end = seqOf(p) + p.payload.length
      val dup =
        if (pkey == clientKey) { val d = clientSeq >= end; if (!d) clientSeq = end; d }
        else { val d = hostSeq >= end; if (!d) hostSeq = end; d }
      if (!dup) {
        if (out.isEmpty || out.last.key != pkey) {
          previous = seqOf(p); start = seqOf(p)
          out += Chunk(pkey, p.payload, tsMs(p))
        } else if (seqOf(p) - previous > 0xffffL) {
          // larger-than-max-window gap: separator + new run
          out += Chunk("", Array.emptyByteArray, tsMs(p))
          previous = seqOf(p); start = seqOf(p)
          out += Chunk(pkey, p.payload, tsMs(p))
        } else {
          previous = seqOf(p)
          val off = seqOf(p) - start
          val newLen = off + p.payload.length
          if (newLen > MaxRunBytes)
            throw new IllegalStateException(
              s"raw: run exceeds $MaxRunBytes bytes")
          val buf = new Array[Byte](newLen.toInt)
          val old = out.last.data
          System.arraycopy(old, 0, buf, 0, math.min(old.length, buf.length))
          System.arraycopy(p.payload, 0, buf, off.toInt, p.payload.length)
          out(out.length - 1) = out.last.copy(data = buf)
        }
      }
    }
    // the conversation view always starts with the source direction
    // (pcap.js:1028-1030)
    if (out.nonEmpty && out.head.key != srcKey)
      Chunk(srcKey, Array.emptyByteArray, 0L) +: out.toIndexedSeq
    else out.toIndexedSeq
  }

  // ------------------------------------------------------- session fetch

  private[ops] def sessionChunks(sessions: Dataset[SessionRow], sessionId: String,
      keys: String => graft.etl.PcapCrypto.FileKeys,
      store: graft.etl.PcapStore.Store,
      maxPackets: Int = CyberChef.MaxPackets): IndexedSeq[Chunk] = {
    val segs = sessions.filter(_.sessionId == sessionId)
      .collect().sortBy(_.segmentSeq)
    if (segs.isEmpty) return IndexedSeq.empty
    val s0 = segs.head
    val packets =
      CyberChef.readSessionPackets(segs.toIndexedSeq, keys, store, maxPackets)
    chunks(packets, s"${s0.srcIp}:${s0.srcPort}")
  }

  /** The reference's getPacketPNG caps the bitmap at 1000 packets
    * (apiSessions.js:2814), a tenth of the text endpoints' decode cap.
    */
  val PngMaxPackets = 1000

  /** One direction of the alternating chunks: even indices are the
    * source, odd the destination (getRawPackets' `i += 2` walk —
    * any `dataType` but "dst" selects src, like the reference).
    */
  def sideData(ch: IndexedSeq[Chunk], dataType: String): IndexedSeq[Array[Byte]] = {
    val first = if (dataType == "dst") 1 else 0
    (first until ch.length by 2).map(i => ch(i).data)
  }

  /** GET /api/session/raw/:node/:id — the direction's conversation
    * bytes, runs concatenated in conversation order.
    */
  def raw(sessions: Dataset[SessionRow], sessionId: String,
      dataType: String = "src",
      keys: String => graft.etl.PcapCrypto.FileKeys = _ => graft.etl.PcapCrypto.Normal,
      store: graft.etl.PcapStore.Store = graft.etl.PcapStore.Local): Array[Byte] = {
    val side = sideData(sessionChunks(sessions, sessionId, keys, store), dataType)
    if (side.isEmpty) Array.emptyByteArray
    else side.reduce(_ ++ _)
  }

  /** GET /api/session/raw/:node/:id.png — the direction's bytes as an
    * 8-bit grayscale bitmap, 256 bytes per scan line, each run padded
    * to the line boundary plus a full 0xff separator line
    * (getPacketPNG's fill walk; the trailing line is dropped exactly
    * like the reference's `height = size/width - 1`).
    */
  def png(sessions: Dataset[SessionRow], sessionId: String,
      dataType: String = "src",
      keys: String => graft.etl.PcapCrypto.FileKeys = _ => graft.etl.PcapCrypto.Normal,
      store: graft.etl.PcapStore.Store = graft.etl.PcapStore.Local): Array[Byte] =
    renderPng(sideData(
      sessionChunks(sessions, sessionId, keys, store, PngMaxPackets), dataType))

  private[graft] def renderPng(side: Seq[Array[Byte]]): Array[Byte] = {
    val w = PngLineWidth
    val size = side.foldLeft(0L)((acc, d) =>
      acc + d.length + 2L * w - (d.length % w))
    if (size == 0 || size > MaxRunBytes) return emptyPng
    val buf = new Array[Byte](size.toInt)
    var pos = 0
    side.foreach { d =>
      System.arraycopy(d, 0, buf, pos, d.length)
      pos += d.length
      val fillTo = pos + 2 * w - (d.length % w)
      java.util.Arrays.fill(buf, pos, fillTo, 0xff.toByte)
      pos = fillTo
    }
    val h = (size / w - 1).toInt
    encodeGray(buf, w, h)
  }

  /** The 1×1 placeholder answered when there is nothing to draw
    * (internals.js:42 emptyPNG).
    */
  lazy val emptyPng: Array[Byte] =
    encodeGray(Array[Byte](0), 1, 1)

  private def encodeGray(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, java.util.Arrays.copyOf(data, w * h))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
