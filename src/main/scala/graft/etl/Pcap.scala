package graft.etl

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Classic-pcap file parsing → packet records.
  *
  * File layout (reference reader: capture/reader-libpcap-file.c): 24-byte
  * global header (magic 0xa1b2c3d4, swapped and nanosecond 0xa1b23c4d
  * variants), then per-packet 16-byte record headers (ts_sec, ts_frac,
  * incl_len, orig_len). `fileOffset` is the record-header offset — the
  * same value the reference stores in `packetPos` (capture/packet.c:
  * 265-301); `recLen` (16 + incl_len) matches its `packetLen`.
  *
  * Scale note: the driver fixtures are single small files, read via
  * Spark's binaryFile source (one task per file — pcap files are not
  * splittable without an index). At 100 TB the same decode runs per file
  * over many thousands of capture files, so parallelism = file count;
  * the per-file iterator never materializes the whole packet list.
  */
object Pcap {

  final case class RawPacket(
      file: String,
      index: Int,
      tsMicros: Long,
      inclLen: Int,
      origLen: Int,
      fileOffset: Long,
      linkType: Int,
      data: Array[Byte])

  final case class PcapHeader(
      bigEndian: Boolean, nanos: Boolean, linkType: Int, snapLen: Int)

  def parseHeader(bytes: Array[Byte]): Option[PcapHeader] = {
    if (bytes.length < 24) return None
    val magicLE = ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    val (big, nanos) = magicLE match {
      case 0xa1b2c3d4 => (false, false)
      case 0xa1b23c4d => (false, true)
      case 0xd4c3b2a1 => (true, false)
      case 0x4d3cb2a1 => (true, true)
      case _          => return None
    }
    val order = if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val bb = ByteBuffer.wrap(bytes, 0, 24).order(order)
    bb.position(16)
    val snapLen = bb.getInt
    val linkType = bb.getInt
    Some(PcapHeader(big, nanos, linkType, snapLen))
  }

  /** Iterate packet records of one pcap file (byte array form). */
  def parseFile(bytes: Array[Byte], file: String): Iterator[RawPacket] = {
    parseHeader(bytes) match {
      case None => Iterator.empty
      case Some(h) =>
        val order = if (h.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
        // A corrupt record header (negative or absurd incl_len) stops
        // iteration for this file instead of throwing — the reference
        // reader degrades per file the same way (capture/reader-libpcap-
        // file.c record-length checks). Bound: snapLen when sane, else 64 MiB.
        val maxIncl =
          if (h.snapLen > 0 && h.snapLen <= (64 << 20)) h.snapLen else (64 << 20)
        new Iterator[RawPacket] {
          private var off = 24L
          private var idx = 0
          private var dead = false
          def hasNext: Boolean =
            !dead && off + 16 <= bytes.length && {
              val incl = ByteBuffer.wrap(bytes, off.toInt + 8, 4).order(order).getInt
              if (incl < 0 || incl > maxIncl) { dead = true; false } else true
            }
          def next(): RawPacket = {
            val bb = ByteBuffer.wrap(bytes, off.toInt, 16).order(order)
            val sec = bb.getInt.toLong & 0xffffffffL
            val frac = bb.getInt.toLong & 0xffffffffL
            val inclLen = bb.getInt
            val origLen = bb.getInt
            val micros = sec * 1000000L + (if (h.nanos) frac / 1000 else frac)
            val start = off + 16
            val end = math.min(start + inclLen, bytes.length.toLong)
            val data = java.util.Arrays.copyOfRange(bytes, start.toInt, end.toInt)
            val p = RawPacket(file, idx, micros, inclLen, origLen, off,
              h.linkType, data)
            off = start + inclLen
            idx += 1
            p
          }
        }
    }
  }

  /** Read a directory (or single file) of pcaps as a packet Dataset. */
  def readPackets(spark: SparkSession, path: String): Dataset[RawPacket] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pcap")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseFile(bytes, p) }
  }
}
