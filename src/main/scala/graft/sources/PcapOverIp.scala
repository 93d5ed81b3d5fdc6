package graft.sources

import java.io.DataInputStream
import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.Pcap

/** I1: pcap-over-ip live packet source as a Structured Streaming
  * DataSource V2 (`format("graft.sources.PcapOverIpProvider")` or the
  * registered short name `pcap-over-ip`).
  *
  * The reference's reader (capture/reader-pcapoverip.c) connects to a
  * host:port and consumes an endless classic-pcap stream: one 24-byte
  * global header, then 16-byte record headers + packet bytes. This source
  * does the same on the driver — a daemon thread drains the socket into a
  * bounded in-memory buffer; each micro-batch ships the newly arrived
  * records to executors inside its `InputPartition` (the pattern of
  * Spark's own socket source, which is likewise non-replayable: a socket
  * has no offsets to rewind, so fault tolerance is at-most-once before
  * the sessionizer's state store takes over).
  *
  * Downstream is the ordinary path: decode → sessionize
  * (`StreamSessionize.sessions`) with watermarks and mid-save timers.
  */
object PcapOverIp {
  val schema: StructType = StructType(Seq(
    StructField("ts_micros", LongType, nullable = false),
    StructField("incl_len", IntegerType, nullable = false),
    StructField("orig_len", IntegerType, nullable = false),
    StructField("link_type", IntegerType, nullable = false),
    StructField("data", BinaryType, nullable = true)))

  final case class Rec(
      tsMicros: Long, inclLen: Int, origLen: Int, linkType: Int,
      data: Array[Byte])
}

class PcapOverIpProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "pcap-over-ip"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PcapOverIp.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    {
    // DSv2 options are case-insensitive everywhere else (the other
    // entry points receive CaseInsensitiveStringMap) — honor that here
    val opts =
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(properties)
    new PcapOverIpTable(
      opts.getOrDefault("host", "127.0.0.1"),
      Integer.parseInt(opts.getOrDefault("port", "57013")),
      java.lang.Long.parseLong(
        opts.getOrDefault("maxbufferedbytes", (256L << 20).toString)))
    }
}

final class PcapOverIpTable(host: String, port: Int, maxBufferedBytes: Long)
    extends Table with SupportsRead {
  override def name(): String = s"pcap-over-ip://$host:$port"
  override def schema(): StructType = PcapOverIp.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = PcapOverIp.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PcapOverIpStream(host, port, maxBufferedBytes)
    }
}

/** Offset = count of records received so far (monotone, driver-local). */
final case class PcapCountOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class PcapOverIpStream(host: String, port: Int, maxBufferedBytes: Long)
    extends MicroBatchStream {

  // records received but not yet committed; `base` = global offset of
  // buf(0). commit() drops the delivered prefix, so in steady state the
  // driver holds only in-flight micro-batches. The buffer is HARD-bounded
  // at `maxBufferedBytes`: when the capture endpoint outpaces micro-batch
  // commits (or the query stalls) the reader thread blocks instead of
  // appending, which stops draining the socket and pushes backpressure to
  // the sender via TCP flow control — the driver never OOMs.
  private val buf = new ArrayBuffer[PcapOverIp.Rec]()
  private var base = 0L
  private var bufBytes = 0L
  @volatile private var stopped = false
  @volatile private var socket: Socket = null

  // Connect lazily and retry while the query runs — a capture endpoint
  // that is down (or not up yet) must not kill the stream; each
  // reconnect consumes a fresh pcap global header, exactly like the
  // reference reader's per-connection state.
  private val reader = new Thread(() => {
    while (!stopped) {
      try {
        val s = new Socket(host, port)
        socket = s
        val in = new DataInputStream(s.getInputStream)
        val gh = new Array[Byte](24)
        in.readFully(gh)
        Pcap.parseHeader(gh).foreach { h =>
          val order =
            if (h.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          val maxIncl =
            if (h.snapLen > 0 && h.snapLen <= (64 << 20)) h.snapLen else (64 << 20)
          val rh = new Array[Byte](16)
          while (!stopped) {
            in.readFully(rh)
            val bb = ByteBuffer.wrap(rh).order(order)
            val sec = bb.getInt.toLong & 0xffffffffL
            val frac = bb.getInt.toLong & 0xffffffffL
            val incl = bb.getInt
            val orig = bb.getInt
            if (incl < 0 || incl > maxIncl)
              throw new java.io.IOException(s"bad incl_len $incl")
            val data = new Array[Byte](incl)
            in.readFully(data)
            val micros = sec * 1000000L + (if (h.nanos) frac / 1000 else frac)
            buf.synchronized {
              // Backpressure: block (releasing no socket reads) until a
              // commit() frees space or the stream stops.
              while (!stopped && bufBytes >= maxBufferedBytes) buf.wait(1000)
              buf += PcapOverIp.Rec(micros, incl, orig, h.linkType, data)
              bufBytes += incl + 64L
            }
          }
        }
      } catch {
        case _: InterruptedException => stopped = true // stop() interrupt
        case scala.util.control.NonFatal(_) =>
          // refused / peer closed / bad endpoint: retry below — a
          // non-IOException escaping here used to kill the reader
          // thread silently, leaving the stream empty forever
      } finally {
        try { if (socket != null) socket.close() } catch { case _: Exception => }
      }
      if (!stopped)
        try Thread.sleep(250)
        catch { case _: InterruptedException => stopped = true }
    }
  }, s"pcap-over-ip-$host:$port")
  reader.setDaemon(true)
  reader.start()

  override def initialOffset(): Offset = PcapCountOffset(0L)

  /** Offsets come back through here when a query restarts from its
    * checkpoint. A freshly constructed stream counts from 0, so a
    * committed offset N from a previous run would otherwise sit above
    * `base + buf.length` forever and every new record would be silently
    * discarded until the new count surpassed N. Adopt the deserialized
    * offset as the new base instead: records buffered since (re)start are
    * re-addressed N.. and delivered immediately. The socket itself is
    * non-replayable, so the rebased gap is the documented at-most-once
    * window, not data that could have been re-read.
    */
  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    buf.synchronized {
      if (n > base + buf.length) { base = n; buf.notifyAll() }
    }
    PcapCountOffset(n)
  }
  override def latestOffset(): Offset =
    buf.synchronized { PcapCountOffset(base + buf.length) }
  override def commit(end: Offset): Unit = buf.synchronized {
    val upTo = end.asInstanceOf[PcapCountOffset].n
    val drop = math.max(0L, math.min(upTo - base, buf.length.toLong)).toInt
    var i = 0
    while (i < drop) { bufBytes -= buf(i).inclLen + 64L; i += 1 }
    buf.dropInPlace(drop)
    base += drop
    buf.notifyAll()
  }

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[PcapCountOffset].n,
      end.asInstanceOf[PcapCountOffset].n)
    val slice = buf.synchronized {
      val lo = math.max(0L, math.min(s - base, buf.length.toLong)).toInt
      val hi = math.max(0L, math.min(e - base, buf.length.toLong)).toInt
      buf.slice(lo, hi).toArray
    }
    Array(PcapSlicePartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val recs = partition.asInstanceOf[PcapSlicePartition].recs
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < recs.length }
        override def get(): InternalRow = {
          val r = recs(i)
          InternalRow(r.tsMicros, r.inclLen, r.origLen, r.linkType, r.data)
        }
        override def close(): Unit = ()
      }
    }

  override def stop(): Unit = {
    stopped = true
    buf.synchronized { buf.notifyAll() }
    try { if (socket != null) socket.close() } catch { case _: Exception => }
  }
}

final case class PcapSlicePartition(recs: Array[PcapOverIp.Rec])
    extends InputPartition
