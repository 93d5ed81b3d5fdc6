package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Netflow v5 export of saved sessions — the Spark form of the
  * reference's netflow plugin (capture/plugins/netflow.c:60-200): each
  * saved session emits one 48-byte v5 record per direction that saw
  * packets (IPv4 only, like the plugin's V4MAPPED gate), and records are
  * assembled into export packets of `header + up to N records`.
  *
  * Packet assembly is per-partition (`mapPartitions`), mirroring the
  * reference's per-thread buffers exactly: flow_sequence is cumulative
  * within a partition the way totalFlows[thread] is per thread, and no
  * global ordering is imposed — at 100 TB the export is embarrassingly
  * parallel, one flow-sequence domain per task, which is precisely the
  * semantics a multi-threaded capture process exports today.
  */
object Netflow {

  /** TCP flags byte OR'd from the session's per-flag counters (the
    * reference carries session->tcp_flags; we reconstruct the same OR).
    */
  private def tcpFlagsByte: org.apache.spark.sql.Column = {
    def bit(c: String, v: Int) = when(col(c) > 0, lit(v)).otherwise(lit(0))
    bit("tcpflagsFin", 0x01)
      .bitwiseOR(bit("tcpflagsSyn", 0x02))
      .bitwiseOR(bit("tcpflagsRst", 0x04))
      .bitwiseOR(bit("tcpflagsPsh", 0x08))
      .bitwiseOR(bit("tcpflagsAck", 0x10))
      .bitwiseOR(bit("tcpflagsSynAck", 0x12))
      .bitwiseOR(bit("tcpflagsUrg", 0x20))
      .cast("int")
  }

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def ipv4Bytes(ip: String): Array[Byte] = {
    if (ip == null || ip.indexOf(':') >= 0) return null
    val parts = ip.split('.')
    if (parts.length != 4) return null
    try parts.map(p => (p.toInt & 0xff).toByte)
    catch { case _: NumberFormatException => null }
  }

  /** One v5 record (48 bytes, netflow.c:132-166 field order). */
  private def record(
      aIp: String, bIp: String, pkts: Long, bytes: Long,
      firstMs: Long, lastMs: Long, aPort: Int, bPort: Int,
      flags: Int, proto: Int, initialMs: Long): Array[Byte] = {
    val src = ipv4Bytes(aIp); val dst = ipv4Bytes(bIp)
    if (src == null || dst == null) return null
    val out = new java.io.ByteArrayOutputStream(48)
    out.write(src); out.write(dst)
    out.write(be32(0)) // nexthop
    out.write(be16(0)); out.write(be16(0)) // snmp input/output
    out.write(be32(pkts)); out.write(be32(bytes))
    out.write(be32(firstMs - initialMs)); out.write(be32(lastMs - initialMs))
    out.write(be16(aPort & 0xffff)); out.write(be16(bPort & 0xffff))
    out.write(0) // pad
    out.write(flags & 0xff); out.write(proto & 0xff); out.write(0) // tos
    out.write(be16(0)); out.write(be16(0)) // src/dst AS
    out.write(0); out.write(0) // src/dst mask
    out.write(be16(0)) // pad
    out.toByteArray
  }

  /** Per-direction v5 records: (record binary, lastPacket ms). Sessions
    * with no packets in a direction, or non-IPv4 addresses, emit nothing
    * for that direction — the plugin's exact gates.
    */
  def v5Records(sessions: DataFrame, initialMs: Long): DataFrame = {
    val rec = udf { (aIp: String, bIp: String, pkts: Long, bytes: Long,
        firstMs: Long, lastMs: Long, aPort: Int, bPort: Int,
        flags: Int, proto: Int) =>
      record(aIp, bIp, pkts, bytes, firstMs, lastMs, aPort, bPort,
        flags, proto, initialMs)
    }
    val flags = tcpFlagsByte
    val fwd = sessions.filter(col("srcPackets") > 0)
      .select(rec(col("srcIp"), col("dstIp"), col("srcPackets"),
        col("srcBytes"), col("firstPacket"), col("lastPacket"),
        col("srcPort"), col("dstPort"), flags, col("ipProtocol"))
        .as("record"), col("lastPacket"))
    val rev = sessions.filter(col("dstPackets") > 0)
      .select(rec(col("dstIp"), col("srcIp"), col("dstPackets"),
        col("dstBytes"), col("firstPacket"), col("lastPacket"),
        col("dstPort"), col("srcPort"), flags, col("ipProtocol"))
        .as("record"), col("lastPacket"))
    fwd.unionAll(rev).filter(col("record").isNotNull)
  }

  /** Assemble records into v5 export packets per partition: 24-byte
    * header (version, count, sys_uptime, unix secs/nsecs, cumulative
    * flow_sequence, zero engine/sampling — netflow.c:69-87) + records.
    * The reference flushes past 20 buffered records; `maxRecords`
    * mirrors that bound.
    */
  def v5Packets(records: DataFrame, initialMs: Long,
      maxRecords: Int = 21): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    val ds: Dataset[(Array[Byte], Long)] =
      records.select(col("record"), col("lastPacket")).as[(Array[Byte], Long)]
    ds.mapPartitions { it =>
      var flowSeq = 0L
      it.grouped(maxRecords).map { group =>
        val lastMs = if (group.isEmpty) initialMs else group.map(_._2).max
        val out = new java.io.ByteArrayOutputStream(24 + group.size * 48)
        out.write(be16(5)); out.write(be16(group.size))
        out.write(be32(lastMs - initialMs)) // sys_uptime ms
        out.write(be32(lastMs / 1000)) // unix_secs
        out.write(be32((lastMs % 1000) * 1000000L)) // unix_nsecs
        out.write(be32(flowSeq)) // flow_sequence before this packet
        out.write(0); out.write(0) // engine type/id
        out.write(be16(0)) // sampling
        group.foreach(r => out.write(r._1))
        flowSeq += group.size
        (out.toByteArray, group.size, flowSeq - group.size)
      }
    }.toDF("packet", "n_records", "flow_seq_start")
  }
}
