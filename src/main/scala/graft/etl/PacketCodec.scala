package graft.etl

import java.nio.charset.StandardCharsets

import graft.etl.Decode.DecodedPacket

/** Compact binary codec for [[DecodedPacket]] across the sessionize
  * shuffle.
  *
  * The batch pipeline shuffles every captured packet once to its session
  * group (the Spark analogue of the reference's `hash(sessionId) %
  * packetThreads` routing, capture/packet.c:1316). Shuffling the packet
  * as a 25-field case class pays Catalyst's product-encoder conversion —
  * per-field UnsafeRow writes, String→UTF8String copies, Seq→ArrayData
  * wrapping — per packet on the map side and the mirror-image reads on
  * the reduce side; at capture rates (millions of packets/s/node) that
  * conversion dominates the wall clock. Packing to one length-prefixed
  * byte blob makes the shuffle row (key, binary) — two columns, no
  * nested conversion — and measures ~2× on the ingest bench.
  *
  * The layout is internal to one job (map side packs, reduce side
  * unpacks, nothing is persisted), so it carries no versioning.
  */
object PacketCodec {

  private val Empty = Array.emptyByteArray

  private def utf8(s: String): Array[Byte] =
    if (s == null || s.isEmpty) Empty else s.getBytes(StandardCharsets.UTF_8)

  /** Pack one decoded packet. Field order must match [[unpack]].
    *
    * The three repeated fields (tunnels, greIps, vlanIds) carry a one-byte
    * count, so they are truncated to 255 entries: Decode's VLAN/GRE unwrap
    * loops are input-bounded, and a crafted frame with >255 stacked tags
    * would otherwise wrap the count byte while every entry was still
    * written, misaligning the stream on unpack. Real traffic never nests
    * past single digits; keeping the first 255 loses nothing analytic.
    */
  def pack(p: DecodedPacket): Array[Byte] = {
    val file = utf8(p.file)
    val macSrc = utf8(p.macSrc)
    val macDst = utf8(p.macDst)
    val srcIp = utf8(p.srcIp)
    val dstIp = utf8(p.dstIp)
    val keyOverride = utf8(p.keyOverride)
    val isis = utf8(p.isisMsgType)
    val tunnels = p.tunnels.take(255).map(utf8)
    val greIps = p.greIps.take(255).map(utf8)
    val vlanIds = p.vlanIds.take(255)
    var size = 4 + 8 + 8 + 8 + 4 + 4 + 2 + 4 + 4 + 1 + 2 + 4 + 4 + 2 + 2 + 4 +
      2 + file.length + 1 + macSrc.length + 1 + macDst.length +
      1 + srcIp.length + 1 + dstIp.length +
      1 + keyOverride.length + 1 + isis.length +
      1 + tunnels.map(_.length + 1).sum +
      1 + greIps.map(_.length + 1).sum +
      1 + 2 * vlanIds.length +
      4 + p.payload.length
    val out = new Array[Byte](size)
    var o = 0
    @inline def i16(v: Int): Unit = {
      out(o) = (v >> 8).toByte; out(o + 1) = v.toByte; o += 2
    }
    @inline def i32(v: Int): Unit = {
      out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte; o += 4
    }
    @inline def i64(v: Long): Unit = { i32((v >> 32).toInt); i32(v.toInt) }
    @inline def bytes8(b: Array[Byte]): Unit = { // ≤255-byte fields
      require(b.length <= 255, s"codec field too long: ${b.length}")
      out(o) = b.length.toByte; o += 1
      System.arraycopy(b, 0, out, o, b.length); o += b.length
    }
    i32(p.index); i64(p.tsMicros); i64(p.prevTsMicros); i64(p.fileOffset)
    i32(p.recLen); i32(p.wireLen)
    i16(p.ipProtocol)
    i32(p.srcPort); i32(p.dstPort)
    out(o) = p.tcpFlags.toByte; o += 1
    i16(p.tcpWindow)
    i32(p.tcpSeq.toInt); i32(p.tcpAck.toInt)
    i16(p.icmpType); i16(p.icmpCode)
    i32(p.l4Offset)
    i16(file.length)
    System.arraycopy(file, 0, out, o, file.length); o += file.length
    bytes8(macSrc); bytes8(macDst); bytes8(srcIp); bytes8(dstIp)
    bytes8(keyOverride); bytes8(isis)
    out(o) = tunnels.length.toByte; o += 1
    tunnels.foreach(bytes8)
    out(o) = greIps.length.toByte; o += 1
    greIps.foreach(bytes8)
    out(o) = vlanIds.length.toByte; o += 1
    vlanIds.foreach(i16)
    i32(p.payload.length)
    System.arraycopy(p.payload, 0, out, o, p.payload.length)
    o += p.payload.length
    require(o == size, s"codec size mismatch: wrote $o of $size")
    out
  }

  def unpack(b: Array[Byte]): DecodedPacket = {
    var o = 0
    @inline def i16(): Int = {
      val v = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff); o += 2; v
    }
    @inline def i32(): Int = {
      val v = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      o += 4; v
    }
    @inline def i64(): Long = (i32().toLong << 32) | (i32().toLong & 0xffffffffL)
    @inline def str(len: Int): String =
      if (len == 0) "" else {
        val s = new String(b, o, len, StandardCharsets.UTF_8); o += len; s
      }
    @inline def str8(): String = { val n = b(o) & 0xff; o += 1; str(n) }
    val index = i32(); val ts = i64(); val prevTs = i64(); val fileOff = i64()
    val recLen = i32(); val wireLen = i32()
    val ipProtocol = i16()
    val srcPort = i32(); val dstPort = i32()
    val tcpFlags = b(o) & 0xff; o += 1
    val tcpWindow = i16()
    val tcpSeq = i32().toLong & 0xffffffffL
    val tcpAck = i32().toLong & 0xffffffffL
    val icmpType = i16().toShort.toInt // -1 sentinel round-trips
    val icmpCode = i16().toShort.toInt
    val l4Offset = i32()
    val file = str(i16())
    val macSrc = str8(); val macDst = str8()
    val srcIp = str8(); val dstIp = str8()
    val keyOverride0 = str8(); val isis0 = str8()
    val nTunnels = b(o) & 0xff; o += 1
    val tunnels = if (nTunnels == 0) Nil else Seq.fill(nTunnels)(str8())
    val nGre = b(o) & 0xff; o += 1
    val greIps = if (nGre == 0) Nil else Seq.fill(nGre)(str8())
    val nVlan = b(o) & 0xff; o += 1
    val vlanIds = if (nVlan == 0) Nil else Seq.fill(nVlan)(i16())
    val payLen = i32()
    val payload =
      if (payLen == 0) Empty
      else java.util.Arrays.copyOfRange(b, o, o + payLen)
    DecodedPacket(file, index, ts, fileOff, recLen, wireLen, macSrc, macDst,
      ipProtocol, srcIp, dstIp, srcPort, dstPort, tcpFlags, tcpWindow,
      tcpSeq, tcpAck, payload, tunnels, greIps,
      if (isis0.isEmpty) null else isis0, vlanIds,
      if (keyOverride0.isEmpty) null else keyOverride0,
      icmpType, icmpCode, prevTs, l4Offset)
  }
}
