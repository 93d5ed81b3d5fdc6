package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Netflow

/** Round-trip fuzz for the NetFlow v5 export: random session rows run
  * through v5Records + v5Packets, and the TEST decodes the export
  * packets with its own reader of the public v5 wire format (24-byte
  * header + 48-byte records, all big-endian) — field placement, the
  * per-direction emission gates, record batching and the cumulative
  * per-partition flow_sequence all round-trip against the generator's
  * model.
  */
class NetflowRoundTripFuzzSpec extends AnyFunSuite with SparkSpecBase {

  private var seed = 0x0f10baaL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct

  // independent v5 reader (public layout)
  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def ip(b: Array[Byte], i: Int): String =
    (0 until 4).map(k => b(i + k) & 0xff).mkString(".")

  private final case class Flow(src: String, dst: String, pkts: Long,
      bytes: Long, first: Long, last: Long, sport: Int, dport: Int,
      flags: Int, proto: Int)

  test("random sessions round-trip the v5 export wire format") {
    val initialMs = 1700000000000L
    for (trial <- 0 until 25) {
      val n = 1 + nextInt(60)
      val rows = (0 until n).map { i =>
        val v6 = chance(10)
        val srcIp = if (v6) "2001:db8::1"
          else s"10.${nextInt(256)}.${nextInt(256)}.${1 + nextInt(254)}"
        val dstIp = s"192.168.${nextInt(256)}.${1 + nextInt(254)}"
        val srcPk = if (chance(85)) 1L + nextInt(100000) else 0L
        val dstPk = if (chance(85)) 1L + nextInt(100000) else 0L
        val first = initialMs + nextInt(1000000)
        (srcIp, dstIp, srcPk, dstPk,
          1000L + nextInt(1 << 30), 2000L + nextInt(1 << 30),
          first, first + nextInt(600000),
          nextInt(65536), nextInt(65536), // full port domain incl. >32767
          if (chance(70)) 6 else 17,
          nextInt(2), nextInt(2), nextInt(2), nextInt(2), nextInt(2),
          nextInt(2), nextInt(2))
      }
      val df = spark.createDataFrame(rows).toDF(
        "srcIp", "dstIp", "srcPackets", "dstPackets", "srcBytes",
        "dstBytes", "firstPacket", "lastPacket", "srcPort", "dstPort",
        "ipProtocol", "tcpflagsFin", "tcpflagsSyn", "tcpflagsRst",
        "tcpflagsPsh", "tcpflagsAck", "tcpflagsSynAck", "tcpflagsUrg")
        .repartition(1 + nextInt(4))
      // generator's model of the plugin semantics: one record per
      // direction with packets, IPv4 endpoints only; flags byte OR'd
      // from the counters (SynAck contributes 0x12)
      def flagsOf(r: (String, String, Long, Long, Long, Long, Long, Long,
          Int, Int, Int, Int, Int, Int, Int, Int, Int, Int)): Int = {
        var f = 0
        if (r._12 > 0) f |= 0x01; if (r._13 > 0) f |= 0x02
        if (r._14 > 0) f |= 0x04; if (r._15 > 0) f |= 0x08
        if (r._16 > 0) f |= 0x10; if (r._17 > 0) f |= 0x12
        if (r._18 > 0) f |= 0x20
        f
      }
      val expected = rows.flatMap { r =>
        val v4 = !r._1.contains(":") && !r._2.contains(":")
        val fwd = if (r._3 > 0 && v4)
          Seq(Flow(r._1, r._2, r._3, r._5, r._7 - initialMs,
            r._8 - initialMs, r._9, r._10, flagsOf(r), r._11))
        else Nil
        val rev = if (r._4 > 0 && v4)
          Seq(Flow(r._2, r._1, r._4, r._6, r._7 - initialMs,
            r._8 - initialMs, r._10, r._9, flagsOf(r), r._11))
        else Nil
        fwd ++ rev
      }
      val packets = Netflow.v5Packets(
        Netflow.v5Records(df, initialMs), initialMs)
        .select("packet", "n_records", "flow_seq_start").collect()
      val decoded = Seq.newBuilder[Flow]
      packets.foreach { p =>
        val b = p.getAs[Array[Byte]](0)
        assert(u16(b, 0) == 5, "version")
        val cnt = u16(b, 2)
        assert(cnt == p.getInt(1))
        assert(b.length == 24 + cnt * 48, "packet length")
        for (k <- 0 until cnt) {
          val o = 24 + k * 48
          decoded += Flow(ip(b, o), ip(b, o + 4), u32(b, o + 16),
            u32(b, o + 20), u32(b, o + 24), u32(b, o + 28),
            u16(b, o + 32), u16(b, o + 34), b(o + 37) & 0xff,
            b(o + 38) & 0xff)
        }
      }
      assert(decoded.result().sortBy(_.toString) ==
        expected.sortBy(_.toString),
        s"trial $trial: decoded flows diverge from the model")
      // cumulative flow_sequence within each partition: the per-packet
      // starts must be consistent with the record counts
      val seqs = packets.map(p => (p.getLong(2), p.getInt(1)))
      assert(seqs.map(_._2).sum == expected.size)
    }
  }
}
