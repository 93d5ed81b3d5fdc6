package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Netflow

class NetflowSpec extends AnyFunSuite with SparkSpecBase {

  private def sessionsDf(rows: Seq[(String, Int, Long, Long, String, Int,
      Long, Long, Long, Long, Int, Int, Int, Int, Int, Int, Int)]) = {
    import spark.implicits._
    rows.toDF("srcIp", "srcPort", "srcPackets", "srcBytes",
      "dstIp", "dstPort", "dstPackets", "dstBytes",
      "firstPacket", "lastPacket", "ipProtocol",
      "tcpflagsFin", "tcpflagsSyn", "tcpflagsSynAck",
      "tcpflagsAck", "tcpflagsPsh", "tcpflagsRst")
      .withColumn("tcpflagsUrg", org.apache.spark.sql.functions.lit(0))
  }

  test("v5 record bytes match the reference wire layout exactly") {
    val df = sessionsDf(Seq(
      ("10.0.0.1", 1234, 5L, 500L, "10.0.0.2", 80, 0L, 0L,
        1000L, 3500L, 6, 1, 1, 1, 1, 0, 0)))
    val recs = Netflow.v5Records(df, initialMs = 1000L).collect()
    assert(recs.length == 1)
    val r = recs(0).getAs[Array[Byte]]("record")
    assert(r.length == 48)
    assert(r.slice(0, 4).toSeq == Seq[Byte](10, 0, 0, 1))   // srcaddr
    assert(r.slice(4, 8).toSeq == Seq[Byte](10, 0, 0, 2))   // dstaddr
    assert(r.slice(8, 16).forall(_ == 0))                    // nexthop+snmp
    assert(r.slice(16, 20).toSeq == Seq[Byte](0, 0, 0, 5))  // dPkts
    assert(r.slice(20, 24).toSeq == Seq[Byte](0, 0, 1, -12)) // dOctets 500
    assert(r.slice(24, 28).forall(_ == 0))                   // First = 0ms
    assert(r.slice(28, 32).toSeq == Seq[Byte](0, 0, 0x09, -60)) // Last 2500ms
    assert(r.slice(32, 34).toSeq == Seq[Byte](0x04, -46))   // srcport 1234
    assert(r.slice(34, 36).toSeq == Seq[Byte](0, 80))       // dstport
    assert(r(36) == 0)                                       // pad
    // fin|syn|synack|ack = 0x01|0x02|0x12|0x10 = 0x13
    assert((r(37) & 0xff) == 0x13)
    assert(r(38) == 6)                                       // proto
    assert(r.slice(39, 48).forall(_ == 0))                   // tos..pad
  }

  test("v5 records gate on per-direction packets and IPv4") {
    val df = sessionsDf(Seq(
      ("10.0.0.1", 1, 5L, 500L, "10.0.0.2", 2, 3L, 300L, 0L, 1L, 6,
        0, 0, 0, 0, 0, 0),                       // both directions
      ("192.168.1.9", 3, 2L, 200L, "224.0.0.251", 4, 0L, 0L, 0L, 1L, 17,
        0, 0, 0, 0, 0, 0),                       // fwd only
      ("2001:db8::1", 5, 1L, 10L, "2001:db8::2", 6, 1L, 10L, 0L, 1L, 6,
        0, 0, 0, 0, 0, 0)))                      // v6 -> dropped
    val recs = Netflow.v5Records(df, 0L)
    assert(recs.count() == 3)
    // reverse record swaps addresses and ports
    val rev = recs.collect().map(_.getAs[Array[Byte]]("record"))
      .find(r => r.slice(0, 4).toSeq == Seq[Byte](10, 0, 0, 2)).get
    assert(rev.slice(4, 8).toSeq == Seq[Byte](10, 0, 0, 1))
    assert(rev.slice(32, 34).toSeq == Seq[Byte](0, 2))
    assert(rev.slice(16, 20).toSeq == Seq[Byte](0, 0, 0, 3)) // dstPackets
  }

  test("v5 packets: header layout, record batching, cumulative flow_sequence") {
    val df = sessionsDf((0 until 5).map(i =>
      (s"10.0.0.$i", i, 1L, 10L, "10.0.1.1", 80, 0L, 0L,
        1000L, 61000L, 6, 0, 0, 0, 0, 0, 0)))
    val recs = Netflow.v5Records(df, 1000L).coalesce(1)
    val pkts = Netflow.v5Packets(recs, 1000L, maxRecords = 2)
      .orderBy("flow_seq_start").collect()
    assert(pkts.map(_.getAs[Int]("n_records")).toSeq == Seq(2, 2, 1))
    assert(pkts.map(_.getAs[Long]("flow_seq_start")).toSeq == Seq(0L, 2L, 4L))
    val p0 = pkts(0).getAs[Array[Byte]]("packet")
    assert(p0.length == 24 + 2 * 48)
    assert(p0.slice(0, 2).toSeq == Seq[Byte](0, 5))          // version
    assert(p0.slice(2, 4).toSeq == Seq[Byte](0, 2))          // count
    // sys_uptime = 61000-1000 = 60000 ms = 0x0000EA60
    assert(p0.slice(4, 8).toSeq == Seq[Byte](0, 0, -22, 0x60))
    // unix_secs = 61000/1000 = 61
    assert(p0.slice(8, 12).toSeq == Seq[Byte](0, 0, 0, 61))
    assert(p0.slice(16, 20).forall(_ == 0))                  // flow_seq 0
    val p1 = pkts(1).getAs[Array[Byte]]("packet")
    assert(p1.slice(16, 20).toSeq == Seq[Byte](0, 0, 0, 2))  // flow_seq 2
  }
}
