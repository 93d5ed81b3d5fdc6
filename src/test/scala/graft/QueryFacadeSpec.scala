package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder
import graft.model.FieldRegistry
import graft.ops.{Cnt, Endpoints, Skew}
import graft.query.SessionQueryBuilder

class QueryFacadeSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val sessions = SessionBuilder.sessionizeRef(spark,
    "/root/reference/tests/pcap/socks-http-example.pcap").toDF().cache()

  test("builder: time range + expression + forced compose") {
    val q = SessionQueryBuilder(sessions, FieldRegistry.sessions,
      FieldRegistry.sessionCol)
      .timeRange(1386004309000L, 1386004313000L) // first two sessions
      .expression("protocols == socks")
      .forced("node == test")
    assert(q.count() == 2)
    val t = q.table(Seq("srcIp", "srcPort"), Seq(("srcPort", true)), 10)
    assert(t.collect().map(_.getInt(1)).toSeq == Seq(53533, 53534))
    assert(q.unique("dstIp").collect().map(_.getString(0)).toSeq ==
      Seq("10.180.156.249"))
    // forced expression that excludes everything
    val q2 = q.forced("node == nosuchnode")
    assert(q2.count() == 0)
  }

  test("salted count equals plain groupBy count") {
    val ev = Tables.load(spark, sf, "events")
    val plain = ev.groupBy(col("user_id").as("key")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(ev, col("user_id"), salts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("cnt companions and cardinality") {
    val withCnt = Cnt.withCntColumns(sessions, Seq("protocol", "srcMac"))
    val r = withCnt.select("protocolCnt", "srcMacCnt").head
    assert(r.getInt(0) == 3 && r.getInt(1) == 1)
    val ev = Tables.load(spark, sf, "events")
    val exact = Cnt.cardinality(ev, Seq("user_id")).head.getLong(0)
    val approx = Cnt.approxCardinality(ev, Seq("user_id")).head.getLong(0)
    assert(exact == 15)
    assert(math.abs(approx - exact) <= 2) // hll within tolerance
  }
}
