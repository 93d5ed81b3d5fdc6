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

  test("host meta-field fans out across protocol hostname columns") {
    import graft.expr.Compiler
    // three pcaps whose hostnames land in different columns:
    // http.host (socks), quic host, dns qname
    val multi = Seq("socks-http-example", "quic34", "dns-mx")
      .map(n => SessionBuilder.sessionizeRef(spark,
        s"/root/reference/tests/pcap/$n.pcap").toDF())
      .reduce(_ unionByName _)
      .cache()
    val c = new Compiler(FieldRegistry.sessions, FieldRegistry.sessionCol,
      SparkEntry.now)
    def n(e: String) = multi.filter(c.compile(e)).count()
    assert(n("host == www.example.com") == 3) // http.host via SOCKS
    assert(n("host == ssl.gstatic.com") == 1) // quic host
    assert(n("host == mx.com") >= 1)          // dns qname
    assert(n("host == *.gstatic.com") == 1)   // wildcard through fan-out
    // must_not semantics: sessions with NO hostname at all also match !=
    val total = multi.count()
    assert(n("host != www.example.com") == total - 3)
    multi.unpersist()
  }

  test("fileand rewrites filename to (node, fileId) terms") {
    import graft.expr.Compiler
    val path = sessions.select(explode(col("fileId"))).head.getString(0)
    val filesDim = Seq(
      graft.model.FileEntry("socks-http-example.pcap", "test", path),
      graft.model.FileEntry("absent.pcap", "test", "/no/such.pcap"),
      graft.model.FileEntry("socks-http-example.pcap", "node2", "/other/copy.pcap"))
    val c = new Compiler(FieldRegistry.sessions, FieldRegistry.sessionCol,
      SparkEntry.now, files = filesDim)
    // exact name resolves to OR over both (node, fileId) rows; only the
    // node=test one matches these sessions
    assert(sessions.filter(c.compile("file == socks-http-example.pcap")).count() == 3)
    // wildcard filename matching, as fileNameToFiles' wildcard query
    assert(sessions.filter(c.compile("file == socks*.pcap")).count() == 3)
    assert(sessions.filter(c.compile("file == absent.pcap")).count() == 0)
    assert(sessions.filter(c.compile("file != socks-http-example.pcap")).count() == 0)
    // unknown filename is an error, like the reference's "File not found"
    intercept[IllegalArgumentException] {
      c.compile("file == never-captured.pcap")
    }
  }

  test("unique pair mode emits ip:port keys") {
    val pairs = Endpoints.uniquePairs(sessions, col("dstIp"), col("dstPort"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pairs.map(_._2).sum == 3)
    assert(pairs.forall(_._1.matches("""10\.180\.156\.249:\d+""")))
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
