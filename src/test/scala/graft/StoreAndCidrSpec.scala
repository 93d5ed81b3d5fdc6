package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{SessionBuilder, SessionStore}
import graft.functions.IpFunctions

class StoreAndCidrSpec extends AnyFunSuite with SparkSpecBase {

  test("day-partitioned session store prunes partitions on time range") {
    val sessions = SessionBuilder.sessionize(spark,
      "/root/reference/tests/pcap/socks-http-example.pcap")
    val path = java.nio.file.Files.createTempDirectory("sessions").toString
    SessionStore.write(sessions, path)
    // the fixture's day is 2013-12-02
    val hit = SessionStore.readRange(spark, path,
      1386004000000L, 1386005000000L)
    assert(hit.count() == 3)
    val miss = SessionStore.readRange(spark, path,
      1486004000000L, 1486005000000L)
    assert(miss.count() == 0)
    // partition pruning visible in the physical plan
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["))
    assert("PartitionFilters: \\[\\]".r.findFirstIn(plan).isEmpty,
      "expected non-empty PartitionFilters")
  }

  test("codegen ip_in_cidr matches UDF semantics and stays in codegen") {
    val sessions = SessionBuilder.sessionize(spark,
      "/root/reference/tests/pcap/socks-http-example.pcap").toDF()
    val filtered = sessions.filter(IpFunctions.ipInCidr(col("srcIp"), "10.180.0.0/16"))
    assert(filtered.count() == 3)
    assert(sessions.filter(IpFunctions.ipInCidr(col("srcIp"), "10.181.0.0/16")).count() == 0)
    // shorthand + exact forms
    assert(sessions.filter(IpFunctions.ipInCidr(col("srcIp"), "10.180")).count() == 3)
    assert(sessions.filter(IpFunctions.ipInCidr(col("srcIp"), "10.180.156.185")).count() == 3)
    // the plan uses the native expression, not a ScalaUDF
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("ip_in_cidr"))
    assert(!plan.toLowerCase.contains("scalaudf"))
    // v6
    import spark.implicits._
    val v6 = Seq("2001:db8::1", "2001:db9::1").toDF("ip")
    assert(v6.filter(IpFunctions.ipInCidr(col("ip"), "2001:db8::/32")).count() == 1)
  }
}
