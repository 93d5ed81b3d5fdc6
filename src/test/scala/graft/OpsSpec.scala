package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder
import graft.expr.Compiler
import graft.model.FieldRegistry
import graft.ops.{Endpoints, Enrich, Hunt, Rules}

class OpsSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val sessions = SessionBuilder.sessionizeRef(spark,
    "/root/reference/tests/pcap/socks-http-example.pcap").cache()

  test("hunt: ascii needle finds example.com sessions, hex needle finds socks4 magic") {
    val hit = Hunt.run(sessions, Hunt.HuntConfig(
      Hunt.AsciiNeedle("example.com", caseSensitive = false)))
    assert(hit.filter(col("huntTag").isNotNull).count() == 3)
    val miss = Hunt.run(sessions, Hunt.HuntConfig(
      Hunt.AsciiNeedle("definitely-not-there", caseSensitive = false)))
    assert(miss.filter(col("huntTag").isNotNull).count() == 0)
    // socks4 CONNECT magic 0x0401 at stream start, src direction only
    val hex = Hunt.run(sessions, Hunt.HuntConfig(
      Hunt.HexNeedle("04010050"), src = true, dst = false))
    assert(hex.filter(col("huntTag").isNotNull).count() == 2)
    // regex
    val re = Hunt.run(sessions, Hunt.HuntConfig(
      Hunt.RegexNeedle("GET /[a-z]* HTTP")))
    assert(re.filter(col("huntTag").isNotNull).count() >= 1)
  }

  test("rules: tag-on-match, set-field, drop") {
    val df = sessions.toDF()
    val out = Rules.apply(df, Seq(
      Rules.Rule("tag-socks", array_contains(col("protocol"), "socks"),
        Seq(Rules.AddTag("proxy"))),
      Rules.Rule("mark-big", col("totBytes") > 2800,
        Seq(Rules.SetField("node", lit("bignode")))),
      Rules.Rule("drop-none", col("totPackets") > 1000,
        Seq(Rules.DropSession))))
    assert(out.filter(array_contains(col("tags"), "proxy")).count() == 3)
    assert(out.filter(col("node") === "bignode").count() ==
      df.filter(col("totBytes") > 2800).count())
    assert(out.count() == 3) // nothing dropped
    val dropped = Rules.apply(df, Seq(
      Rules.Rule("drop-socks", array_contains(col("protocol"), "socks"),
        Seq(Rules.DropSession))))
    assert(dropped.count() == 0)
  }

  test("enrich: cidr join sets country, wise lookup tags by ip") {
    import spark.implicits._
    val geo = Enrich.cidrJoin(sessions.toDF(), col("srcIp"),
      Seq("10.180.0.0/16" -> "US", "0.0.0.0/0" -> "XX"), "srcCountry")
    assert(geo.filter(col("srcCountry") === "US").count() == 3)
    val intel = Seq(("10.180.156.249", "threat", "proxy-node"))
      .toDF("key", "field", "value")
    val wise = Enrich.wiseLookup(sessions.toDF(), col("dstIp"), intel)
    assert(wise.filter(array_contains(col("intel"), "threat=proxy-node")).count() == 3)
  }

  test("enrich: packet dedup drops same-hash rows in window") {
    import spark.implicits._
    val df = Seq(
      (1L, "h1", "2024-01-01 00:00:00"),
      (2L, "h1", "2024-01-01 00:00:01"), // dup of h1 in same window
      (3L, "h1", "2024-01-01 01:00:00"), // h1 again, next window
      (4L, "h2", "2024-01-01 00:00:00")
    ).toDF("id", "hash", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = Enrich.dedupPackets(df, Seq("hash"), col("ts"), 60)
    assert(out.count() == 3)
  }

  test("es doc shaping produces parseable nested json") {
    val docs = Enrich.toEsDocs(sessions.toDF()).collect()
    assert(docs.length == 3)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    docs.foreach { r =>
      val node = mapper.readTree(r.getString(0))
      assert(node.get("source").has("ip"))
      assert(node.get("network").has("community_id"))
    }
  }

  test("compiler: transforms (dash2Colon on mac, ipProtocolLookup)") {
    val c = new Compiler(FieldRegistry.sessions, FieldRegistry.sessionCol,
      SparkEntry.now)
    // dash-separated mac folded to colon form + lowercase
    assert(sessions.toDF().filter(
      c.compile("mac.src == 00-1F-5B-FF-51-CB")).count() == 3)
    assert(sessions.toDF().filter(c.compile("ip.protocol == tcp")).count() == 3)
    assert(sessions.toDF().filter(c.compile("ip.protocol == udp")).count() == 0)
  }

  test("compiler: view recursion guard") {
    val c = new Compiler(FieldRegistry.events, now = SparkEntry.now,
      views = Map("a" -> "view == b", "b" -> "view == a"))
    assertThrows[IllegalArgumentException](c.compile("view == a"))
  }

  test("spiview over multiple fields ranks per field") {
    val ev = Tables.load(spark, sf, "events")
    val out = Endpoints.spiview(ev, Seq("event_type", "user_id"), 3).collect()
    assert(out.map(_.getString(0)).distinct.sorted.toSeq == Seq("event_type", "user_id"))
    assert(out.count(_.getString(0) == "event_type") == 3)
  }
}
