package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Compiler
import graft.model.FieldRegistry

/** Expression compiler vs hand-written Column predicates on real data. */
class CompilerSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val events = Tables.load(spark, sf, "events").cache()
  private def c = new Compiler(FieldRegistry.events, now = SparkEntry.now)
  private def n(expr: String): Long = events.filter(c.compile(expr)).count()

  test("equality and boolean ops") {
    val direct = events.filter(col("event_type") === "purchase").count()
    assert(n("type == purchase") == direct)
    assert(n("type == purchase || type == signup") ==
      events.filter(col("event_type").isin("purchase", "signup")).count())
    assert(n("type != purchase") == events.count() - direct)
  }

  test("wildcard matches like") {
    assert(n("type == p*") ==
      events.filter(col("event_type").startsWith("p")).count())
    assert(n("type == *or*") ==
      events.filter(col("event_type").contains("or")).count())
  }

  test("numeric ranges") {
    assert(n("value > 100") == events.filter(col("value") > 100).count())
    assert(n("user == 1-5") ==
      events.filter(col("user_id").between(1, 5)).count())
  }

  test("regex escapes reach the engine; lo-kinds fold both sides") {
    // \\d survives lexing: matches digits, not the literal 'd'
    assert(n("type == /p.rchas\\w/") ==
      events.filter(col("event_type").rlike("^(?:p.rchas\\w)$")).count())
    assert(n("type == /error|signup/") ==
      events.filter(col("event_type").isin("error", "signup")).count())
    // lotermfield regex: pattern and column both lowercased (jison
    // formatValue folds the whole operand, regexes included)
    assert(n("type.lower == /CLI.K/") ==
      events.filter(lower(col("event_type")).rlike("^(?:cli.k)$")).count())
  }

  test("range shorthand inside a list") {
    assert(n("user == [1-5, 9]") ==
      events.filter(col("user_id").between(1, 5) ||
        col("user_id") === 9).count())
  }

  test("unparseable date raises IllegalArgumentException") {
    intercept[IllegalArgumentException](c.compile("ts >= 2019-13-99x"))
  }

  test("relative date against injected now") {
    // now = 2024-02-01; events span all of January → -7d keeps last week
    val cutoff = java.sql.Timestamp.from(SparkEntry.now.minusSeconds(7 * 86400))
    assert(n("ts >= -7d") == events.filter(col("ts") >= lit(cutoff)).count())
  }

  test("negation matches null semantics (must_not)") {
    // all events have non-null type; must_not(eq) == count - eq
    assert(n("!(type == error)") ==
      events.count() - n("type == error"))
  }

  test("queries registry and oracle keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
  test("FLAG_CNT companions: <field>.cnt compares array size") {
    import spark.implicits._
    import graft.model.{FieldDef, FieldKind}
    val df = Seq(
      (Seq("a.com", "b.com"), 1),
      (Seq("c.com"), 2),
      (Seq.empty[String], 3)).toDF("httpHost", "id")
    val reg = FieldRegistry(Seq(
      FieldDef("http.host", "httpHost", FieldKind.TermK, multiValued = true),
      FieldDef("id", "id", FieldKind.IntegerK)))
    val cc = new Compiler(reg, now = SparkEntry.now)
    assert(df.filter(cc.compile("http.host.cnt == 2")).count() == 1)
    assert(df.filter(cc.compile("http.host.cnt >= 1")).count() == 2)
    assert(df.filter(cc.compile("http.host.cnt == 0")).count() == 1)
    assert(df.filter(cc.compile("http.host.cnt == 1-2")).count() == 2)
  }

  test("negated port-only ip leaf excludes NULL-ip rows with matching port") {
    // `ip.src != :8080` compiles (jison parseIpPort `:80` form) to a
    // must_not over a PORT term only — a row whose srcIp is NULL but
    // whose srcPort is 8080 matches the inner bool, so ES excludes it.
    // The generic neg null-guard on the ip column would wrongly include
    // it (the leaf never references srcIp).
    import spark.implicits._
    import graft.model.{FieldDef, FieldKind}
    val df = Seq(
      (1, Option("10.0.0.1"), Option(8080)),
      (2, Option.empty[String], Option(8080)), // NULL ip, matching port
      (3, Option("10.0.0.3"), Option(443)),
      (4, Option.empty[String], Option(443)),
      (5, Option("10.0.0.5"), Option.empty[Int]) // NULL port (ICMP)
    ).toDF("id", "srcIp", "srcPort")
    val reg = FieldRegistry(Seq(
      FieldDef("ip.src", "srcIp", FieldKind.IpK, portField = Some("srcPort")),
      FieldDef("id", "id", FieldKind.IntegerK)))
    val cc = new Compiler(reg, now = SparkEntry.now)
    def ids(e: String): Set[Int] =
      df.filter(cc.compile(e)).select("id").as[Int].collect().toSet
    assert(ids("ip.src == :8080") == Set(1, 2))
    assert(ids("ip.src != :8080") == Set(3, 4, 5))
    // ip:port conjunct under negation: NULL-ip rows are INCLUDED (the
    // inner bool needs the ip term too, which a missing field fails)
    assert(ids("ip.src == 10.0.0.1:8080") == Set(1))
    assert(ids("ip.src != 10.0.0.1:8080") == Set(2, 3, 4, 5))
    // list mixing an ip-only and a port-only member: must_not of the
    // should — row 2 (NULL ip, port 8080) matches the port member, so
    // the negation excludes it
    assert(ids("ip.src == [10.0.0.3, :8080]") == Set(1, 2, 3))
    assert(ids("ip.src != [10.0.0.3, :8080]") == Set(4, 5))
  }

}
