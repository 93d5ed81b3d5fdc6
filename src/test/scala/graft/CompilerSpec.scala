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

}
