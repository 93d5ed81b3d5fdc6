package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Compiler
import graft.model.FieldRegistry

/** Property-based guards for the expression compiler: random expressions
  * from the grammar must compile, and the compiled predicates must obey
  * boolean algebra on real data (the ES-style null semantics make `!`
  * NON-classical per leaf — `x != v` excludes null rows too — so the laws
  * are checked at the expression level where the reference defines them:
  * double negation, De Morgan, and the == / != partition over non-null
  * rows). Generators are sampled from a fixed seed: failures reproduce.
  */
class ExprPropertySpec extends AnyFunSuite with SparkSpecBase {

  private lazy val ev: DataFrame =
    Tables.load(spark, sf, "events").cache()
  private lazy val total: Long = ev.count()
  private def c = new Compiler(FieldRegistry.events, now = SparkEntry.now)

  private def rows(e: String): Long = ev.filter(c.compile(e)).count()

  // ---- generators over the events registry ---------------------------
  private val leaf: Gen[String] = Gen.oneOf(
    Gen.choose(0, 120).map(n => s"user == $n"),
    Gen.choose(0, 120).map(n => s"user != $n"),
    Gen.choose(0L, 5000L).map(n => s"id < $n"),
    Gen.choose(0L, 5000L).map(n => s"id >= $n"),
    Gen.oneOf("click", "view", "error", "purchase").map(t => s"type == $t"),
    Gen.oneOf("click", "view", "error").map(t => s"type != $t"),
    Gen.oneOf("cl*", "*iew", "*rror*").map(w => s"type == $w"),
    Gen.choose(0, 100).map(n => s"value >= $n"),
    Gen.const("type == EXISTS!"),
    Gen.choose(0, 60).flatMap(a => Gen.choose(0, 60).map(b =>
      s"user == ${math.min(a, b)}-${math.max(a, b)}")),
    Gen.oneOf(Seq("click", "view"), Seq("error", "purchase"))
      .map(l => s"type == [${l.mkString(",")}]"))

  private def expr(depth: Int): Gen[String] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for { a <- expr(depth - 1); b <- expr(depth - 1) }
        yield s"($a && $b)"),
      2 -> (for { a <- expr(depth - 1); b <- expr(depth - 1) }
        yield s"($a || $b)"),
      1 -> expr(depth - 1).map(e => s"!($e)"))

  /** Deterministic sample of `n` values (seeded — failures reproduce). */
  private def samples(g: Gen[String], n: Int, seed: Long): Seq[String] =
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator exhausted"))

  test("random grammar expressions compile and evaluate") {
    samples(expr(3), 40, 1L).foreach { e =>
      val n = rows(e)
      assert(n >= 0 && n <= total, s"out of range for: $e")
    }
  }

  test("double negation preserves the row set") {
    samples(expr(2), 25, 2L).foreach { e =>
      assert(rows(s"!(!($e))") == rows(e), s"double negation broke: $e")
    }
  }

  test("De Morgan holds for compiled predicates") {
    val as = samples(expr(1), 15, 3L)
    val bs = samples(expr(1), 15, 4L)
    as.zip(bs).foreach { case (a, b) =>
      assert(rows(s"!(($a) && ($b))") == rows(s"!($a) || !($b)"),
        s"De Morgan(&&) broke: $a / $b")
      assert(rows(s"!(($a) || ($b))") == rows(s"!($a) && !($b)"),
        s"De Morgan(||) broke: $a / $b")
    }
  }

  test("== and != partition the non-null universe per field") {
    val users = samples(Gen.choose(0, 120).map(_.toString), 10, 5L)
    val nnUser = ev.filter("user_id IS NOT NULL").count()
    val nnType = ev.filter("event_type IS NOT NULL").count()
    users.foreach { u =>
      assert(rows(s"user == $u") + rows(s"user != $u") == nnUser)
    }
    Seq("click", "view", "error").foreach { t =>
      assert(rows(s"type == $t") + rows(s"type != $t") == nnType)
    }
  }
}
