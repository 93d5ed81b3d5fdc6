package graft.query

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Grammar fuzz harness for the expression compiler (Q1–Q13 surface).
  *
  * Generates seeded random well-formed search expressions over the
  * `events` field registry TOGETHER WITH an independent ANSI-SQL
  * translation of each, built directly from the reference's documented
  * semantics (viewer/molochparser.jison formatQuery: ES must_not
  * negation, list = OR of member matches, `lo` operand fold, anchored
  * full-match regex, snap-then-offset relative dates) — NOT from the
  * compiler under test. The driver's DuckDB runs the SQL side, so every
  * generated case is a real differential oracle: `q_fuzz_grammar`
  * evaluates all cases in a few wide aggregate passes and emits
  * (case_id, n) rows whose hash must match DuckDB's.
  *
  * Determinism: a fixed LCG seed (no java.util.Random), a fixed `now`,
  * and pure generation — the same (expr, sql) pairs on every run, in
  * the Spark job and in the oracle SQL string.
  */
object ExprFuzz {

  final case class Case(id: Int, expr: String, sql: String)

  /** Deterministic 64-bit LCG (Knuth MMIX constants). */
  private final class Rng(seed: Long) {
    private var s: Long = seed
    def nextInt(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound + bound) % bound).toInt
    }
    def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  private val types = Seq("click", "view", "error", "purchase", "signup")
  // wildcard / regex operands stay alphanumeric + the metachar under
  // test, so expr-side quoting and SQL-side escaping are both trivial
  private val wildcards = Seq("p*", "*e", "*r*", "c*ck", "*i*", "s*p")
  private val regexes = Seq("cl.*", ".*or", "(click|view)", "p.{4,7}e",
    "s.g.*", "[cv].*")

  /** must_not wrapper: a row matches the negation when the inner
    * predicate is false OR NULL (jison formatQuery must_not).
    */
  private def mustNot(sql: String): String = s"NOT coalesce($sql, FALSE)"

  private def like(pat: String): String = pat.replace("*", "%")

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** Independent relative-date arithmetic: snap FIRST, then offset
    * (jison:858-880) — `-36h@d` = truncate(now, day) - 36h.
    */
  private def relInstant(now: Instant, n: Int, unit: Char,
      snap: Option[Char]): Instant = {
    val base = snap match {
      case Some('d') => Instant.ofEpochSecond(
        now.getEpochSecond - Math.floorMod(now.getEpochSecond, 86400L))
      case Some('h') => Instant.ofEpochSecond(
        now.getEpochSecond - Math.floorMod(now.getEpochSecond, 3600L))
      case _ => now
    }
    val secs = unit match {
      case 'd' => n * 86400L
      case 'h' => n * 3600L
      case 'm' => n * 60L
      case _   => n.toLong
    }
    base.minusSeconds(secs)
  }

  private def tsLit(i: Instant): String = s"TIMESTAMP '${tsFmt.format(i)}'"

  /** One leaf: (expression syntax, SQL WHERE predicate). The SQL carries
    * the positive form; != leaves wrap it in the must_not translation.
    */
  private def leaf(r: Rng, now: Instant): (String, String) = {
    def negPair(field: String, v: String, pos: String,
        neg: Boolean): (String, String) =
      if (neg) (s"$field != $v", mustNot(pos)) else (s"$field == $v", pos)
    r.nextInt(10) match {
      case 0 => // int compare on id/user
        val (f, c, hi) = r.oneOf(Seq(("id", "event_id", 12000),
          ("user", "user_id", 160)))
        val n = r.nextInt(hi)
        r.oneOf(Seq("<", "<=", ">", ">=")) match {
          case op => (s"$f $op $n", s"$c $op $n")
        }
      case 1 => // int equality / must_not
        val (f, c, hi) = r.oneOf(Seq(("id", "event_id", 12000),
          ("user", "user_id", 160)))
        val n = r.nextInt(hi)
        negPair(f, n.toString, s"$c = $n", r.chance(40))
      case 2 => // int range shorthand a-b
        val (f, c, hi) = r.oneOf(Seq(("id", "event_id", 12000),
          ("user", "user_id", 160)))
        val a = r.nextInt(hi); val b = a + 1 + r.nextInt(hi / 4 + 1)
        negPair(f, s"$a-$b", s"$c BETWEEN $a AND $b", r.chance(40))
      case 3 => // int list with an embedded range
        val (f, c, hi) = r.oneOf(Seq(("id", "event_id", 12000),
          ("user", "user_id", 160)))
        val x = r.nextInt(hi); val y = r.nextInt(hi)
        val a = r.nextInt(hi); val b = a + 1 + r.nextInt(20)
        negPair(f, s"[$x, $y, $a-$b]",
          s"($c = $x OR $c = $y OR $c BETWEEN $a AND $b)", r.chance(40))
      case 4 => // term equality
        val v = r.oneOf(types)
        negPair("type", v, s"event_type = '$v'", r.chance(40))
      case 5 => // wildcard
        val w = r.oneOf(wildcards)
        negPair("type", w, s"event_type LIKE '${like(w)}'", r.chance(30))
      case 6 => // anchored regex
        val re = r.oneOf(regexes)
        negPair("type", s"/$re/",
          s"regexp_full_match(event_type, '$re')", r.chance(30))
      case 7 => // lo-term operand fold + mixed term/wildcard list
        if (r.chance(50)) {
          val v = r.oneOf(types).toUpperCase
          negPair("type.lower", v, s"event_type = lower('$v')", r.chance(30))
        } else {
          val v1 = r.oneOf(types); val w = r.oneOf(wildcards)
          negPair("type", s"[$v1, $w]",
            s"(event_type = '$v1' OR event_type LIKE '${like(w)}')",
            r.chance(30))
        }
      case 8 => // float compare / EXISTS!
        if (r.chance(60)) {
          val v = r.nextInt(49000) / 100.0
          val op = r.oneOf(Seq("<", "<=", ">", ">="))
          (s"value $op $v", s"value $op $v")
        } else {
          val f = r.oneOf(Seq(("props", "props"), ("type", "event_type"),
            ("user", "user_id")))
          if (r.chance(50)) (s"${f._1} == EXISTS!", s"${f._2} IS NOT NULL")
          else (s"${f._1} != EXISTS!", s"${f._2} IS NULL")
        }
      case _ => // dates: absolute and relative/snapped, range ops only
        val op = r.oneOf(Seq(">=", "<", ">", "<="))
        if (r.chance(40)) {
          val day = 1 + r.nextInt(30)
          val hour = r.nextInt(24)
          if (r.chance(50))
            (f"""ts $op%s "2024/01/$day%02d"""",
              f"ts $op%s TIMESTAMP '2024-01-$day%02d 00:00:00'")
          else
            (f"""ts $op%s "2024/01/$day%02d $hour%02d:00:00"""",
              f"ts $op%s TIMESTAMP '2024-01-$day%02d $hour%02d:00:00'")
        } else {
          val (n, unit) = r.oneOf(Seq(
            (1 + r.nextInt(40), 'd'), (1 + r.nextInt(800), 'h'),
            (1 + r.nextInt(2000), 'm')))
          val snap = r.oneOf(Seq(None, Some('d'), Some('h')))
          val snapStr = snap.map("@" + _).getOrElse("")
          (s"ts $op -$n$unit$snapStr",
            s"ts $op ${tsLit(relInstant(now, n, unit, snap))}")
        }
    }
  }

  private def gen(r: Rng, now: Instant, depth: Int): (String, String) =
    if (depth <= 0 || r.chance(45)) leaf(r, now)
    else r.nextInt(5) match {
      case 0 | 1 =>
        val (ae, as) = gen(r, now, depth - 1); val (be, bs) = gen(r, now, depth - 1)
        (s"($ae && $be)", s"($as AND $bs)")
      case 2 | 3 =>
        val (ae, as) = gen(r, now, depth - 1); val (be, bs) = gen(r, now, depth - 1)
        (s"($ae || $be)", s"($as OR $bs)")
      case _ =>
        val (ae, as) = gen(r, now, depth - 1)
        (s"!($ae)", mustNot(as))
    }

  /** The seeded case list — same on every call. */
  def cases(n: Int, seed: Long, now: Instant): Seq[Case] = {
    val r = new Rng(seed)
    (0 until n).map { i =>
      val (e, s) = gen(r, now, 3)
      Case(i, e, s)
    }
  }

  /** DuckDB oracle: one UNION ALL branch per case, each a single
    * aggregate over events → (case_id, n) with BIGINT types and a total
    * ordering, per the driver's hash-compare contract.
    */
  def oracleSql(cs: Seq[Case]): String =
    cs.map(c =>
      s"""SELECT CAST(${c.id} AS BIGINT) AS case_id,
          CAST(coalesce(sum(CASE WHEN ${c.sql} THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n FROM events""")
      .mkString("SELECT case_id, n FROM (", " UNION ALL ",
        ") ORDER BY case_id")
}
