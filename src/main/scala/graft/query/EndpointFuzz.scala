package graft.query

/** Parameterized differential fuzz for the facet/histogram endpoint
  * kernels (E3/E5/E6): random (interval, field, top-k, filter) combos
  * evaluated by `ops/Endpoints` on one side and by an independent ANSI
  * SQL translation (DuckDB, via the driver's oracle) on the other. The
  * fixed-parameter endpoint queries pin one shape each; this sweeps the
  * parameter space — interval snapping at odd granularities, top-k
  * tie-breaks at every k, the spigraph top-key semi-join under filters.
  *
  * Unified output schema (both sides): (case_id BIGINT, k VARCHAR,
  * b BIGINT, n BIGINT) — term value as string ('' for histograms),
  * bucket epoch seconds (0 for top-k), count; total order (case_id, k, b).
  */
object EndpointFuzz {

  sealed trait Kind
  case object Hist extends Kind
  case object Top extends Kind
  case object Spi extends Kind

  final case class EpCase(id: Int, kind: Kind, interval: Long,
      field: String, fieldSql: String, k: Int,
      filterExpr: Option[String], filterSql: Option[String])

  private final class Rng(seed: Long) {
    private var s: Long = seed
    def nextInt(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound + bound) % bound).toInt
    }
    def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))
  }

  private val intervals = Seq(60L, 300L, 900L, 3600L, 7200L, 21600L, 86400L)
  private val fields = Seq(("type", "event_type"), ("user", "user_id"),
    ("props", "props"))
  // (expression syntax, independent SQL) — applied BEFORE the endpoint,
  // so the spigraph top keys are computed over the filtered universe on
  // both sides
  private val filters = Seq[(Option[String], Option[String])](
    (None, None),
    (Some("type == click"), Some("event_type = 'click'")),
    (Some("value >= 100"), Some("value >= 100")),
    (Some("user == 10-80"), Some("user_id BETWEEN 10 AND 80")),
    (Some("type == [purchase, signup]"),
      Some("event_type IN ('purchase', 'signup')")))

  /** Deterministic case list (relative-date filters are the grammar
    * fuzz's job — their SQL depends on `now`).
    */
  def cases(n: Int, seed: Long): Seq[EpCase] = {
    val r = new Rng(seed)
    (0 until n).map { i =>
      val (fe, fq) = r.oneOf(filters)
      r.nextInt(3) match {
        case 0 =>
          EpCase(i, Hist, r.oneOf(intervals), "", "", 0, fe, fq)
        case 1 =>
          val (f, fsql) = r.oneOf(fields)
          EpCase(i, Top, 0L, f, fsql, r.oneOf(Seq(1, 2, 3, 5, 10, 25)),
            fe, fq)
        case _ =>
          val (f, fsql) = r.oneOf(fields.take(2))
          EpCase(i, Spi, r.oneOf(intervals), f, fsql,
            r.oneOf(Seq(2, 3, 5)), fe, fq)
      }
    }
  }

  def oracleSql(cs: Seq[EpCase]): String = {
    def whereAnd(c: EpCase, extra: String): String = {
      val parts = c.filterSql.toSeq ++ (if (extra.nonEmpty) Seq(extra) else Nil)
      if (parts.isEmpty) "" else parts.mkString("WHERE ", " AND ", "")
    }
    val branches = cs.map { c =>
      val cid = s"CAST(${c.id} AS BIGINT)"
      c.kind match {
        case Hist =>
          s"""SELECT $cid AS case_id, '' AS k,
              CAST(floor(epoch(ts)/${c.interval})*${c.interval} AS BIGINT) AS b,
              CAST(count(*) AS BIGINT) AS n
              FROM events ${whereAnd(c, "")} GROUP BY b"""
        case Top =>
          s"""SELECT $cid AS case_id, CAST(${c.fieldSql} AS VARCHAR) AS k,
              CAST(0 AS BIGINT) AS b, CAST(cnt AS BIGINT) AS n FROM (
                SELECT ${c.fieldSql}, count(*) AS cnt FROM events
                ${whereAnd(c, s"${c.fieldSql} IS NOT NULL")}
                GROUP BY ${c.fieldSql}
                ORDER BY cnt DESC, ${c.fieldSql} ASC LIMIT ${c.k})"""
        case Spi =>
          s"""SELECT $cid AS case_id, CAST(e.${c.fieldSql} AS VARCHAR) AS k,
              CAST(floor(epoch(e.ts)/${c.interval})*${c.interval} AS BIGINT) AS b,
              CAST(count(*) AS BIGINT) AS n
              FROM events e JOIN (
                SELECT ${c.fieldSql}, count(*) AS cnt FROM events
                ${whereAnd(c, s"${c.fieldSql} IS NOT NULL")}
                GROUP BY ${c.fieldSql}
                ORDER BY cnt DESC, ${c.fieldSql} ASC LIMIT ${c.k}) t
                USING (${c.fieldSql})
              ${whereAnd(c, s"e.${c.fieldSql} IS NOT NULL")}
              GROUP BY k, b"""
      }
    }
    branches.mkString("SELECT case_id, k, b, n FROM (", " UNION ALL ",
      ") ORDER BY case_id, k, b")
  }
}
