package graft.query

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Query-history audit log — the `/api/histories` surface (reference:
  * viewer/apiHistory.js:34-188 getHistories/deleteHistory; the recorded
  * object is apiHistory.js:11-31, written per API request by
  * viewer.js logAction into weekly `history_v1-wYYWW` indices).
  *
  * Store mapping: the weekly index rotation becomes `partitionBy(week)`
  * — retention and the reference's per-index delete translate to
  * partition operations, and a time-ranged listing prunes to the weeks
  * it touches. History is append-only (one small file per flush);
  * [[delete]] rewrites only the week holding the doomed id, exactly the
  * blast radius of the reference's `Db.deleteHistory(id, index)`.
  *
  * Listing semantics carried over (apiHistory.js:52-127):
  *  - non-admins see only their own items, and `forcedExpression` is
  *    blanked for them (admins see all, optionally filtered by userId);
  *  - `searchTerm` matches expression/userId/api/view fields;
  *  - `api` is a substring filter; `exists` requires fields non-null;
  *  - time range on `timestamp` (epoch seconds), sort + paging.
  */
object History {

  final case class Entry(
      id: String,
      uiPage: String,
      userId: String,
      method: String,
      api: String,
      expression: String,
      view: String = "",
      timestamp: Long = 0L, // epoch seconds
      range: Long = -1L, // hours, -1 = all
      query: String = "",
      queryTime: Long = 0L, // ms
      forcedExpression: String = "")

  private def weekOf(tsSec: Long): String = {
    val d = java.time.Instant.ofEpochSecond(tsSec)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val wf = java.time.temporal.WeekFields.ISO
    f"${d.get(wf.weekBasedYear())}%04d-w${d.get(wf.weekOfWeekBasedYear())}%02d"
  }

  /** Append one request record. `id` defaults to a content-derived stamp
    * (user, api, timestamp) — unique enough per the reference's per-doc
    * ES ids, deterministic for tests.
    */
  def record(spark: SparkSession, path: String, entry: Entry): Entry = {
    val e = if (entry.id.nonEmpty) entry
      else {
        val base = s"${entry.userId}-${entry.api.replaceAll("[^a-zA-Z0-9]", "_")}-${entry.timestamp}-${entry.queryTime}"
        // two requests by the same user to the same api in the same
        // second with equal queryTime would collide, and delete(id)
        // would remove both rows — bump a suffix within the target week
        // until the id is free (the week is one small parquet partition)
        val week = weekOf(entry.timestamp)
        val taken: Set[String] =
          try {
            import spark.implicits._
            spark.read.parquet(path)
              .filter(col("week") === week &&
                col("id").startsWith(base))
              .select("id").as[String].collect().toSet
          } catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }
        val id =
          if (!taken(base)) base
          else Iterator.from(2).map(n => s"$base-$n").find(!taken(_)).get
        entry.copy(id = id)
      }
    spark.createDataset(Seq(e))(Encoders.product[Entry])
      .withColumn("week", lit(weekOf(e.timestamp)))
      .coalesce(1)
      .write.mode("append").partitionBy("week").parquet(path)
    e
  }

  /** The GET /api/histories listing. Returns the page plus the
    * pre-paging filtered count in the driver tuple (recordsFiltered).
    */
  def list(spark: SparkSession, path: String,
      userId: String, isAdmin: Boolean,
      forUserId: Option[String] = None,
      searchTerm: Option[String] = None,
      api: Option[String] = None,
      existsFields: Seq[String] = Nil,
      startSec: Option[Long] = None, stopSec: Option[Long] = None,
      sortField: String = "timestamp", desc: Boolean = true,
      start: Int = 0, length: Int = 1000): (DataFrame, Long) = {
    if (!isAdmin && forUserId.exists(_ != userId))
      throw new IllegalStateException("Need admin privileges")
    val base = spark.read.parquet(path)
    // non-admin: own rows ONLY (exact match — the reference's wildcard
    // '*userId*' would leak "bobby" rows to "bob"; security wins over
    // bug-compatibility here); admin: all, or a substring filter (the
    // reference's admin search semantics)
    var df =
      if (isAdmin)
        forUserId.map(u => base.filter(col("userId").contains(u)))
          .getOrElse(base)
      else base.filter(col("userId") === userId)
    searchTerm.foreach { t =>
      val needle = lit(t.toLowerCase)
      df = df.filter(
        lower(col("expression")).contains(needle) ||
        lower(col("userId")).contains(needle) ||
        lower(col("api")).contains(needle) ||
        lower(col("view")).contains(needle))
    }
    api.foreach(a => df = df.filter(col("api").contains(a)))
    existsFields.foreach(f =>
      df = df.filter(col(f).isNotNull && col(f) =!= ""))
    (startSec, stopSec) match {
      case (Some(a), Some(b)) =>
        // prune week partitions first, then the second filter refines
        df = df.filter(col("week") >= weekOf(a) && col("week") <= weekOf(b))
          .filter(col("timestamp") >= a && col("timestamp") <= b)
      case _ => ()
    }
    val filtered = df.count()
    val sorted = df.orderBy(
      (if (desc) col(sortField).desc else col(sortField).asc),
      col("id")) // total order for stable paging
      .offset(start).limit(length)
    // non-admins never see their forced expression (apiHistory.js:146-149)
    val masked = if (isAdmin) sorted
      else sorted.withColumn("forcedExpression", lit(""))
    (masked, filtered)
  }

  /** DELETE /api/history/:id (admin only): rewrite only the week
    * partition containing the id. Returns true if something was deleted.
    */
  def delete(spark: SparkSession, path: String, isAdmin: Boolean,
      id: String): Boolean = {
    if (!isAdmin) throw new IllegalStateException("Need admin privileges")
    val matched = graft.ops.Tagging.rewriteMatchedDays(spark, path,
      col("id") === id, partCol = "week") { df => df.filter(col("id") =!= id) }
    matched.nonEmpty
  }
}
