package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.SessionStore
import graft.expr.Compiler
import graft.model.FieldRegistry
import graft.ops.Tagging

/** Periodic saved-search processing — the viewer's cron queries
  * (reference: viewer/viewer.js:2199-2430 processCronQuery /
  * internals.processCronQueries): each enabled query owns a
  * last-processed watermark (`lpValue`, epoch seconds) and is advanced
  * toward "now" in bounded time windows (≤ 24h per step in the
  * reference); sessions that arrived in the window and match the query's
  * expression receive its tags, and the query accumulates a hit count
  * (the notifier trigger, viewer.js:2424-2440).
  *
  * Scale: each step reads only the window's day partitions
  * ([[SessionStore.readRange]] prunes on the partition key) and the
  * tag write-back rewrites only the matched days
  * ([[Tagging.applyToStore]]) — a cron pass over a 100 TB store touches
  * the new data, not the store.
  */
object CronQueries {

  final case class CronQuery(
      name: String,
      expression: String,
      tags: Seq[String],
      enabled: Boolean = true,
      lpValue: Long = 0L,
      count: Long = 0L)

  /** One scheduler pass at `nowSec`. Returns the advanced query states;
    * tags land in the store as a side effect. Re-running a window is
    * idempotent (tag sets, not appends) — the crash-recovery property
    * the reference gets from ES set semantics.
    */
  def processOnce(
      spark: SparkSession, path: String,
      queries: Seq[CronQuery], nowSec: Long,
      chunkSecs: Long = 86400L): Seq[CronQuery] =
    queries.map { cq =>
      if (!cq.enabled || nowSec <= cq.lpValue) cq
      else {
        val pred = new Compiler(FieldRegistry.sessions,
          FieldRegistry.sessionCol,
          java.time.Instant.ofEpochSecond(nowSec)).compile(cq.expression)
        var lp = cq.lpValue
        var total = 0L
        while (lp < nowSec) {
          val end = math.min(nowSec, lp + chunkSecs)
          val window =
            col("firstPacket") >= lp * 1000L && col("firstPacket") < end * 1000L
          val n = SessionStore.readRange(spark, path, lp * 1000L, end * 1000L)
            .filter(window && pred).count()
          if (n > 0)
            Tagging.applyToStore(spark, path, window && pred, cq.tags, add = true)
          total += n
          lp = end
        }
        cq.copy(lpValue = lp, count = cq.count + total)
      }
    }
}
