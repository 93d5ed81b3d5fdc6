package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming analytics twins of the batch endpoints — the live-dashboard
  * path (the reference's viewer polls ES for fresh sessions; Structured
  * Streaming computes the same rollups incrementally as sessions arrive).
  *
  * Scale design: both operators are watermark-bounded, so state size is
  * O(active windows × key cardinality), never O(stream length); partial
  * aggregation happens map-side per micro-batch and the shuffle key is
  * (window, group) — the same hash partitioning the batch path uses.
  */
object LiveStats {

  /** Watermarked time histogram: the streaming twin of
    * `Endpoints.timeHistogram` (E3/E16). Emits one finalized row per
    * (window, group) once the watermark passes the window end — append
    * mode, so downstream sinks (parquet, the ES-bulk shaper) see each
    * bucket exactly once.
    */
  def timeHistogram(
      stream: DataFrame,
      tsCol: Column,
      intervalSec: Long,
      watermarkDelay: String,
      groupBy: Seq[Column] = Seq.empty,
      sums: Map[String, Column] = Map.empty): DataFrame = {
    val withTs = stream.withColumn("_ts", tsCol)
      .withWatermark("_ts", watermarkDelay)
    val aggs = count(lit(1)).as("sessions") ::
      sums.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }.toList
    withTs
      .groupBy((window(col("_ts"), s"$intervalSec seconds") +: groupBy): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket", col("window.start"))
      .drop("window")
  }

  /** Streaming spiview top-K: per time window, the k most frequent terms
    * (the streaming twin of E5 `Endpoints.topTerms`). Two chained
    * stateful aggregations in append mode (Spark >= 3.4 multi-stateful
    * support): watermarked (window, term) counts, then a bounded-heap
    * TopK over each finalized window — at most k rows of state per
    * partition in the second agg, never a per-window sort of all terms.
    */
  def topTerms(
      stream: DataFrame,
      termCol: Column,
      tsCol: Column,
      intervalSec: Long,
      watermarkDelay: String,
      k: Int): DataFrame = {
    val counts = stream.withColumn("_ts", tsCol)
      .withWatermark("_ts", watermarkDelay)
      .groupBy(window(col("_ts"), s"$intervalSec seconds"),
        termCol.as("term"))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy(col("window"))
      .agg(graft.functions.TopK.stringIds(k)(
        col("n").cast("double"), col("term")).as("top"))
      .select(col("window.start").as("bucket"),
        transform(col("top"), s =>
          struct(s.getField("id").as("term"),
            s.getField("score").cast("long").as("n"))).as("top"))
  }

  /** Streaming exact-dedup: first occurrence of each key within the
    * watermark horizon survives (the streaming twin of I11 duplicate
    * suppression / d1 exact dedup). State per key is dropped once the
    * watermark passes, bounding memory on an unbounded stream.
    */
  def dedupStream(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: Column,
      watermarkDelay: String): DataFrame =
    stream.withColumn("_ts", tsCol)
      .withWatermark("_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)
      .drop("_ts")

  /** Streaming twin of the suricata alert enrichment (I16): live session
    * saves joined to live alerts on key + interval containment, as a
    * watermarked stream-stream join. The time-range condition is what
    * lets Spark expire join state: alert state is dropped once the
    * session-side watermark passes `alert_ts + maxSpan`, session state
    * once the alert-side watermark passes `end_ts` — bounded on an
    * unbounded stream. `maxSpan` is the session-duration cap, which the
    * ETL's mid-save segmenting already enforces upstream.
    *
    * `sessions` needs (key, start_ts, end_ts), `alerts` (key, alert_ts)
    * — timestamp columns, payloads ride along.
    */
  def alertJoinStream(
      sessions: DataFrame, alerts: DataFrame,
      watermarkDelay: String, maxSpan: String): DataFrame = {
    val s = sessions.withWatermark("end_ts", watermarkDelay)
    val a = alerts.withColumnRenamed("key", "a_key")
      .withWatermark("alert_ts", watermarkDelay)
    s.join(a,
      col("key") === col("a_key") &&
        col("alert_ts") >= col("start_ts") &&
        col("alert_ts") <= col("end_ts") &&
        col("end_ts") <= col("alert_ts") + expr(s"interval $maxSpan"))
      .drop("a_key")
  }
}
