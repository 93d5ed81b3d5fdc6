package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series similarity search over per-key metric series (the
  * node-stats / histogram surfaces produce exactly these): find where a
  * query PATTERN occurs in any key's series, by sliding-window squared
  * Euclidean distance. Distances are computed on integer values
  * (callers quantize, e.g. cents) so results are bit-identical on any
  * engine — no float accumulation order to worry about.
  *
  * Scale: one shuffle keyed by the series key; each key's series is
  * bounded by the time range / bucket interval (a year of minutes is
  * ~5·10⁵ points), so the per-key window fold is map-side work on a
  * bounded array, never a cross-row window. Top-k via TakeOrdered.
  *
  * Reference surface: the viewer graphs per-node session/byte series
  * (apiStats.js); "find this spike shape elsewhere" is the natural
  * search over them (cf. EDBT 2019 time-series similarity for
  * streaming data — re-expressed relationally).
  */
object Series {

  /** Sliding-window match: per key, every window of `pattern.length`
    * consecutive points scored by Σ(vᵢ₊ⱼ − pⱼ)²; global top-k lowest
    * distances. `bucketCol` orders the series; gaps are treated as
    * adjacent points (callers densify if gap semantics matter).
    */
  def patternMatch(
      df: DataFrame, keyCol: Column, bucketCol: Column, valueCol: Column,
      pattern: Seq[Long], k: Int = 10): DataFrame = {
    require(pattern.nonEmpty, "pattern must be non-empty")
    val m = pattern.length
    val pat = array(pattern.map(lit): _*)
    val series = df
      .select(keyCol.as("key"), bucketCol.cast("long").as("bucket"),
        valueCol.cast("long").as("v"))
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
      .select(col("key"),
        transform(col("pts"), p => p.getField("bucket")).as("buckets"),
        transform(col("pts"), p => p.getField("v")).as("vals"))
      .filter(size(col("vals")) >= m)
    val starts = sequence(lit(1), size(col("vals")) - (m - 1))
    val dist = {
      val s = col("start")
      // Σ over j of (vals[start+j] - pattern[j+1])²  (1-based element_at)
      aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (acc, j) => {
        val d = element_at(col("vals"), (s + j).cast("int")) -
          element_at(pat, (j + 1).cast("int"))
        acc + d * d
      })
    }
    series
      .select(col("key"), col("buckets"), col("vals"),
        explode(starts).as("start"))
      .select(col("key"),
        element_at(col("buckets"), col("start").cast("int"))
          .as("start_bucket"),
        dist.as("dist"))
      .orderBy(col("dist").asc, col("key").asc, col("start_bucket").asc)
      .limit(k)
  }
}
