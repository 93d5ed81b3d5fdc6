package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware aggregation helpers.
  *
  * At 100 TB a handful of hot keys (one scanning IP, one boilerplate
  * document) can put an entire groupBy partition on one executor. The
  * two-phase salted aggregate splits every key into `salts` subkeys for
  * the partial phase, then merges — the hot key's work spreads over
  * `salts` tasks while the final merge touches only `salts` rows per key.
  * (AQE's skew handling covers joins; aggregation skew still needs this.)
  */
object Skew {

  /** Salted count/sum aggregate: semantically identical to
    * `df.groupBy(key).agg(aggs)` for decomposable aggregates
    * (count, sum, min, max).
    */
  def saltedAgg(
      df: DataFrame, key: Column, salts: Int,
      partial: Map[String, Column],
      merge: Map[String, String => Column]): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(partial.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }.head,
        partial.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }.tail: _*)
    salted.groupBy(col("key"))
      .agg(merge.toSeq.sortBy(_._1).map { case (n, f) => f(n).as(n) }.head,
        merge.toSeq.sortBy(_._1).map { case (n, f) => f(n).as(n) }.tail: _*)
  }

  /** Salted count per key — the common case. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    saltedAgg(df, key, salts,
      partial = Map("cnt" -> count(lit(1))),
      merge = Map("cnt" -> (n => sum(col(n)))))
}
