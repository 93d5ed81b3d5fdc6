package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join — for each left row, the single right
  * row with the same key and the greatest right timestamp ≤ the left
  * timestamp. The classic enrichment join for time-series state
  * ("what was the user's profile / the node's config / the price AT
  * this event"), which Spark has no built-in operator for.
  *
  * Spark-first shape: both sides are tagged and unioned, shuffled ONCE
  * on the key, and a per-key running `last(_, ignoreNulls)` window
  * carries the most recent right payload onto every left row — right
  * rows order before left rows at equal timestamps, so `ts_right ==
  * ts_left` matches (the ASOF `<=` convention). Window frame state is
  * one row; partitions are per key, never partition-less. Equivalent
  * output to a range self-join but with zero range-explosion: cost is
  * sort-within-key, linear in rows.
  *
  * The right side must be unique per (key, ts) — pre-aggregate it
  * otherwise (ties would make "the" latest row ambiguous on any
  * engine).
  */
object AsOf {

  /** @param rightVals right-side value columns carried onto left rows
    *                   (null when no right row precedes the left row).
    */
  def asofJoin(
      left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct(rightVals.map(col): _*)
    val lSchema = left.schema
    val rSchema = right.select(rightVals.map(col): _*).schema
    val l = left.select(leftKey.as("_k"), leftTs.as("_ts"),
      lit(1).as("_side"), lStruct.as("_l"),
      lit(null).cast(rSchema).as("_r"))
    // NULL keys never match under equi-join (ASOF ... ON l.k = r.k)
    // semantics: drop null-keyed right rows so a null-keyed left row
    // gets null values rather than "the latest null-keyed right row".
    val r = right.select(rightKey.as("_k"), rightTs.as("_ts"),
      lit(0).as("_side"), lit(null).cast(lSchema).as("_l"),
      rStruct.as("_r"))
      // null keys never match (equi-join semantics) and a null right
      // TIMESTAMP would sort first and "precede" every left row — under
      // ASOF <= semantics it can match nothing
      .filter(col("_k").isNotNull && col("_ts").isNotNull)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_rv", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightVals.map(c => col(s"_rv.$c").as(c)): _*)
  }
}
