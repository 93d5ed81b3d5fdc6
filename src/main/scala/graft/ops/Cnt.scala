package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality materialization — the reference's `<field>Cnt` companion
  * columns (capture/db.c:946-1041: every multivalued field is written
  * with a sibling count) and the HLL-style distinct-count surface.
  */
object Cnt {

  /** Add `<name>Cnt` companions for the given array columns at write
    * time, exactly like the reference's serializer.
    */
  def withCntColumns(df: DataFrame, arrayCols: Seq[String]): DataFrame =
    arrayCols.foldLeft(df)((d, c) => d.withColumn(s"${c}Cnt", size(col(c))))

  /** Exact distinct counts for a set of columns (one pass). */
  def cardinality(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      countDistinct(col(cols.head)).as(s"${cols.head}_card"),
      cols.tail.map(c => countDistinct(col(c)).as(s"${c}_card")): _*)

  /** Approximate (HyperLogLog++) distinct counts — the streaming-friendly
    * sketch the reference's `*Cnt` would become at 100 TB (mergeable
    * partial aggregates, bounded memory).
    */
  def approxCardinality(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"${cols.head}_card"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_card")): _*)
}
