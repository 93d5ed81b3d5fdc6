package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session tagging — the `/api/sessions/addTags` / `removeTags` endpoints
  * (reference: viewer/apiSessions.js:2587-2661 dispatch,
  * addTagsList/removeTagsList apiSessions.js:1480-1520; the per-session
  * ES update merges/diffs the `tags` array with set semantics).
  *
  * The reference mutates matched ES documents in place. Our store is
  * immutable day-partitioned parquet, so the write-back analogue is a
  * dynamic partition overwrite that rewrites ONLY the days containing
  * matched rows — at 100 TB, tagging the sessions of a one-hour incident
  * rewrites a single day partition, never the table. Untouched days'
  * files are left as-is (verified by TaggingScrubSpec).
  */
object Tagging {

  /** Union `tags` into `tagCol` for matched rows (set semantics — a tag
    * already present is not duplicated, matching ES array merge).
    */
  def addTags(df: DataFrame, matched: Column, tags: Seq[String],
      tagCol: String = "tags"): DataFrame =
    df.withColumn(tagCol,
      when(coalesce(matched, lit(false)),
        array_union(coalesce(col(tagCol), array()), lit(tags.toArray)))
        .otherwise(col(tagCol)))

  /** Remove `tags` from `tagCol` for matched rows. An array emptied by
    * the removal stays an empty array — `EXISTS!` semantics treat null
    * and empty alike (`size(col) > 0`).
    */
  def removeTags(df: DataFrame, matched: Column, tags: Seq[String],
      tagCol: String = "tags"): DataFrame =
    df.withColumn(tagCol,
      when(coalesce(matched, lit(false)),
        array_except(coalesce(col(tagCol), array()), lit(tags.toArray)))
        .otherwise(col(tagCol)))

  /** Rewrite only the day partitions of `path` that contain rows matching
    * `matched`, applying `transform` to those days' rows. Returns the
    * rewritten day keys.
    *
    * Pattern shared by tagging write-back and SPI delete ([[Scrub]]): the
    * matched-day list is tiny (it is bounded by the store's day count) so
    * collecting it to the driver is safe at any scale, and
    * `partitionOverwriteMode=dynamic` leaves every other partition's
    * files untouched.
    */
  def rewriteMatchedDays(spark: SparkSession, path: String, matched: Column,
      partCol: String = "day")(
      transform: DataFrame => DataFrame): Seq[String] = {
    val store = spark.read.parquet(path)
    // partition discovery may infer the key as DATE or STRING — keep the
    // raw values for the isin filter, stringify only for the return
    val days = store.filter(matched).select(partCol).distinct()
      .collect().map(_.get(0)).toSeq
    if (days.isEmpty) return Nil
    // localCheckpoint materializes the updated rows before the write,
    // severing plan lineage to the files being overwritten (Spark rejects
    // an overwrite whose plan still reads the target). On a cluster this
    // would be `checkpoint` to reliable storage.
    val updated = transform(store.filter(col(partCol).isin(days: _*)))
      .localCheckpoint()
    // dynamic overwrite only replaces partitions PRESENT in the output —
    // a day whose rows were all filtered away (full-day SPI delete,
    // forward-replay purge) would silently keep its old files. Write the
    // surviving days, then drop the emptied partitions directly.
    val daysWithRows = updated.select(partCol).distinct()
      .collect().map(r => String.valueOf(r.get(0))).toSet
    if (daysWithRows.nonEmpty)
      updated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    days.map(String.valueOf).filterNot(daysWithRows).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(path, s"$partCol=$d"), true)
    }
    days.map(String.valueOf)
  }

  /** addTags/removeTags against a day-partitioned session store. */
  def applyToStore(spark: SparkSession, path: String, matched: Column,
      tags: Seq[String], add: Boolean): Seq[String] =
    rewriteMatchedDays(spark, path, matched) { df =>
      if (add) addTags(df, matched, tags) else removeTags(df, matched, tags)
    }
}
