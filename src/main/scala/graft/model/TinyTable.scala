package graft.model

import org.apache.spark.sql.{Encoder, SparkSession}

/** Whole-rewrite persistence for tiny configuration tables (users,
  * shortcuts, views, notifiers, parliament issues, UI state): one
  * parquet directory rewritten atomically-enough on every mutation.
  * These tables are configuration — thousands of rows at most — so a
  * full rewrite is one small task and the read side is a
  * broadcast-sized scan; they never grow with the session store.
  *
  * The swap protocol (write aside → move live table out of the way →
  * move the new one in → roll back on failure) mirrors
  * [[graft.etl.SessionStore]] compaction: HDFS `rename` will not
  * replace an existing directory, so the aside move is mandatory, and
  * the no-table window is the gap between two metadata renames rather
  * than a full recursive delete + rename (the reference serializes
  * writers the same way with per-store mutexes, e.g.
  * viewer/apiShortcuts.js shortcutMutex).
  */
object TinyTable {

  def read[T <: Product: Encoder](spark: SparkSession,
      path: String): Seq[T] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      Nil
    else spark.read.parquet(path).as[T].collect().toSeq
  }

  def write[T <: Product: Encoder](spark: SparkSession, path: String,
      rows: Seq[T], label: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "_tmp")
    spark.createDataset(rows).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val target = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + "_old")
    fs.delete(bak, true) // leftover from a crashed prior swap
    val hadOld = fs.exists(target)
    if (hadOld && !fs.rename(target, bak))
      throw new java.io.IOException(s"$label: cannot move $path aside")
    if (!fs.rename(tmp, target)) {
      if (hadOld) fs.rename(bak, target) // roll back
      throw new java.io.IOException(s"$label: cannot swap in $path")
    }
    if (hadOld) fs.delete(bak, true)
  }
}
