package graft.ops

import org.apache.spark.sql.SparkSession

/** E48: `GET /api/eshealth` analogue (reference: viewer/apiStats.js
  * getESHealth → Db.healthCache; the ES body carries cluster_name,
  * status green/yellow/red, number_of_nodes, active shard counts and a
  * version stamp). The backing "cluster" here is Spark + the parquet
  * session store, so the health surface is reshaped to what can
  * actually degrade in this engine:
  *
  *  - **green**: the store root is reachable and holds day partitions,
  *    and at least one executor is alive;
  *  - **yellow**: reachable but empty (no day partitions yet — a fresh
  *    install, exactly the state the reference reports yellow for
  *    before the first index exists);
  *  - **red**: the filesystem call failed — the store cannot be read.
  *
  * Deliberately METADATA-CHEAP: one directory listing, no parquet
  * footers, no jobs — this is the endpoint UIs poll every few seconds
  * (the reference caches it for the same reason). The full per-day
  * file/byte/row census is E39 [[graft.etl.SessionStore.inspect]].
  */
object Health {

  final case class HealthRow(
      cluster: String,
      status: String, // green | yellow | red
      error: String,
      nodes: Int, // live executors (driver included in local mode)
      days: Int, // day partitions in the store
      version: String,
      tsMs: Long)

  def check(spark: SparkSession, storePath: String,
      cluster: String = "graft",
      nowMs: Long = System.currentTimeMillis()): HealthRow = {
    val nodes = spark.sparkContext.statusTracker.getExecutorInfos.length
    val (status, days, err) =
      try {
        val p = new org.apache.hadoop.fs.Path(storePath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val days =
          if (!fs.exists(p)) 0
          else fs.listStatus(p).count(s =>
            s.isDirectory && s.getPath.getName.startsWith("day="))
        (if (days > 0 && nodes > 0) "green" else "yellow", days, "")
      } catch {
        case e: Exception => ("red", 0, String.valueOf(e.getMessage))
      }
    HealthRow(cluster, status, err, nodes, days, spark.version, nowMs)
  }

  /** The row in the shape [[Parliament]] consumes for its esRed rule. */
  def toClusterHealth(h: HealthRow): Parliament.ClusterHealth =
    Parliament.ClusterHealth(h.cluster, h.status, h.error)
}
