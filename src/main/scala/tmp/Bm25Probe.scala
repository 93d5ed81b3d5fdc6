package tmpprobe

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Time the bm25TopK subplans in isolation to attribute the late
  * single-task 400-750 ms job seen in t22/s10.
  * Usage: runMain tmpprobe.Bm25Probe <sfDir>
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.load(spark, sfDir, "documents")
    def time(tag: String)(f: => Unit): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$tag rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val q = d.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("qid"), substring(col("text"), 1, 60).as("qt"))
    val qterms = q.select(col("qid").as("query_id"),
      explode(graft.functions.ShingleHashes(col("qt"), 1, distinct = true,
        wide = true)).as("term"))
    time("qterms-collect") { qterms.collect() }
    val tf = d.select(col("doc_id"),
      explode(graft.functions.ShingleHashes.termCounts64Col(col("text"))).as("p"))
      .select(col("doc_id"), col("p._1").as("term"), col("p._2").as("tf"))
    time("tf-noop") { tf.write.format("noop").mode("overwrite").save() }
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfc"))
    time("dfreq-qjoin-collect") {
      dfreq.join(broadcast(qterms.select("term").distinct()), Seq("term")).collect()
    }
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    time("stats-collect") { dl.agg(count(lit(1)), sum("len")).collect() }
    spark.stop()
  }
}
