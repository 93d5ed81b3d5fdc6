package tmpprobe

import graft.{Sessions, SparkEntry, Tables}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive._

/** Run one query and print per-operator SQL metrics (time-ish ones) from
  * the final executed plan. Usage: runMain tmpprobe.MetricsProbe <sfDir> <query>
  */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    try SparkEntry.queries(name)(spark, sfDir).count()
    catch { case e: Throwable => println(s"warm FAILED: $e") }
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    // collect(), not count(): count wraps the frame in a NEW QueryExecution,
    // so df.queryExecution's plan would never carry metrics
    df.collect()
    println(f"total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        (k.contains("time") || k.contains("Time") || k == "numOutputRows") &&
          m.value > 0
      }
      val ms = interesting.map { case (k, m) =>
        s"$k=${m.value}${if (m.metricType == "timing") "ms"
          else if (m.metricType == "nsTiming") "ns" else ""}"
      }.mkString(" ")
      println("  " * depth + p.nodeName + " " + ms)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case r: exchange.ReusedExchangeExec =>
          println("  " * (depth + 1) + "(reused)")
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach { s => println("  " * depth + "SUBQUERY:"); walk(s, depth + 1) }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
