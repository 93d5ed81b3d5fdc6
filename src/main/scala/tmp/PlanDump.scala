package tmpprobe

import graft.{Sessions, SparkEntry}

/** Dump .explain("formatted") for every (or selected) declared query to
  * <outDir>/<query>_<tag>.txt — the optimization-round plan evidence.
  * Usage: runMain tmpprobe.PlanDump <sfDir> <outDir> <tag> [q1 q2 ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt", "UTF-8")
          try w.print(txt) finally w.close()
          println(s"dumped $name")
        } catch {
          case e: Throwable => println(s"FAILED $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
