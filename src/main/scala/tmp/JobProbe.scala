package tmpprobe

import graft.{Sessions, SparkEntry, Tables}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job timing breakdown for one query: prints each job's wall ms,
  * stage/task counts and call site after a warm pass.
  * Usage: runMain tmpprobe.JobProbe <sfDir> <query> [reps]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    for (_ <- 1 to 2)
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"warm FAILED: $e") }
    case class J(id: Int, var t0: Long = 0, var t1: Long = 0,
      var stages: Int = 0, var tasks: Int = 0, var site: String = "")
    val jobs = mutable.LinkedHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J(e.jobId))
        j.t0 = e.time
        j.stages = e.stageInfos.size
        j.tasks = e.stageInfos.map(_.numTasks).sum
        j.site = e.stageInfos.map(s => s.name.take(40)).mkString(" | ")
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
    })
    for (r <- 1 to reps) {
      jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"== $name rep$r total ${sec}%.3f s, ${jobs.size} jobs")
      var prevEnd = 0L
      jobs.values.foreach { j =>
        val gap = if (prevEnd == 0) 0 else j.t0 - prevEnd
        prevEnd = j.t1
        println(f"  job ${j.id}%3d ${j.t1 - j.t0}%5d ms (gap $gap%4d) " +
          f"stages=${j.stages} tasks=${j.tasks} ${j.site}")
      }
    }
    spark.stop()
  }
}
