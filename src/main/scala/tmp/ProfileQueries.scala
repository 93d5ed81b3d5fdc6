package tmpprobe

import graft.{Sessions, SparkEntry, Tables}

/** Time selected queries in isolation (count() action, same as Bench) with
  * job labels, printing per-rep wall seconds. Run under JFR to attribute
  * CPU: java -XX:StartFlightRecording=filename=/tmp/prof.jfr ...
  * Usage: runMain tmpprobe.ProfileQueries <sfDir> <reps> <q1> [q2 ...]
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    // one warm pass over the selected queries (JIT/codegen)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"warm $n FAILED: $e") }
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskMetrics != null) {
            taskMs.addAndGet(t.taskMetrics.executorRunTime)
            gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          }
        }
      })
    for (r <- 1 to reps; n <- names) {
      spark.sparkContext.setJobDescription(s"$n rep$r")
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150) // let listener events drain
      println(f"TIME $n rep$r $sec%.3f jobs=${jobs.get} stages=${stages.get}" +
        f" tasks=${tasks.get} taskSec=${taskMs.get / 1e3}%.2f" +
        f" gcSec=${gcMs.get / 1e3}%.2f")
    }
    spark.stop()
  }
}
