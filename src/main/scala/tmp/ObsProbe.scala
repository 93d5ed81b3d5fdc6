package tmpprobe

import org.apache.spark.sql.{Observation, functions => F}
import graft.Sessions

/** Probe: do observe() metrics become available after an eager
  * localCheckpoint (i.e. does Dataset.checkpoint run through withAction
  * so QueryExecutionListener fires)? Prints the observed value or times
  * out after 10 s.
  */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).toDF("x")
    val obs = Observation()
    val ck = df.observe(obs, F.sum(F.when(F.col("x") % 2 === 0, 1L).otherwise(0L)).as("evens"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    val got = scala.concurrent.Await.result(
      scala.concurrent.Future(obs.get)(scala.concurrent.ExecutionContext.global),
      scala.concurrent.duration.Duration(10, "s"))
    println(s"OBS ok in ${(System.nanoTime() - t0) / 1e6} ms: $got rows=${ck.count()}")
    spark.stop()
  }
}
