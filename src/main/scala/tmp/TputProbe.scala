package tmpprobe

import graft.Sessions

/** Sessionize-throughput passes over the cached bench corpus, for JFR
  * attribution of the ingest path (decode -> reassembly -> parsers ->
  * session build). Usage: runMain tmpprobe.TputProbe [dir] [passes]
  */
object TputProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft-bench-tput"
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".pcap")).map(_.length).sum
    for (r <- 1 to passes) {
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime()
      val n = graft.etl.SessionBuilder.sessionize(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TPUT rep$r $sec%.3f s  ${bytes / 1e6 / sec}%.1f MB/s  sessions=$n")
    }
    spark.stop()
  }
}
