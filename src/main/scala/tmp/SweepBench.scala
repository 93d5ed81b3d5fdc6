package tmpprobe

import graft.{Sessions, SparkEntry, Tables}

/** Query-sweep-only replica of graft.Bench: same warmup (every query
  * once at sf0.001), same two interleaved sweeps at the target SF, same
  * min-of-2 per query — without the tput/latency blocks, for fast A/B.
  * Prints one JSON line {"total": ..., "queries": {...}}.
  */
object SweepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.CacheManager",
      org.apache.logging.log4j.Level.ERROR)
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
    }
    val fixtureOnly = Set("i1_pcap_sessions", "i8_pcap_expression",
      "i10_protocol_fields", "q_fuzz_grammar", "q_fuzz_grammar_ext",
      "e_fuzz_endpoints", "e_fuzz_endpoints2", "e_fuzz_endpoints3")
    val timed = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => fixtureOnly(q._1))
    // a failed query records NaN, never its (near-zero) exception time —
    // a regression must read as a failure in the A/B totals, not a speedup
    def sweep(): Map[String, Double] = timed.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"SWEEP FAIL $name: $e"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN)
    }.toMap
    val s1 = sweep(); val s2 = sweep()
    val best = timed.map { case (n, _) => n -> math.min(s1(n), s2(n)) }
    val total = best.map(_._2).sum
    val qs = best.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(f"""SWEEPJSON{"total":$total%.3f,"queries":$qs}""")
    spark.stop()
  }
}
