package graft

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan census over every driver-contract query: counts the
  * plan features that matter at 100 TB (shuffles, join strategies,
  * windows, top-K operators) and writes `PLANS.md`. Run:
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.001 PLANS.md"
  *
  * The table makes plan regressions reviewable in diffs the same way
  * CORRECTNESS json makes result regressions reviewable — a query
  * suddenly gaining an exchange or losing a broadcast shows up as a
  * one-line change.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    // AQE off: the census reads the static plan (AdaptiveSparkPlanExec
    // hides its subtree from collect, and AQE's runtime choices depend
    // on sizes — the static shape is the reviewable contract)
    val spark = Sessions.builder("local[4]", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def count(p: SparkPlan)(f: SparkPlan => Boolean): Int =
      p.collect { case n if f(n) => n }.size

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        spark.catalog.clearCache()
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val cls: SparkPlan => String = _.getClass.getSimpleName
        val exch = count(plan)(cls(_).startsWith("ShuffleExchange"))
        val bcast = count(plan)(cls(_).startsWith("BroadcastExchange"))
        val smj = count(plan)(cls(_) == "SortMergeJoinExec")
        val bhj = count(plan)(n => cls(n) == "BroadcastHashJoinExec" ||
          cls(n) == "BroadcastNestedLoopJoinExec")
        val winPartless = count(plan) {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            w.partitionSpec.isEmpty
          case _ => false
        }
        val win = count(plan)(
          _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
        val topk = count(plan)(cls(_) == "TakeOrderedAndProjectExec")
        val sort = count(plan)(n => cls(n) == "SortExec" &&
          n.asInstanceOf[org.apache.spark.sql.execution.SortExec].global)
        Seq(name, exch.toString, bcast.toString, smj.toString, bhj.toString,
          win.toString, winPartless.toString, topk.toString, sort.toString)
      } catch {
        case e: Throwable =>
          Seq(name, "-", "-", "-", "-", "-", "-", "-",
            e.getClass.getSimpleName)
      }
    }

    val header = Seq("query", "shuffles", "broadcasts", "SMJ", "BHJ/BNLJ",
      "windows", "partition-less!", "TakeOrdered", "global sorts")
    val md = new StringBuilder
    md ++= "# Physical-plan census (PlanAudit)\n\n"
    md ++= s"Input: `$sfDir` (plan shapes only — sizes don't change the " +
      "census except where AQE flips a join; the partition-less-window " +
      "column must stay 0 everywhere, also enforced by PlanShapeSpec).\n\n"
    md ++= header.mkString("| ", " | ", " |\n")
    md ++= header.map(_ => "---").mkString("| ", " | ", " |\n")
    rows.foreach(r => md ++= r.mkString("| ", " | ", " |\n"))
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.print(md.toString) finally w.close()
    println(s"wrote $out (${rows.length} queries)")
    val offenders = rows.filter(r => r(6) != "0" && r(6) != "-")
    if (offenders.nonEmpty) {
      println("PARTITION-LESS WINDOWS: " + offenders.map(_.head).mkString(", "))
      sys.exit(1)
    }
    spark.stop()
  }
}
