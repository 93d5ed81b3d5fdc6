package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.query.CronQueries
import graft.query.CronQueries.CronQuery

class CronQueriesSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val day1 = 1704067200L // 2024-01-01T00:00:00Z
  private val day2 = day1 + 86400
  private val day3 = day2 + 86400

  private def freshStore(): String = {
    val dir = Files.createTempDirectory("graft-cron").resolve("store").toString
    Seq(
      (1L, "2024-01-01", (day1 + 600) * 1000L, (day1 + 700) * 1000L,
        Seq("http"), Seq.empty[String]),
      (2L, "2024-01-01", (day1 + 900) * 1000L, (day1 + 950) * 1000L,
        Seq("dns"), Seq.empty[String]),
      (3L, "2024-01-02", (day2 + 600) * 1000L, (day2 + 700) * 1000L,
        Seq("http"), Seq.empty[String]),
      (4L, "2024-01-02", (day2 + 900) * 1000L, (day2 + 950) * 1000L,
        Seq("dns"), Seq.empty[String]))
      .toDF("id", "day", "firstPacket", "lastPacket", "protocol", "tags")
      .write.partitionBy("day").parquet(dir)
    dir
  }

  test("cron pass tags only the processed window, advances lpValue, accumulates count") {
    val dir = freshStore()
    val qs = Seq(
      CronQuery("http-watch", "protocols == http", Seq("cron:http"),
        lpValue = day1),
      CronQuery("disabled", "protocols == dns", Seq("cron:dns"),
        enabled = false, lpValue = day1))

    // pass 1: now = start of day 2 -> only day-1 sessions processed
    val s1 = CronQueries.processOnce(spark, dir, qs, nowSec = day2)
    assert(s1(0).lpValue == day2 && s1(0).count == 1)
    assert(s1(1) == qs(1)) // disabled query untouched
    val t1 = spark.read.parquet(dir)
      .filter(array_contains(col("tags"), "cron:http"))
      .select("id").as[Long].collect().toSet
    assert(t1 == Set(1L))

    // pass 2: now = start of day 3 -> day-2 window catches session 3
    val s2 = CronQueries.processOnce(spark, dir, s1, nowSec = day3)
    assert(s2(0).lpValue == day3 && s2(0).count == 2)
    val t2 = spark.read.parquet(dir)
      .filter(array_contains(col("tags"), "cron:http"))
      .select("id").as[Long].collect().toSet
    assert(t2 == Set(1L, 3L))
    // dns sessions never tagged (the matching query is disabled)
    assert(spark.read.parquet(dir)
      .filter(array_contains(col("tags"), "cron:dns")).count() == 0)

    // crash-replay: rewinding the watermark re-tags idempotently
    val replay = CronQueries.processOnce(spark, dir,
      Seq(s2(0).copy(lpValue = day1, count = 0)), nowSec = day3)
    assert(replay(0).count == 2)
    val tags3 = spark.read.parquet(dir).filter(col("id") === 1L)
      .select("tags").as[Seq[String]].head
    assert(tags3 == Seq("cron:http")) // set semantics — no duplicate tag

    // catch-up runs in bounded chunks: a 2-day lag = two windows, same total
    val dir2 = freshStore()
    val caughtUp = CronQueries.processOnce(spark, dir2,
      Seq(CronQuery("http-watch", "protocols == http", Seq("cron:http"),
        lpValue = day1)), nowSec = day3)
    assert(caughtUp(0).count == 2 && caughtUp(0).lpValue == day3)
  }
}
