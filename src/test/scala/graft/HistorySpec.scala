package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.query.History
import graft.query.History.Entry

/** E17 history audit log (viewer/apiHistory.js) + E11 CSV export. */
class HistorySpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  // two ISO weeks: 2024-01-01 (w01) and 2024-01-10 (w02)
  private val w1 = 1704103200L // 2024-01-01T10:00:00Z
  private val w2 = 1704880800L // 2024-01-10T10:00:00Z

  private def seed(path: String): Unit = {
    History.record(spark, path, Entry("", "sessions", "alice", "GET",
      "/api/sessions", "protocols == http", timestamp = w1,
      queryTime = 12, forcedExpression = "node == a1"))
    History.record(spark, path, Entry("", "spiview", "bob", "GET",
      "/api/spiview", "port.dst == 443", timestamp = w1 + 60,
      queryTime = 30))
    History.record(spark, path, Entry("", "sessions", "alice", "POST",
      "/api/sessions/addTags", "ip.src == 10.0.0.1", timestamp = w2,
      queryTime = 7, view = "errors"))
  }

  test("history: weekly partitions, scoping, filters, paging, forced masking") {
    val path = Files.createTempDirectory("graft-hist").resolve("history").toString
    seed(path)

    // week partitions exist (the history_v1-wYYWW rotation analogue)
    val weeks = new java.io.File(path).list().filter(_.startsWith("week=")).sorted
    assert(weeks.toSeq == Seq("week=2024-w01", "week=2024-w02"))

    // prefix-named users must not leak into each other's scope
    History.record(spark, path, Entry("", "sessions", "alicesmith", "GET",
      "/api/sessions", "port == 99", timestamp = w1 + 120))

    // non-admin: own rows only (exact userId match), forcedExpression blanked
    val (mine, nMine) = History.list(spark, path, "alice", isAdmin = false)
    val mineRows = mine.collect()
    assert(nMine == 2 && mineRows.forall(_.getAs[String]("userId") == "alice"))
    assert(mineRows.forall(_.getAs[String]("forcedExpression") == ""))
    // non-admin cannot request another user
    intercept[IllegalStateException] {
      History.list(spark, path, "alice", isAdmin = false,
        forUserId = Some("bob"))
    }

    // admin: all rows, forced expression visible, default sort ts desc
    val (all, nAll) = History.list(spark, path, "admin", isAdmin = true)
    val allRows = all.collect()
    assert(nAll == 4)
    assert(allRows.map(_.getAs[Long]("timestamp")).toSeq ==
      Seq(w2, w1 + 120, w1 + 60, w1))
    assert(allRows.exists(_.getAs[String]("forcedExpression") == "node == a1"))

    // searchTerm spans expression/userId/api/view; api substring; exists
    assert(History.list(spark, path, "admin", isAdmin = true,
      searchTerm = Some("443"))._2 == 1)
    assert(History.list(spark, path, "admin", isAdmin = true,
      searchTerm = Some("ALICE"))._2 == 3)
    assert(History.list(spark, path, "admin", isAdmin = true,
      api = Some("addTags"))._2 == 1)
    assert(History.list(spark, path, "admin", isAdmin = true,
      existsFields = Seq("view"))._2 == 1)

    // time range prunes to w1 only
    val (ranged, nRanged) = History.list(spark, path, "admin", isAdmin = true,
      startSec = Some(w1 - 10), stopSec = Some(w1 + 3600))
    assert(nRanged == 3)
    assert(ranged.collect().forall(_.getAs[Long]("timestamp") < w2))

    // paging: length 1 from offset 1 of the asc-sorted listing
    val (page, _) = History.list(spark, path, "admin", isAdmin = true,
      sortField = "timestamp", desc = false, start = 1, length = 1)
    assert(page.collect().map(_.getAs[Long]("timestamp")).toSeq == Seq(w1 + 60))
  }

  test("history delete: admin only, rewrites only the containing week") {
    val path = Files.createTempDirectory("graft-hist2").resolve("history").toString
    seed(path)
    val id = spark.read.parquet(path)
      .filter(col("api") === "/api/spiview")
      .select("id").as[String].head()

    intercept[IllegalStateException] {
      History.delete(spark, path, isAdmin = false, id)
    }
    // untouched-week file mtimes stay put across the delete
    def files(week: String) =
      new java.io.File(s"$path/week=$week").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val w2Before = files("2024-w02")
    assert(History.delete(spark, path, isAdmin = true, id))
    assert(files("2024-w02") == w2Before)
    assert(spark.read.parquet(path).count() == 2)
    assert(!History.delete(spark, path, isAdmin = true, "nope"))
  }

  test("E11 csv export: header row + quoted values round-trip") {
    val dir = Files.createTempDirectory("graft-csv").resolve("out").toString
    val df = Seq(
      ("s1", "10.0.0.1", 80L, "says \"hi\", twice"),
      ("s2", "10.0.0.2", 443L, "plain"))
      .toDF("sessionId", "srcIp", "dstPort", "note")
    graft.ops.Endpoints.writeCsv(df, dir)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    assert(back.columns.toSeq == df.columns.toSeq)
    assert(back.orderBy("sessionId").collect().map(_.toSeq).toSeq ==
      df.orderBy("sessionId").collect().map(_.toSeq).toSeq)
  }
}
