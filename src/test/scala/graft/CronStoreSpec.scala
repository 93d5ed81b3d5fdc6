package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.query.CronStore

/** The persistent cron-query lifecycle (apiUsers.js:960-1183): CRUD with
  * sanitized unique keys and creator scoping, the enabled toggle audit
  * trail, and — the part the reference keeps in ES — the lpValue
  * watermark surviving a store round-trip and advancing through
  * store-backed processOnce passes.
  */
class CronStoreSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val day1 = 1704067200L // 2024-01-01T00:00:00Z
  private val day2 = day1 + 86400
  private val day3 = day2 + 86400

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-cronstore").resolve(name).toString

  private def freshSessions(): String = {
    val dir = tmp("sessions")
    Seq(
      (1L, "2024-01-01", (day1 + 600) * 1000L, (day1 + 700) * 1000L,
        Seq("http"), Seq.empty[String]),
      (2L, "2024-01-01", (day1 + 900) * 1000L, (day1 + 950) * 1000L,
        Seq("dns"), Seq.empty[String]),
      (3L, "2024-01-02", (day2 + 600) * 1000L, (day2 + 700) * 1000L,
        Seq("http"), Seq.empty[String]))
      .toDF("id", "day", "firstPacket", "lastPacket", "protocol", "tags")
      .write.partitionBy("day").parquet(dir)
    dir
  }

  test("create sanitizes keys, uniquifies duplicates, seeds the watermark from since") {
    val store = tmp("store")
    val q1 = CronStore.create(spark, store, "alice", "http watch!",
      "protocols == http", Seq("cron:http"), nowSec = day2,
      minTimestampSec = Some(day1))
    assert(q1.key == "http watch") // '!' sanitized away
    assert(q1.lpValue == day2 && q1.lastRun == day2) // since=0 -> now
    val q2 = CronStore.create(spark, store, "bob", "http watch?",
      "protocols == http", Seq("t"), sinceHours = -1L, nowSec = day2,
      minTimestampSec = Some(day1))
    assert(q2.key == "http watch-2") // same sanitized base -> suffixed
    assert(q2.lpValue == day1) // since=-1 -> store minimum
    val q3 = CronStore.create(spark, store, "alice", "old", "tags == x",
      Seq("t"), sinceHours = 48L, nowSec = day3,
      minTimestampSec = Some(day2))
    assert(q3.lpValue == day2) // now-48h == day1, clamped to store min

    // creator scoping, created-ascending
    assert(CronStore.list(spark, store, "alice").map(_.key) ==
      Seq("http watch", "old"))
    assert(CronStore.list(spark, store, "bob").map(_.key) ==
      Seq("http watch-2"))

    // reference 403s on missing fields
    intercept[IllegalArgumentException](CronStore.create(spark, store,
      "alice", "", "e", Seq("t")))
    intercept[IllegalArgumentException](CronStore.create(spark, store,
      "alice", "n", "", Seq("t")))
    intercept[IllegalArgumentException](CronStore.create(spark, store,
      "alice", "n", "e", Seq.empty))
  }

  test("update replaces editable fields, preserves watermark, audits the toggle") {
    val store = tmp("store")
    val q = CronStore.create(spark, store, "alice", "w", "tags == x",
      Seq("t1"), description = "orig", notifier = "slack",
      nowSec = day1, minTimestampSec = Some(day1))
    val moved = q.copy(lpValue = day2, count = 7L)
    // simulate an advanced watermark persisted by a pass
    CronStore.delete(spark, store, "alice", q.key)
    graft.model.TinyTable.write(spark, store, Seq(moved), "cronqueries")(
      org.apache.spark.sql.Encoders.product[CronStore.StoredCronQuery])

    val up = CronStore.update(spark, store, actorId = "admin", key = q.key,
      name = "w2", expression = "tags == y", tags = Seq("t2"),
      action = "tag", enabled = false, nowSec = day3,
      actorIsAdmin = true)
    assert(up.name == "w2" && up.expression == "tags == y")
    assert(up.description == "" && up.notifier == "") // cleared when omitted
    assert(up.lpValue == day2 && up.count == 7L) // watermark preserved
    assert(up.creator == "alice" && up.created == day1)
    assert(up.lastToggledBy == "admin" && up.lastToggled == day3)

    // a non-toggling update (by the owner) leaves the audit fields alone
    val up2 = CronStore.update(spark, store, "alice", q.key, "w2",
      "tags == y", Seq("t2"), "tag", enabled = false, nowSec = day3 + 5)
    assert(up2.lastToggledBy == "admin" && up2.lastToggled == day3)

    // mutation is owner-or-admin, like every sibling config store
    intercept[IllegalStateException](CronStore.update(spark, store, "bob",
      q.key, "w2", "tags == y", Seq("t2"), "tag", enabled = true))
    intercept[IllegalStateException](
      CronStore.delete(spark, store, "bob", q.key))

    CronStore.delete(spark, store, "alice", q.key)
    assert(CronStore.readAll(spark, store).isEmpty)
    intercept[NoSuchElementException](
      CronStore.delete(spark, store, "alice", q.key))
  }

  test("processOnce(store) advances and persists the watermark; replay is a no-op") {
    val sessions = freshSessions()
    val store = tmp("store")
    CronStore.create(spark, store, "alice", "http-watch",
      "protocols == http", Seq("cron:http"), nowSec = day1,
      minTimestampSec = Some(day1))
    CronStore.create(spark, store, "alice", "disabled",
      "protocols == dns", Seq("cron:dns"), nowSec = day1,
      minTimestampSec = Some(day1))
    CronStore.update(spark, store, "alice", "disabled", "disabled",
      "protocols == dns", Seq("cron:dns"), "tag", enabled = false,
      nowSec = day1)

    val s1 = CronStore.processOnce(spark, sessions, store, nowSec = day2)
    val live = s1.find(_.key == "http-watch").get
    assert(live.lpValue == day2 && live.count == 1 && live.lastRun == day2)
    assert(s1.find(_.key == "disabled").get.lpValue == day1)

    // the watermark survives a full store round-trip (fresh read)
    val reread = CronStore.readAll(spark, store)
    assert(reread.find(_.key == "http-watch").get.lpValue == day2)
    assert(reread.find(_.key == "http-watch").get.count == 1)

    // second pass continues from the persisted watermark
    val s2 = CronStore.processOnce(spark, sessions, store, nowSec = day3)
    assert(s2.find(_.key == "http-watch").get.lpValue == day3)
    assert(s2.find(_.key == "http-watch").get.count == 2)
    val tagged = spark.read.parquet(sessions)
      .filter(array_contains(col("tags"), "cron:http"))
      .select("id").as[Long].collect().toSet
    assert(tagged == Set(1L, 3L))

    // replaying the same instant moves nothing and re-tags nothing
    val s3 = CronStore.processOnce(spark, sessions, store, nowSec = day3)
    assert(s3 == s2)
    assert(spark.read.parquet(sessions).filter(col("id") === 1L)
      .select("tags").as[Seq[String]].head == Seq("cron:http"))
  }
}
