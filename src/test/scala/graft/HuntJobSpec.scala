package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder
import graft.ops.{Hunt, HuntJob, Notifier}

/** Resumable hunt-job lifecycle (reference viewer/apiHunts.js:370-580):
  * batched progress, checkpointed cursor, pause/resume, error pause,
  * completion alert — and interrupted+resumed ≡ one-shot.
  */
class HuntJobSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val sessions = SessionBuilder.sessionizeRef(spark,
    "/root/reference/tests/pcap/socks-http-example.pcap").cache()

  private val cfg = Hunt.HuntConfig(
    Hunt.AsciiNeedle("example.com", caseSensitive = false))

  private def oneShotKeys = Hunt.run(sessions, cfg)
    .filter(col("huntTag").isNotNull)
    .select(col("sessionId"), col("segmentSeq").cast("long")).collect()
    .map(r => (r.getString(0), r.getLong(1))).toSet

  test("interrupted + resumed hunt matches the one-shot result exactly") {
    val dir = Files.createTempDirectory("huntjob").toString
    HuntJob.create(dir, "h1", "example hunt")
    val n = sessions.count()
    assert(n > 2)
    // run ONE batch of 2 sessions, then stop — the mid-run interruption
    val st1 = HuntJob.process(sessions, cfg, dir, batchSize = 2, maxBatches = 1)
    assert(st1.status == "running" && st1.searchedSessions == 2)
    assert(st1.totalSessions == n)
    // a fresh process call (a new runner after a crash) continues from
    // the persisted cursor and finishes
    val st2 = HuntJob.process(sessions, cfg, dir, batchSize = 2)
    assert(st2.status == "finished")
    assert(st2.searchedSessions == n)
    val got = HuntJob.matches(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == oneShotKeys)
    assert(st2.matchedSessions == oneShotKeys.size)
    // processing a finished hunt is a no-op
    val st3 = HuntJob.process(sessions, cfg, dir, batchSize = 2)
    assert(st3 == st2)
  }

  test("pause is observed at the batch boundary; resume continues") {
    val dir = Files.createTempDirectory("huntjob2").toString
    HuntJob.create(dir, "h2", "pausable hunt")
    HuntJob.process(sessions, cfg, dir, batchSize = 1, maxBatches = 1)
    HuntJob.pause(dir)
    // paused: process returns without searching anything further
    val stP = HuntJob.process(sessions, cfg, dir, batchSize = 1)
    assert(stP.status == "paused" && stP.searchedSessions == 1)
    // resume re-queues; the next process run completes the hunt
    HuntJob.resume(dir)
    val mem = new Notifier.Memory
    val stF = HuntJob.process(sessions, cfg, dir, batchSize = 1,
      notifier = mem)
    assert(stF.status == "finished")
    assert(stF.searchedSessions == sessions.count())
    assert(mem.alerts.exists(_._1.contains("finished")))
    val got = HuntJob.matches(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == oneShotKeys)
  }

  test("store-backed hunt: day-carved walk ≡ one-shot; resume scans only the cursor's partition") {
    import graft.etl.SessionStore
    import spark.implicits._
    val base = sessions.collect().toSeq
    val n = base.size
    val dayMs = 86400000L
    // three day partitions: day 1 is 50 replicas (the "big history"),
    // days 2 and 3 one replica each
    def shifted(copy: Int, dayOff: Int) = base.map(r => r.copy(
      sessionId = s"${r.sessionId}#$dayOff-$copy",
      firstPacket = r.firstPacket + dayOff * dayMs,
      lastPacket = r.lastPacket + dayOff * dayMs))
    val rows = (0 until 50).flatMap(shifted(_, 0)) ++
      shifted(0, 1) ++ shifted(0, 2)
    val storeDir = Files.createTempDirectory("huntstore").toString
    SessionStore.write(
      spark.createDataset(rows)(org.apache.spark.sql.Encoders
        .product[SessionBuilder.SessionRow]), storeDir)
    val days = new java.io.File(storeDir).listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName).sorted
    assert(days.length == 3)
    val day1Bytes = new java.io.File(storeDir, days.head).listFiles()
      .map(_.length).sum

    // one-shot over the whole store
    val dirA = Files.createTempDirectory("huntjobS1").toString
    HuntJob.create(dirA, "hs1", "store hunt")
    val stA = HuntJob.processStore(spark, storeDir, cfg, dirA,
      batchSize = n)
    assert(stA.status == "finished")
    assert(stA.searchedSessions == rows.size)
    val wantKeys = rows.filter(r => oneShotKeys.exists(_._1 ==
      r.sessionId.takeWhile(_ != '#')))
      .map(r => (r.sessionId, r.segmentSeq.toLong)).toSet
    val gotA = HuntJob.matches(spark, dirA).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotA == wantKeys)

    // interrupted walk: budget lands the cursor inside day 3
    val dirB = Files.createTempDirectory("huntjobS2").toString
    HuntJob.create(dirB, "hs2", "resumable store hunt")
    val stB1 = HuntJob.processStore(spark, storeDir, cfg, dirB,
      batchSize = n, maxBatches = 52)
    assert(stB1.status == "running")
    assert(stB1.lastDay == days.last.stripPrefix("day="))
    // the finishing run must touch ONLY the cursor's day partition:
    // measure parquet bytes read while it runs
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val stB2 =
      try HuntJob.processStore(spark, storeDir, cfg, dirB, batchSize = n)
      finally {
        Thread.sleep(1500) // listener bus is async
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(stB2.status == "finished")
    assert(stB2.searchedSessions == rows.size)
    val gotB = HuntJob.matches(spark, dirB).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotB == wantKeys)
    // day 1 holds 50/52 of the store; a finishing run that re-scanned
    // the store would read ≥ day1Bytes. One-partition reads stay far
    // under it.
    assert(bytesRead.get < day1Bytes / 5,
      s"finishing run read ${bytesRead.get} bytes; day1 is $day1Bytes")
  }

  test("a failing batch pauses the hunt with an error and alerts") {
    val dir = Files.createTempDirectory("huntjob3").toString
    HuntJob.create(dir, "h3", "failing hunt")
    val mem = new Notifier.Memory
    // Hunt.run swallows per-file I/O errors (unreadable file → no
    // channel), so the error path is exercised with a sessions frame
    // whose evaluation itself fails
    val poisoned = sessions.map(s =>
      if (true) throw new RuntimeException("boom") else s)(
      org.apache.spark.sql.Encoders.product[SessionBuilder.SessionRow])
    val st = HuntJob.process(poisoned, cfg, dir, batchSize = 2,
      notifier = mem)
    assert(st.status == "paused" && st.errors.nonEmpty)
    assert(mem.alerts.exists(_._1.contains("paused with error")))
    // resume clears the pause; the real sessions then finish the hunt
    HuntJob.resume(dir)
    val stF = HuntJob.process(sessions, cfg, dir, batchSize = 2)
    assert(stF.status == "finished")
    val got = HuntJob.matches(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == oneShotKeys)
  }

  test("hunt user grants: validated set-wise add, remove, persistence") {
    val dir = Files.createTempDirectory("huntjob-users").toString
    HuntJob.create(dir, "h5", "shared hunt")
    val known = Set("alice", "bob")
    // invalid ids are reported, valid ones deduped in
    val (st1, bad1) = HuntJob.addUsers(dir, Seq("alice", "ghost"), known)
    assert(st1.users == Seq("alice") && bad1 == Seq("ghost"))
    val (st2, _) = HuntJob.addUsers(dir, Seq("bob", "alice"), known)
    assert(st2.users == Seq("alice", "bob"))
    // the grant list survives a reload (a fresh runner / viewer)
    assert(HuntJob.load(dir).get.users == Seq("alice", "bob"))
    // all-invalid is the reference's 404
    intercept[NoSuchElementException] {
      HuntJob.addUsers(dir, Seq("nobody"), known)
    }
    assert(HuntJob.removeUser(dir, "alice").users == Seq("bob"))
    intercept[NoSuchElementException] { HuntJob.removeUser(dir, "alice") }
  }

  test("removefromsessions withdraws the match log and flags the hunt") {
    val dir = Files.createTempDirectory("huntjob-rm").toString
    HuntJob.create(dir, "h6", "removable hunt")
    // no matches yet → the reference's 202 "Nothing to do"
    intercept[IllegalStateException] { HuntJob.removeFromSessions(dir) }
    val st = HuntJob.process(sessions, cfg, dir, batchSize = 2)
    assert(st.status == "finished" && st.matchedSessions > 0)
    assert(HuntJob.matches(spark, dir).count() == oneShotKeys.size)
    val removed = HuntJob.removeFromSessions(dir)
    assert(removed.removed && removed.matchedSessions == st.matchedSessions)
    // the annotations are gone; counters and state survive
    assert(HuntJob.matches(spark, dir).count() == 0)
    assert(HuntJob.load(dir).get.removed)
  }
}
