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
}
