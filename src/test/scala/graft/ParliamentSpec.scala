package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Notifier, Parliament}
import graft.ops.Parliament.{ClusterHealth, Settings}

/** Parliament-lite: the reference's issue rules (parliament.js
  * issueTypes + getHealth/getStats), alert-once, and the
  * acknowledge/ignore workflow.
  */
class ParliamentSpec extends AnyFunSuite with SparkSpecBase {

  private def statsDf(rows: Seq[(String, String, Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("cluster", "nodeName", "currentTime",
      "deltaPacketsPerSec", "deltaESDroppedPerSec")
  }

  test("degraded stats produce exactly the reference issue set; noPackets needs persistence") {
    val dir = Files.createTempDirectory("parliament").toString
    val t0 = 1000000000L * 1000 // ms
    val nowSec = t0 / 1000
    // n1 healthy; n2 stale check-in; n3 dropping ES bulks; n4 low packets
    val stats = statsDf(Seq(
      ("c1", "n1", nowSec - 5, 100L, 0L),
      ("c1", "n2", nowSec - 120, 50L, 0L),
      ("c1", "n3", nowSec - 2, 80L, 7L),
      ("c1", "n4", nowSec - 3, 0L, 0L)))
    val health = Seq(ClusterHealth("c1", "green"),
      ClusterHealth("c2", "red"),
      ClusterHealth("c3", "green", error = "connect ECONNREFUSED"))
    val mem = new Notifier.Memory
    val first = Parliament.processCycle(spark, dir, health, stats, t0,
      notifier = mem)
    // noPackets must persist noPacketsLengthSec before it becomes an issue
    assert(first.map(i => (i.cluster, i.issueType, i.node)).toSet == Set(
      ("c1", "outOfDate", "n2"), ("c1", "esDropped", "n3"),
      ("c2", "esRed", ""), ("c3", "esDown", "")))
    assert(first.find(_.issueType == "esDropped").get.severity == "yellow")
    assert(first.filter(_.issueType != "esDropped")
      .forall(_.severity == "red"))
    assert(first.find(_.issueType == "esDown").get.value ==
      "connect ECONNREFUSED")
    assert(mem.alerts.size == 4)
    // 11 s later, n4 is still low → promoted; nothing re-alerts
    val second = Parliament.processCycle(spark, dir, health, stats,
      t0 + 11000, notifier = mem)
    assert(second.map(i => (i.issueType, i.node)).toSet ==
      first.map(i => (i.issueType, i.node)).toSet + (("noPackets", "n4")))
    assert(mem.alerts.size == 5) // only the new noPackets alerted
    val np = second.find(_.issueType == "noPackets").get
    assert(np.value == "0" && np.severity == "red")
    // firstNoticed survives re-noticing, lastNoticed advances
    val ood = second.find(_.issueType == "outOfDate").get
    assert(ood.firstNoticedMs == t0 && ood.lastNoticedMs == t0 + 11000)
  }

  test("acknowledge suppresses and sweeps; resolved issues expire after removeIssuesAfter") {
    val dir = Files.createTempDirectory("parliament2").toString
    val t0 = 2000000000L * 1000
    val nowSec = t0 / 1000
    // stats generated relative to the CYCLE time: "bad" = stale
    // check-in, "good" = just checked in
    def bad(atMs: Long) = statsDf(Seq(("c1", "n1", atMs / 1000 - 120, 100L, 0L)))
    def good(atMs: Long) = statsDf(Seq(("c1", "n1", atMs / 1000 - 1, 100L, 0L)))
    val mem = new Notifier.Memory
    Parliament.processCycle(spark, dir, Nil, bad(t0), t0, notifier = mem)
    assert(mem.alerts.size == 1)
    // acknowledged: never alerts again, swept removeAcknowledgedAfter later
    Parliament.acknowledge(spark, dir, "c1", "outOfDate", "n1", t0 + 1000)
    val after = Parliament.processCycle(spark, dir, Nil, bad(t0 + 2000),
      t0 + 2000, notifier = mem)
    assert(mem.alerts.size == 1)
    assert(after.head.acknowledgedMs == t0 + 1000)
    val t16 = t0 + 16 * 60000
    val swept = Parliament.processCycle(spark, dir, Nil, good(t16), t16,
      notifier = mem)
    assert(swept.isEmpty, "acknowledged issue swept after 15 min")
    // a fresh occurrence is a NEW issue and alerts again
    val t17 = t0 + 17 * 60000
    Parliament.processCycle(spark, dir, Nil, bad(t17), t17, notifier = mem)
    assert(mem.alerts.size == 2)
    // resolved (node recovers): issue lingers until removeIssuesAfter
    val t18 = t0 + 18 * 60000
    val lingering = Parliament.processCycle(spark, dir, Nil, good(t18), t18,
      notifier = mem)
    assert(lingering.map(_.issueType) == Seq("outOfDate"))
    val t79 = t18 + 61 * 60000
    val gone = Parliament.processCycle(spark, dir, Nil, good(t79), t79,
      notifier = mem)
    assert(gone.isEmpty, "unresolved-for-60min issue removed")
  }

  test("ignore/removeIgnore round-trip; remove deletes outright") {
    val dir = Files.createTempDirectory("parliament3").toString
    val t0 = 3000000000L * 1000
    val nowSec = t0 / 1000
    val bad = statsDf(Seq(("c1", "n1", nowSec - 120, 100L, 0L)))
    Parliament.processCycle(spark, dir, Nil, bad, t0)
    val ignored = Parliament.ignore(spark, dir, "c1", "outOfDate", "n1",
      t0, forMs = 3600000)
    assert(ignored.head.ignoreUntilMs == t0 + 3600000)
    val forever = Parliament.ignore(spark, dir, "c1", "outOfDate", "n1",
      t0, forMs = -1)
    assert(forever.head.ignoreUntilMs == Long.MaxValue)
    val cleared = Parliament.removeIgnore(spark, dir, "c1", "outOfDate", "n1")
    assert(cleared.head.ignoreUntilMs == -1L)
    assert(Parliament.remove(spark, dir, "c1", "outOfDate", "n1").isEmpty)
    intercept[IllegalArgumentException] {
      Parliament.remove(spark, dir, "c1", "outOfDate", "n1")
    }
  }

  test("cluster rollup: rates summed, live nodes counted like getStats") {
    import spark.implicits._
    val nowSec = 1000L
    val stats = Seq(
      ("c1", "n1", nowSec - 5, 100L, 0L, 1000L, 2L, 1L),
      ("c1", "n2", nowSec - 120, 50L, 0L, 500L, 3L, 0L), // stale: not live
      ("c1", "n3", nowSec - 2, 0L, 0L, 0L, 0L, 1L), // no packets: not live
      ("c2", "n4", nowSec - 1, 9L, 0L, 70L, 1L, 0L))
      .toDF("cluster", "nodeName", "currentTime", "deltaPacketsPerSec",
        "deltaESDroppedPerSec", "deltaBytesPerSec",
        "deltaTotalDroppedPerSec", "monitoring")
    val got = Parliament.clusterRollup(stats, nowSec).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(("c1", 1500L, 5L, 1L, 2L), ("c2", 70L, 1L, 1L, 0L)))
  }
}
