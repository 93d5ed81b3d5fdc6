package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Health
import graft.query.UserState

/** E46 per-user UI-state persistence and E48 store health — the thin
  * admin/config endpoint analogues.
  */
class AdminApiSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("table states upsert per (user, name) and default to {}") {
    val path = tmp("graft-ustate") + "/state"
    assert(UserState.getState(spark, path, "alice", "sessionsNew") == "{}")
    UserState.setState(spark, path, "alice", "sessionsNew",
      """{"order":[["firstPacket","desc"]]}""")
    UserState.setState(spark, path, "bob", "sessionsNew", """{"n":1}""")
    assert(UserState.getState(spark, path, "alice", "sessionsNew")
      .contains("firstPacket"))
    assert(UserState.getState(spark, path, "bob", "sessionsNew") == """{"n":1}""")
    // upsert replaces, never duplicates
    UserState.setState(spark, path, "alice", "sessionsNew", """{"v":2}""")
    assert(UserState.getState(spark, path, "alice", "sessionsNew") == """{"v":2}""")
    assert(UserState.list(spark, path, "alice", UserState.StateKind)
      .count(_.name == "sessionsNew") == 1)
  }

  test("column/spiview configs: sanitized unique names, CRUD discipline") {
    val path = tmp("graft-ucols") + "/state"
    val e = UserState.create(spark, path, "alice", UserState.ColumnKind,
      "my cols!@#", """{"columns":["srcIp"],"order":[["srcIp","asc"]]}""")
    // reference sanitation strips to [-a-zA-Z0-9\s_:]
    assert(e.name == "my cols")
    // duplicate create is an error (the reference's 403)
    intercept[IllegalArgumentException] {
      UserState.create(spark, path, "alice", UserState.ColumnKind,
        "my cols", """{"columns":[]}""")
    }
    // same name under another user or kind is fine
    UserState.create(spark, path, "bob", UserState.ColumnKind,
      "my cols", """{"columns":["dstIp"]}""")
    UserState.create(spark, path, "alice", UserState.SpiviewKind,
      "my cols", """{"fields":["protocol"]}""")
    assert(UserState.list(spark, path, "alice", UserState.ColumnKind)
      .map(_.name) == Seq("my cols"))
    // update requires an existing entry
    intercept[IllegalArgumentException] {
      UserState.update(spark, path, "alice", UserState.ColumnKind,
        "nope", """{}""")
    }
    UserState.update(spark, path, "alice", UserState.ColumnKind,
      "my cols", """{"columns":["dstPort"]}""")
    assert(UserState.list(spark, path, "alice", UserState.ColumnKind)
      .head.json.contains("dstPort"))
    UserState.delete(spark, path, "alice", UserState.ColumnKind, "my cols")
    assert(UserState.list(spark, path, "alice", UserState.ColumnKind).isEmpty)
    intercept[IllegalArgumentException] {
      UserState.delete(spark, path, "alice", UserState.ColumnKind, "my cols")
    }
    // empty-after-sanitation names are rejected
    intercept[IllegalArgumentException] {
      UserState.create(spark, path, "alice", UserState.ColumnKind,
        "!!!", """{}""")
    }
  }

  test("user settings: defaults, per-key overlay, token strip, ack") {
    import graft.query.UsersStore
    val path = tmp("graft-usettings") + "/users"
    UsersStore.create(spark, path, actorIsAdmin = true,
      UsersStore.StoredUser("alice", "Alice", ""), "pw")
    // a settings-less user answers pure defaults (internals.js:70-83)
    val d = UsersStore.getSettings(spark, path, "alice")
    assert(d("timezone") == "local" && d("theme") == "default-theme")
    assert(d("sortColumn") == "firstPacket")
    // unknown user: also defaults, like the reference's missing settingUser
    assert(UsersStore.getSettings(spark, path, "ghost") == d)
    // stored keys overlay defaults; the auth token never persists
    UsersStore.updateSettings(spark, path, "alice",
      Map("timezone" -> "UTC", "token" -> "secret"))
    val s = UsersStore.getSettings(spark, path, "alice")
    assert(s("timezone") == "UTC" && s("theme") == "default-theme")
    assert(!s.contains("token"))
    // acknowledge: self-only, records the message number
    intercept[IllegalStateException] {
      UsersStore.acknowledgeMsg(spark, path, "bob", "alice", 2)
    }
    UsersStore.acknowledgeMsg(spark, path, "alice", "alice", 2)
    assert(UsersStore.readAll(spark, path)
      .find(_.userId == "alice").get.welcomeMsgNum == 2)
  }

  test("dstats: derived metric, newest-wins cells, zero-fill, rollups") {
    import graft.ops.Endpoints
    import spark.implicits._
    // two nodes, interval-60 samples on a [0, 40) grid of step 10 (4
    // cells); n1 has two samples in cell 1 (newest wins), n2 only one
    // sample so its other cells zero-fill; an interval-5 row and an
    // out-of-range row must be ignored
    val m = Seq(
      ("n1", 5L, 60L, 1000L, 500L),   // cell 0: floor(1000*1000/500*8)=16000
      ("n1", 12L, 60L, 100L, 500L),   // cell 1, older
      ("n1", 18L, 60L, 200L, 500L),   // cell 1, newest → 3200
      ("n2", 25L, 60L, 300L, 1000L),  // cell 2: 2400
      ("n1", 26L, 5L, 999L, 1L),      // wrong interval — ignored
      ("n2", 99L, 60L, 999L, 1L))     // out of range — ignored
      .toDF("nodeName", "currentTime", "interval", "deltaBytes", "deltaMS")
    val grid = Endpoints.dstats(m, "deltaBitsPerSec",
      startSec = 0L, stopSec = 40L, stepSec = 10L, intervalSec = 60L)
    val rows = grid.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(rows.length == 8) // 2 nodes × 4 cells, zero-filled
    val by = rows.map(t => (t._1, t._2) -> t._3).toMap
    assert(by(("n1", 0)) == 16000.0 && by(("n1", 1)) == 3200.0)
    assert(by(("n1", 2)) == 0.0 && by(("n1", 3)) == 0.0)
    assert(by(("n2", 2)) == 2400.0 && by(("n2", 0)) == 0.0)
    // Total sums across nodes per cell; Average divides by node count
    val tot = Endpoints.dstatsRollup(grid, average = false).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(tot(0) == 16000.0 && tot(2) == 2400.0 && tot(3) == 0.0)
    val avg = Endpoints.dstatsRollup(grid, average = true).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(avg(0) == 8000.0 && avg(3) == 0.0)
    // the gauge scaling path (apiStats.js mult): freeSpaceM × 1e6
    val g = Seq(("n1", 5L, 60L, 2.5)).toDF(
      "nodeName", "currentTime", "interval", "freeSpaceM")
    val fs = Endpoints.dstats(g, "freeSpaceM", 0L, 10L, 10L, 60L).collect()
    assert(fs.length == 1 && fs(0).getDouble(2) == 2500000.0)
  }

  test("health: yellow on an empty store, green once days exist, red on failure") {
    val dir = tmp("graft-health")
    val store = s"$dir/store"
    val h0 = Health.check(spark, store, cluster = "c1", nowMs = 1000L)
    assert(h0.status == "yellow" && h0.days == 0 && h0.nodes > 0)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(store, "day=2024-01-01"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(store, "day=2024-01-02"))
    val h1 = Health.check(spark, store, cluster = "c1", nowMs = 2000L)
    assert(h1.status == "green" && h1.days == 2 && h1.error == "")
    assert(h1.cluster == "c1" && h1.version == spark.version)
    // an unreadable scheme fails red, never throws (the UI polls this)
    val bad = Health.check(spark, "nosuchfs://x/y")
    assert(bad.status == "red" && bad.error.nonEmpty)
    assert(Health.toClusterHealth(h1) ==
      graft.ops.Parliament.ClusterHealth("c1", "green", ""))
  }
}
