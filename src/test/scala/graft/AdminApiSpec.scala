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
