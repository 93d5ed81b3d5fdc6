package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{SessionBuilder, SessionStore}
import graft.ops.{Forward, Notifier, PcapExport, Upload}
import graft.query.{CronQueries, Shortcuts}
import graft.query.CronQueries.CronQuery

/** The round-5 viewer surfaces: shortcut CRUD/persistence
  * (apiShortcuts.js), pcap upload ingest (apiMisc.js:200-233), and
  * cross-cluster session forwarding (apiSessions.js sendSessionsList /
  * receiveSession) including the cron `forward:` action and notifier
  * throttle (viewer.js:2258-2264, 2424-2440).
  */
class ShortcutsUploadForwardSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  private val srcPcap = "/root/reference/tests/pcap/socks-http-example.pcap"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ------------------------------------------------------------------
  // Shortcuts
  // ------------------------------------------------------------------

  test("shortcut CRUD: create/list/update/delete with owner+shared scoping") {
    val path = tmp("graft-shortcuts") + "/lookups"
    val sc = Shortcuts.create(spark, path, "alice", "bad guys!", "string",
      "evil.com, worse.com\nworst.com")
    assert(sc.name == "badguys") // [^-a-zA-Z0-9_] stripped
    assert(sc.values == Seq("evil.com", "worse.com", "worst.com"))

    // global name collision, regardless of creator
    intercept[IllegalArgumentException] {
      Shortcuts.create(spark, path, "bob", "badguys", "string", "x")
    }

    Shortcuts.create(spark, path, "bob", "bobs_ips", "ip", "10.0.0.1",
      shared = false)
    Shortcuts.create(spark, path, "bob", "shared_ports", "number",
      "80,443", shared = true)

    // alice sees her own + bob's shared, not bob's private
    assert(Shortcuts.list(spark, path, "alice").map(_.name) ==
      Seq("badguys", "shared_ports"))
    assert(Shortcuts.forUser(spark, path, "alice") ==
      Map("badguys" -> Seq("evil.com", "worse.com", "worst.com"),
        "shared_ports" -> Seq("80", "443")))

    // non-owner non-admin cannot update/delete; admin can
    intercept[IllegalStateException] {
      Shortcuts.update(spark, path, "alice", isAdmin = false, "bobs_ips",
        "bobs_ips", "ip", "10.9.9.9")
    }
    val up = Shortcuts.update(spark, path, "admin", isAdmin = true,
      "bobs_ips", "bobs_ips", "ip", "10.9.9.9")
    assert(up.values == Seq("10.9.9.9"))
    // rename collision against OTHER shortcuts only
    intercept[IllegalArgumentException] {
      Shortcuts.update(spark, path, "bob", isAdmin = false, "bobs_ips",
        "badguys", "ip", "10.9.9.9")
    }
    // locked refuses UI updates even from the owner
    Shortcuts.create(spark, path, "alice", "pinned", "string", "v",
      locked = true)
    intercept[IllegalStateException] {
      Shortcuts.update(spark, path, "alice", isAdmin = true, "pinned",
        "pinned", "string", "v2")
    }
    intercept[IllegalStateException] {
      Shortcuts.delete(spark, path, "bob", isAdmin = false, "badguys")
    }
    Shortcuts.delete(spark, path, "alice", isAdmin = false, "badguys")
    assert(!Shortcuts.list(spark, path, "alice").exists(_.name == "badguys"))

    // list filters: substring + type
    assert(Shortcuts.list(spark, path, "bob",
      searchTerm = Some("PORT")).map(_.name) == Seq("shared_ports"))
    assert(Shortcuts.list(spark, path, "bob",
      fieldType = Some("ip")).map(_.name) == Seq("bobs_ips"))

    // a renamed shortcut keeps its id, so the freed NAME is still a
    // live id — re-creating it must refuse (two rows sharing one id
    // would corrupt later update/delete)
    Shortcuts.create(spark, path, "alice", "orig", "string", "v1")
    Shortcuts.update(spark, path, "alice", isAdmin = false, "orig",
      "renamed", "string", "v2")
    intercept[IllegalArgumentException] {
      Shortcuts.create(spark, path, "bob", "orig", "string", "v3")
    }
  }

  test("store-backed shortcuts resolve in a compiled $name query") {
    val path = tmp("graft-shortcuts2") + "/lookups"
    Shortcuts.create(spark, path, "alice", "watch", "ip",
      "10.180.156.185", shared = true)
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val c = new graft.expr.Compiler(graft.model.FieldRegistry.sessions,
      graft.model.FieldRegistry.sessionCol,
      shortcuts = Shortcuts.forUser(spark, path, "bob"))
    val hits = sessions.toDF().filter(c.compile("ip.src == $watch")).count()
    assert(hits > 0)
    assert(hits == sessions.filter(_.srcIp == "10.180.156.185").count())
  }

  // ------------------------------------------------------------------
  // Upload
  // ------------------------------------------------------------------

  test("upload: posted pcap is copied, sessionized, tagged, queryable") {
    val dir = tmp("graft-upload")
    val store = s"$dir/store"
    val pcapDir = s"$dir/pcap"
    // the caller's temp file, as multer would stage it
    val posted = s"$dir/upload-tmp-1234"
    Files.copy(Paths.get(srcPcap), Paths.get(posted))

    val r = Upload.upload(spark, posted, store, pcapDir,
      tags = Seq("uploaded", "bad tag!!"), node = "upl")
    Files.delete(Paths.get(posted)) // reference unlinks after the command

    val expected = SessionBuilder.sessionize(spark, srcPcap)
    assert(r.sessions == expected.count())
    assert(r.pcapPath.startsWith(pcapDir))

    val stored = SessionStore.read(spark, store)
    assert(stored.count() == r.sessions)
    // comma values split into separate tags, like the reference
    assert(Upload.sanitizeTags(Seq("malware,exe", "bad tag!!")) ==
      Seq("malware", "exe", "badtag"))
    // tags sanitized ([^-a-zA-Z0-9_:] stripped) and applied to every row
    assert(stored.filter(array_contains(col("tags"), "uploaded") &&
      array_contains(col("tags"), "badtag")).count() == r.sessions)
    // fileId references the durable copy (as the reader's file: URI),
    // not the deleted temp file
    val files = stored.select(explode(col("fileId"))).distinct()
      .as[String].collect()
    assert(files.nonEmpty && files.forall(f =>
      (if (f.startsWith("file:")) new java.net.URI(f).getPath else f)
        == r.pcapPath))
    // and the packet references resolve: export from the store round-trips
    val rows = stored.drop("day").as[SessionBuilder.SessionRow]
    val out = s"$dir/roundtrip.pcap"
    assert(PcapExport.writeFile(rows, out) > 0)
    assert(SessionBuilder.sessionize(spark, out).count() == r.sessions)
  }

  test("upload: a failed ingest never leaks a .upload-*.tmp in the pcap dir") {
    val dir = tmp("graft-upload-fail")
    val pcapDir = s"$dir/pcap"
    val posted = s"$dir/posted.pcap"
    Files.copy(Paths.get(srcPcap), Paths.get(posted))
    // force the final rename to fail deterministically: a NON-EMPTY
    // directory pre-exists at the durable name (Files.move cannot
    // replace it) — the copy itself succeeds, so the temp exists at the
    // moment of failure and must be cleaned up by the error path
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(Files.readAllBytes(Paths.get(posted)))
    val h = md.digest().take(4).map("%02x".format(_)).mkString
    val blocker = Paths.get(pcapDir, s"upl-$h-posted.pcap")
    Files.createDirectories(blocker)
    Files.write(blocker.resolve("occupant"), Array[Byte](1))
    intercept[java.nio.file.FileSystemException] {
      Upload.ingestWithPath(spark, posted, pcapDir, node = "upl")
    }
    val leaked = Files.list(Paths.get(pcapDir)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (leaked.hasNext) names += leaked.next().getFileName.toString
    assert(!names.exists(_.startsWith(".upload-")),
      s"temp file leaked: $names")
  }

  // ------------------------------------------------------------------
  // Forward
  // ------------------------------------------------------------------

  test("forwarded sessions carry their packets: dest store + pcap answer the same") {
    val dir = tmp("graft-forward")
    val dest = Forward.Cluster(s"$dir/store", s"$dir/pcap", node = "dc2")
    val sessions = SessionBuilder.sessionize(spark, srcPcap)

    val r = Forward.sendSessions(spark, sessions, dest, saveId = "batch 7!",
      tags = Seq("forwarded"))
    assert(r.sessions == sessions.count())
    assert(r.records == sessions.collect().map(_.totPackets).sum)
    // sanitization changed the raw saveId -> short content hash appended
    assert(r.pcapPath.matches(".*dc2-batch7-[0-9a-f]{8}\\.pcap"))

    val fwd = SessionStore.read(spark, dest.storePath)
    assert(fwd.count() == r.sessions)
    assert(fwd.filter(col("node") === "dc2").count() == r.sessions)
    assert(fwd.filter(array_contains(col("tags"), "forwarded")).count()
      == r.sessions)

    // every rewritten (fileId, packetPos, packetLen) must yield the exact
    // source record bytes — the receiveSession offset rewrite contract
    val fwdRows = fwd.drop("day").as[SessionBuilder.SessionRow]
    val srcRecs = PcapExport.records(sessions)
      .select("sessionId", "seq", "record").as[(String, Int, Array[Byte])]
      .collect().map(r => (r._1, r._2) -> r._3.toSeq).toMap
    val fwdRecs = PcapExport.records(fwdRows)
      .select("sessionId", "seq", "record").as[(String, Int, Array[Byte])]
      .collect()
    assert(fwdRecs.length == srcRecs.size)
    fwdRecs.foreach { case (sid, seq, rec) =>
      assert(rec.toSeq == srcRecs((sid, seq)), s"record $sid/$seq differs")
    }
    // and the forwarded store re-sessionizes to the same content
    val out = s"$dir/fwd-export.pcap"
    PcapExport.writeFile(fwdRows, out)
    assert(SessionBuilder.sessionize(spark, out).toDF()
      .select("sessionId", "totBytes", "srcPayload8").collect().toSet ==
      sessions.toDF().select("sessionId", "totBytes", "srcPayload8")
        .collect().toSet)
  }

  test("cron forward: action copies only the window's matches; replay idempotent on pcap") {
    val dir = tmp("graft-cronfwd")
    val srcStore = s"$dir/src"
    val dest = Forward.Cluster(s"$dir/dst", s"$dir/dstpcap", node = "dc2")
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    SessionStore.write(sessions, srcStore)

    val t0 = sessions.collect().map(_.firstPacket).min / 1000L
    val t1 = sessions.collect().map(_.lastPacket).max / 1000L + 1
    val mem = new Notifier.Memory
    val qs = Seq(CronQuery("fwd-socks", "protocols == socks",
      Seq("xcluster"), lpValue = t0 - 1, action = "forward:dc2",
      notifier = Some("mem")))

    val s1 = CronQueries.processOnce(spark, srcStore, qs, nowSec = t1,
      notifiers = Map("mem" -> mem), clusters = Map("dc2" -> dest))
    val expected = sessions.filter(_.protocol.contains("socks")).count()
    assert(s1.head.count == expected && expected > 0)
    assert(mem.alerts.size == 1 &&
      mem.alerts.head._2.contains(s"$expected new"))

    val fwd = SessionStore.read(spark, dest.storePath)
    assert(fwd.count() == expected)
    assert(fwd.filter(array_contains(col("protocol"), "socks")).count()
      == expected)
    assert(fwd.filter(array_contains(col("tags"), "xcluster")).count()
      == expected)

    // replay the same window: same saveId -> same pcap file overwritten
    // AND the SPI rows replaced, not duplicated (the fwd:<saveId>
    // marker purge)
    val pcaps1 = new java.io.File(s"$dir/dstpcap").list().toSet
    CronQueries.processOnce(spark, srcStore,
      Seq(s1.head.copy(lpValue = t0 - 1)), nowSec = t1,
      notifiers = Map("mem" -> mem), clusters = Map("dc2" -> dest))
    assert(new java.io.File(s"$dir/dstpcap").list().toSet == pcaps1)
    assert(SessionStore.read(spark, dest.storePath).count() == expected)
  }

  test("cron forward batching: window split into bounded deterministic batches") {
    val dir = tmp("graft-cronfwdb")
    val srcStore = s"$dir/src"
    val dest = Forward.Cluster(s"$dir/dst", s"$dir/dstpcap", node = "dc2")
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    SessionStore.write(sessions, srcStore)
    val t0 = sessions.collect().map(_.firstPacket).min / 1000L
    val t1 = sessions.collect().map(_.lastPacket).max / 1000L + 1
    val total = sessions.count()
    val qs = Seq(CronQuery("fwd-all", "protocols == tcp", Seq("x"),
      lpValue = t0 - 1, action = "forward:dc2"))
    // batch size 1 -> one send (and one pcap) per session
    val s1 = CronQueries.processOnce(spark, srcStore, qs, nowSec = t1,
      clusters = Map("dc2" -> dest), forwardBatch = 1L)
    assert(s1.head.count == total)
    val pcaps = new java.io.File(s"$dir/dstpcap").list().toSet
    assert(pcaps.size == total)
    // the batched forward still lands every session + its packets
    val fwd = SessionStore.read(spark, dest.storePath)
    assert(fwd.count() == total)
    val fwdRows = fwd.drop("day").as[SessionBuilder.SessionRow]
    assert(PcapExport.records(fwdRows).count() ==
      sessions.collect().map(_.totPackets).sum)
    // replay reproduces the identical batch files and row counts
    CronQueries.processOnce(spark, srcStore,
      Seq(s1.head.copy(lpValue = t0 - 1)), nowSec = t1,
      clusters = Map("dc2" -> dest), forwardBatch = 1L)
    assert(new java.io.File(s"$dir/dstpcap").list().toSet == pcaps)
    assert(SessionStore.read(spark, dest.storePath).count() == total)
  }

  test("cron notifier throttle: one alert per 600s, resumes after") {
    val dir = tmp("graft-cronnote")
    // minimal store shape: the tag action only needs these columns
    Seq(
      (1L, "2024-01-01", 1704067800000L, 1704067860000L,
        Seq("http"), Seq.empty[String]), // day+600
      (2L, "2024-01-01", 1704070400000L, 1704070460000L,
        Seq("http"), Seq.empty[String]), // day+3200
      (3L, "2024-01-01", 1704080200000L, 1704080260000L,
        Seq("http"), Seq.empty[String])) // day+13000
      .toDF("id", "day", "firstPacket", "lastPacket", "protocol", "tags")
      .write.partitionBy("day").parquet(s"$dir/store")
    val mem = new Notifier.Memory
    val notifiers = Map("mem" -> mem)
    val day = 1704067200L
    val q0 = CronQuery("watch", "protocols == http", Seq("hit"),
      lpValue = day, notifier = Some("mem"))

    // pass 1 at day+3000: session 1 matched -> alert
    val s1 = CronQueries.processOnce(spark, s"$dir/store", Seq(q0),
      nowSec = day + 3000, chunkSecs = 3600, notifiers = notifiers)
    assert(mem.alerts.size == 1 && s1.head.lastNotifiedCount == 1)
    // pass 2 at day+3500 (< 600s since alert): session 2 matched, throttled
    val s2 = CronQueries.processOnce(spark, s"$dir/store", s1,
      nowSec = day + 3500, chunkSecs = 3600, notifiers = notifiers)
    assert(mem.alerts.size == 1 && s2.head.count == 2)
    // pass 3 at day+13500 (> 600s): session 3 matched -> alert covering
    // the 2 sessions since the last notification
    val s3 = CronQueries.processOnce(spark, s"$dir/store", s2,
      nowSec = day + 13500, chunkSecs = 86400, notifiers = notifiers)
    assert(mem.alerts.size == 2)
    assert(mem.alerts(1)._2.contains("2 new"))
    assert(s3.head.count == 3 && s3.head.lastNotifiedCount == 3)
    // pass 4: no new matches -> no alert even past the throttle
    val s4 = CronQueries.processOnce(spark, s"$dir/store", s3,
      nowSec = day + 20000, chunkSecs = 86400, notifiers = notifiers)
    assert(mem.alerts.size == 2 && s4.head.count == 3)
  }
}
