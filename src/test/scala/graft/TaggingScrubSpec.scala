package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Scrub, Tagging}

/** addTags/removeTags (viewer/apiSessions.js:1480-1520, 2587-2661) and
  * pcap scrub / SPI delete (apiSessions.js:959-1085, pcap.js:254-284).
  */
class TaggingScrubSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("addTags unions with set semantics; unmatched rows untouched") {
    val df = Seq(
      (1L, Seq("http")), (2L, Seq("http", "seen")), (3L, null: Seq[String]))
      .toDF("id", "tags")
    val out = Tagging.addTags(df, col("id") =!= 3L, Seq("seen", "bad"))
      .orderBy("id").select("tags").as[Seq[String]].collect()
    assert(out(0) === Seq("http", "seen", "bad"))
    assert(out(1) === Seq("http", "seen", "bad")) // "seen" not duplicated
    assert(out(2) === null)                       // unmatched null stays null
  }

  test("removeTags diffs; emptied array stays an empty array, not null") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("b")), (3L, Seq("a")))
      .toDF("id", "tags")
    val out = Tagging.removeTags(df, col("id") < 3L, Seq("b"))
      .orderBy("id").select("tags").as[Seq[String]].collect()
    assert(out(0) === Seq("a"))
    assert(out(1) === Seq.empty)  // EXISTS! treats empty like null
    assert(out(2) === Seq("a"))   // unmatched untouched
  }

  test("rewriteMatchedDays rewrites only the matched days' partitions") {
    val dir = Files.createTempDirectory("graft-tagstore").resolve("store").toString
    val store = Seq(
      (1L, "2024-01-01", Seq("x")), (2L, "2024-01-01", Seq.empty[String]),
      (3L, "2024-01-02", Seq("x")), (4L, "2024-01-03", Seq.empty[String]))
      .toDF("id", "day", "tags")
    store.write.partitionBy("day").parquet(dir)
    val untouched = Paths.get(dir, "day=2024-01-03")
    val before = Files.list(untouched).iterator().next().toFile.lastModified()

    val days = Tagging.applyToStore(spark, dir,
      col("id").isin(1L, 3L), Seq("tagged"), add = true)
    assert(days.toSet === Set("2024-01-01", "2024-01-02"))

    val after = spark.read.parquet(dir)
    assert(after.count() === 4)
    val tagged = after.filter(array_contains(col("tags"), "tagged"))
      .select("id").as[Long].collect().sorted
    assert(tagged === Array(1L, 3L))
    // the day with no matches kept its original files
    val afterMod = Files.list(untouched).iterator().next().toFile.lastModified()
    assert(afterMod === before)
  }

  test("deleteSpiFromStore drops matched rows, leaves other days' files") {
    val dir = Files.createTempDirectory("graft-spidel").resolve("store").toString
    Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-02"))
      .toDF("id", "day").write.partitionBy("day").parquet(dir)
    val days = Scrub.deleteSpiFromStore(spark, dir, col("id") === 2L)
    assert(days === Seq("2024-01-01"))
    val left = spark.read.parquet(dir).select("id").as[Long].collect().sorted
    assert(left === Array(1L, 3L))
  }

  private def scrubbedCopy(entire: Boolean): (String, Array[Byte], Array[Byte]) = {
    val src = Paths.get("/root/reference/tests/pcap/socks-http-example.pcap")
    val dir = Files.createTempDirectory("graft-scrub")
    val dst = dir.resolve(s"scrub-$entire.pcap")
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    val before = Files.readAllBytes(dst)
    val sessions = graft.etl.SessionBuilder.sessionize(spark, dst.toString)
    Scrub.scrub(sessions, entire = entire, scrubBy = "tester").collect()
    (dst.toString, before, Files.readAllBytes(dst))
  }

  test("scrub overwrites L4 payloads in place, keeps pcap structure") {
    val (path, before, after) = scrubbedCopy(entire = false)
    assert(after.length === before.length)
    // global header + all record headers untouched
    assert(after.slice(0, 24).sameElements(before.slice(0, 24)))
    // the file still parses to the same sessions (headers intact), but
    // payload-derived fields are gone: re-sessionize and compare
    val re = graft.etl.SessionBuilder.sessionize(spark, path)
      .toDF().select("sessionId", "totPackets", "totBytes").orderBy("sessionId")
    val orig = graft.etl.SessionBuilder.sessionize(spark,
      "/root/reference/tests/pcap/socks-http-example.pcap")
      .toDF().select("sessionId", "totPackets", "totBytes").orderBy("sessionId")
    assert(re.collect().toSeq === orig.collect().toSeq)
    // payload bytes got the final "Scrubbed! Hoot! " pass
    assert(new String(after, java.nio.charset.StandardCharsets.US_ASCII)
      .contains("Scrubbed! Hoot! "))
    assert(!new String(after, java.nio.charset.StandardCharsets.US_ASCII)
      .contains("GET /"))
    assert(new String(before, java.nio.charset.StandardCharsets.US_ASCII)
      .contains("GET /"))
  }

  test("scrub entire=true wipes everything after each record header") {
    val (_, before, after) = scrubbedCopy(entire = true)
    assert(after.length === before.length)
    assert(after.slice(0, 24).sameElements(before.slice(0, 24)))
    // first record header survives byte-for-byte…
    assert(after.slice(24, 40).sameElements(before.slice(24, 40)))
    // …but its packet bytes don't: the final pass's first pattern byte
    // replaces the ethernet destination MAC (entire=true starts at 0)
    assert(after(40) === 'S'.toByte)
    val text = new String(after, java.nio.charset.StandardCharsets.US_ASCII)
    assert(text.contains("Scrubbed! Hoot! "))
    assert(!text.contains("GET /"))
  }

  test("SPI delete of a whole day drops the emptied partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fullday")
      .resolve("store").toString
    Seq((1L, "2024-01-01", Seq.empty[String]),
      (2L, "2024-01-02", Seq.empty[String]))
      .toDF("id", "day", "tags")
      .write.partitionBy("day").parquet(dir)
    // dynamic overwrite cannot represent an emptied partition — the
    // rewrite must drop the day directory itself
    graft.ops.Scrub.deleteSpiFromStore(spark, dir,
      org.apache.spark.sql.functions.col("day") === "2024-01-01")
    assert(!new java.io.File(s"$dir/day=2024-01-01").exists())
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq
      == Seq(2L))
  }
}
