package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LiveStats

/** The streaming rollups must equal their batch twins once the watermark
  * closes the windows.
  */
class LiveStatsSpec extends AnyFunSuite with SparkSpecBase {

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("watermarked time histogram equals the batch histogram") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val rows = Seq(
      (ts(0), "a", 10.0), (ts(1), "b", 5.0), (ts(2), "a", 1.0),   // bucket 0
      (ts(5), "a", 2.0), (ts(6), "b", 7.0),                       // bucket 1
      (ts(11), "a", 4.0))                                         // bucket 2
    val input = MemoryStream[(Timestamp, String, Double)]
    val hist = LiveStats.timeHistogram(
      input.toDS().toDF("ts", "k", "v"), col("ts"), 300, "1 minute",
      sums = Map("sum_v" -> sum(col("v"))))
    val q = hist.writeStream.format("memory").queryName("live_hist")
      .outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      // advance the watermark past every bucket end
      input.addData(Seq((ts(60), "z", 0.0)))
      q.processAllAvailable()

      val streamed = spark.table("live_hist")
        .select("bucket", "sessions", "sum_v")
        .filter(col("sessions") > 0)
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val batch = rows.toDF("ts", "k", "v")
        .groupBy(window(col("ts"), "300 seconds"))
        .agg(count(lit(1)).as("sessions"), sum("v").as("sum_v"))
        .select(col("window.start"), col("sessions"), col("sum_v"))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming topTerms equals the batch top-K per finalized window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // 300 s windows align to the epoch, so use a 300 s-aligned base
    def ats(min: Int) = new Timestamp(1699999800000L + min * 60000L)
    // bucket 0: a×3 b×2 c×1 → top2 = a,b; bucket 1: c×2 a×1 → top2 = c,a
    val rows = Seq(
      (ats(0), "a"), (ats(1), "a"), (ats(2), "a"), (ats(1), "b"), (ats(2), "b"),
      (ats(3), "c"),
      (ats(5), "c"), (ats(6), "c"), (ats(7), "a"))
    val input = MemoryStream[(Timestamp, String)]
    val top = LiveStats.topTerms(
      input.toDS().toDF("ts", "term"), col("term"), col("ts"),
      300, "1 minute", k = 2)
    val q = top.writeStream.format("memory").queryName("live_top")
      .outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      input.addData(Seq((ats(60), "z")))
      q.processAllAvailable()
      val got = spark.table("live_top")
        .orderBy("bucket")
        .select(col("bucket"),
          transform(col("top"), s => s.getField("term")).as("terms"),
          transform(col("top"), s => s.getField("n")).as("ns"))
        .collect().map(r => (r.getSeq[String](1), r.getSeq[Long](2)))
      assert(got.length == 2)
      assert(got(0) == ((Seq("a", "b"), Seq(3L, 2L))))
      assert(got(1) == ((Seq("c", "a"), Seq(2L, 1L))))
    } finally q.stop()
  }

  test("dedupStream keeps first occurrence per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val input = MemoryStream[(Timestamp, String)]
    val deduped = LiveStats.dedupStream(
      input.toDS().toDF("ts", "k"), Seq("k"), col("ts"), "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("live_dedup")
      .outputMode("append").start()
    try {
      input.addData(Seq((ts(0), "x"), (ts(1), "x"), (ts(2), "y")))
      q.processAllAvailable()
      input.addData(Seq((ts(3), "x"), (ts(4), "z")))
      q.processAllAvailable()
      val keys = spark.table("live_dedup").select("k")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(keys == Seq("x", "y", "z"))
    } finally q.stop()
  }

  test("I13 streaming form: stream-static WISE join enriches micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val intel = Seq(
      ("10.0.0.1", "tags", "botnet"), ("10.0.0.1", "score", "9"),
      ("8.8.8.8", "tags", "dns"))
      .toDF("key", "field", "value")
    val input = MemoryStream[(Timestamp, String)]
    val enriched = graft.ops.Enrich.wiseLookup(
      input.toDS().toDF("ts", "srcIp"), col("srcIp"), intel)
    val q = enriched.writeStream.format("memory").queryName("live_wise")
      .outputMode("append").start()
    try {
      input.addData(Seq((ts(0), "10.0.0.1"), (ts(1), "1.1.1.1")))
      q.processAllAvailable()
      val out = spark.table("live_wise")
        .select("srcIp", "intel").collect()
        .map(r => r.getString(0) ->
          Option(r.getSeq[String](1)).map(_.sorted.toSeq)).toMap
      assert(out("10.0.0.1").contains(Seq("score=9", "tags=botnet")))
      assert(out("1.1.1.1").isEmpty) // left join: unknown ip passes through
    } finally q.stop()
  }

  test("alertJoinStream equals the batch alertSessionJoin on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sessRows = Seq(
      (10L, 0L, ts(0), ts(120)),   // alert at 60s lands inside
      (10L, 1L, ts(600), ts(660)), // no alert inside
      (11L, 0L, ts(0), ts(60)))    // different key
    val alertRows = Seq(
      (10L, ts(60), 100L),   // inside session (10, 0)
      (10L, ts(300), 101L),  // between sessions -> no match
      (11L, ts(30), 102L),   // inside (11, 0)
      (12L, ts(30), 103L))   // unknown key
    val sess = MemoryStream[(Long, Long, Timestamp, Timestamp)]
    val alerts = MemoryStream[(Long, Timestamp, Long)]
    val joined = graft.streaming.LiveStats.alertJoinStream(
      sess.toDS().toDF("key", "session_seq", "start_ts", "end_ts"),
      alerts.toDS().toDF("key", "alert_ts", "alert_id"),
      watermarkDelay = "10 minutes", maxSpan = "1 hour")
    val q = joined.writeStream.format("memory").queryName("alert_join")
      .outputMode("append").start()
    val got = try {
      sess.addData(sessRows); alerts.addData(alertRows)
      q.processAllAvailable()
      spark.table("alert_join").select("key", "session_seq", "alert_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally q.stop()
    assert(got == Set((10L, 0L, 100L), (11L, 0L, 102L)))
    // batch twin on the same data agrees
    val batch = graft.ops.Enrich.alertSessionJoin(
      sessRows.toDF("key", "session_seq", "start_ts", "end_ts")
        .select(col("key"), col("session_seq"),
          unix_timestamp(col("start_ts")).as("start_s"),
          unix_timestamp(col("end_ts")).as("end_s")),
      alertRows.toDF("key", "alert_ts", "alert_id")
        .select(col("key"), unix_timestamp(col("alert_ts")).as("alert_s"),
          col("alert_id")))
      .select("key", "session_seq", "alert_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == got)
  }

  test("DocPipeline ingest dedups within the watermark and gates quality") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val good = "the quick brown fox jumps over the lazy dog"
    val short = "too short"
    val rows = Seq(
      (ts(0), 1L, good),
      (ts(1), 2L, good),            // exact dup inside horizon -> dropped
      (ts(2), 3L, short),           // quality gate -> dropped
      (ts(3), 4L, "ein ganz anderes dokument und zwar auf deutsch bitte"))
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = graft.streaming.DocPipeline.ingest(
      input.toDS().toDF("ts", "doc_id", "text"), col("text"), "ts",
      "10 minutes", minTokens = 5)
    val q = out.writeStream.format("memory").queryName("doc_ingest")
      .outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val got = spark.table("doc_ingest")
        .select("doc_id", "lang_guess", "n_tokens", "fingerprint")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got.map(_._1) == Seq(1L, 4L))
      assert(got(0)._2 == "en" && got(1)._2 == "de")
      assert(got(0)._3 == 9L)
      // enrichment equals the batch twin on the same rows
      val batch = graft.streaming.DocPipeline.enrich(
        rows.toDF("ts", "doc_id", "text"), col("text"))
        .filter(col("doc_id") === 1L).select("fingerprint", "mean_token_len")
        .head
      val streamed = spark.table("doc_ingest")
        .filter(col("doc_id") === 1L).select("fingerprint", "mean_token_len")
        .head
      assert(batch == streamed)
    } finally q.stop()
  }

  test("DocPipeline ingest: canonical-URL dedup + Gopher gate, batch-equal") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val stopPad = "the be to of and that have with "
    val good = (stopPad +
      (1 to 52).map(i => s"topic${i}word").mkString(" ")).trim
    val good2 = (stopPad +
      (1 to 52).map(i => s"other${i}word").mkString(" ")).trim
    val repetitive = (stopPad + ("spam ham " * 40)).trim
    val rows = Seq(
      // same page, cosmetically different URL, CHANGED content → url-dup
      (ts(0), 1L, good, "http://www.Site.com/p?utm_source=x&a=1"),
      (ts(1), 2L, good2, "http://site.com/p/?a=1"),
      // distinct page, passes everything
      (ts(2), 3L, good2, "http://site.com/q"),
      // distinct page, fails the Gopher repetition rule
      (ts(3), 4L, repetitive, "http://site.com/r"))
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val out = graft.streaming.DocPipeline.ingest(
      input.toDS().toDF("ts", "doc_id", "text", "url"), col("text"), "ts",
      "10 minutes", minTokens = 5, urlCol = Some(col("url")), gopher = true)
    val q = out.writeStream.format("memory").queryName("doc_ingest_url")
      .outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val got = spark.table("doc_ingest_url")
      // doc 2 fell to URL dedup (canonical equals doc 1's, content
      // differs — the crawl-frontier contract); doc 3 survives (unique
      // URL, and doc 2 never reached the content-dedup state); doc 4
      // passes both dedups but fails the Gopher repetition rule
      assert(got.select("doc_id").as[Long].collect().sorted.toSeq
        == Seq(1L, 3L))
      // flags equal the batch twin on a surviving row
      val streamedFlags = got.filter(col("doc_id") === 1L)
        .select("gopher.ok_words", "gopher.ok_rep", "gopher.kept")
        .head.toSeq
      val batchFlags = graft.ops.TextOps.gopherGate(
        rows.toDF("ts", "doc_id", "text", "url"), col("text"), col("doc_id"))
        .filter(col("doc_id") === 1L)
        .select("ok_words", "ok_rep", "kept").head.toSeq
      assert(streamedFlags == batchFlags)
    } finally q.stop()
  }
}
