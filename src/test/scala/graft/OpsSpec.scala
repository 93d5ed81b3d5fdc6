package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder
import graft.expr.Compiler
import graft.model.FieldRegistry
import graft.ops.{Endpoints, Enrich, Hunt, Rules}

class OpsSpec extends AnyFunSuite with SparkSpecBase {

  test("asofJoin: latest earlier right row wins, equal ts matches, none -> null") {
    import spark.implicits._
    val left = Seq((1L, "k1", 100L), (2L, "k1", 205L), (3L, "k2", 50L))
      .toDF("id", "key", "t")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val right = Seq(("k1", 100L, "a"), ("k1", 200L, "b"), ("k2", 60L, "c"))
      .toDF("key", "t", "state")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val out = graft.ops.AsOf.asofJoin(left, col("key"), col("ts"),
      right, col("key"), col("ts"), Seq("state"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)).orNull))
    // id 1: right at SAME ts 100 matches (<= convention)
    // id 2: latest of {100, 200} = "b"
    // id 3: right only at 60 > 50 -> null
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, null)))
  }

  private lazy val sessions = SessionBuilder.sessionizeRef(spark,
    "/root/reference/tests/pcap/socks-http-example.pcap").cache()

  test("hunt: ascii needle finds example.com sessions, hex needle finds socks4 magic") {
    val hit = Hunt.run(sessions, Hunt.HuntConfig(
      Hunt.AsciiNeedle("example.com", caseSensitive = false)))
    assert(hit.filter(col("huntTag").isNotNull).count() == 3)
    val miss = Hunt.run(sessions, Hunt.HuntConfig(
      Hunt.AsciiNeedle("definitely-not-there", caseSensitive = false)))
    assert(miss.filter(col("huntTag").isNotNull).count() == 0)
    // socks4 CONNECT magic 0x0401 at stream start, src direction only
    val hex = Hunt.run(sessions, Hunt.HuntConfig(
      Hunt.HexNeedle("04010050"), src = true, dst = false))
    assert(hex.filter(col("huntTag").isNotNull).count() == 2)
    // regex
    val re = Hunt.run(sessions, Hunt.HuntConfig(
      Hunt.RegexNeedle("GET /[a-z]* HTTP")))
    assert(re.filter(col("huntTag").isNotNull).count() >= 1)
  }

  test("hunt: multi-file session reads each file's own offsets only") {
    // Two pcap files; flow X spans both. File 2 holds a foreign flow's
    // packet at the SAME offset as X's packet in file 1 — a bare offset
    // union (the old behavior) would scan that foreign payload as part of
    // session X and false-hit the needle.
    def udpPacket(srcIp: Array[Byte], dstIp: Array[Byte], sport: Int,
        dport: Int, payload: Array[Byte]): Array[Byte] = {
      val ipLen = 20 + 8 + payload.length
      val bb = java.nio.ByteBuffer.allocate(14 + ipLen)
      bb.put(Array.fill[Byte](12)(0x02)).putShort(0x0800.toShort) // eth
      bb.put(0x45.toByte).put(0.toByte).putShort(ipLen.toShort)
        .putShort(1.toShort).putShort(0.toShort)
        .put(64.toByte).put(17.toByte).putShort(0.toShort)
        .put(srcIp).put(dstIp)
      bb.putShort(sport.toShort).putShort(dport.toShort)
        .putShort((8 + payload.length).toShort).putShort(0.toShort)
      bb.put(payload)
      bb.array()
    }
    def pcapFile(records: Seq[(Long, Array[Byte])]): Array[Byte] = {
      val total = 24 + records.map(16 + _._2.length).sum
      val bb = java.nio.ByteBuffer.allocate(total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0xa1b2c3d4).putShort(2).putShort(4).putInt(0).putInt(0)
        .putInt(65535).putInt(1)
      records.foreach { case (sec, pkt) =>
        bb.putInt(sec.toInt).putInt(0).putInt(pkt.length).putInt(pkt.length)
        bb.put(pkt)
      }
      bb.array()
    }
    val ipA = Array[Byte](10, 0, 0, 1)
    val ipB = Array[Byte](10, 0, 0, 2)
    val ipC = Array[Byte](10, 0, 0, 3)
    val x1 = udpPacket(ipA, ipB, 1111, 2222,
      "x-first-packet".getBytes("ISO-8859-1"))
    val z1 = udpPacket(ipC, ipB, 3333, 4444,
      "SECRET-foreign-payload".getBytes("ISO-8859-1"))
    val x2 = udpPacket(ipA, ipB, 1111, 2222,
      "x-second-packet".getBytes("ISO-8859-1"))
    // pad z1's record so x1 (file1@24) and z1 (file2@24) share offset 24
    val dir = java.nio.file.Files.createTempDirectory("huntmf")
    java.nio.file.Files.write(dir.resolve("a.pcap"),
      pcapFile(Seq((1000L, x1))))
    java.nio.file.Files.write(dir.resolve("b.pcap"),
      pcapFile(Seq((1000L, z1), (1001L, x2))))
    val ses = SessionBuilder.sessionize(spark, dir.toString)
    val x = ses.filter(_.srcPort == 1111).collect()
    assert(x.length == 1 && x.head.fileId.length == 2)
    // needle only in the foreign flow: session X must NOT match
    val hunted = Hunt.run(ses, Hunt.HuntConfig(
      Hunt.AsciiNeedle("SECRET", caseSensitive = true)))
    val tags = hunted.select("srcPort", "huntTag").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(tags(3333).contains("hunt-match"))
    assert(tags(1111).isEmpty)
    // a needle in X's second file still hits via per-file offsets
    val hit2 = Hunt.run(ses, Hunt.HuntConfig(
      Hunt.AsciiNeedle("x-second", caseSensitive = true)))
    assert(hit2.filter(col("srcPort") === 1111 &&
      col("huntTag").isNotNull).count() == 1)
  }

  test("rules: tag-on-match, set-field, drop") {
    val df = sessions.toDF()
    val out = Rules.apply(df, Seq(
      Rules.Rule("tag-socks", array_contains(col("protocol"), "socks"),
        Seq(Rules.AddTag("proxy"))),
      Rules.Rule("mark-big", col("totBytes") > 2800,
        Seq(Rules.SetField("node", lit("bignode")))),
      Rules.Rule("drop-none", col("totPackets") > 1000,
        Seq(Rules.DropSession))))
    assert(out.filter(array_contains(col("tags"), "proxy")).count() == 3)
    assert(out.filter(col("node") === "bignode").count() ==
      df.filter(col("totBytes") > 2800).count())
    assert(out.count() == 3) // nothing dropped
    val dropped = Rules.apply(df, Seq(
      Rules.Rule("drop-socks", array_contains(col("protocol"), "socks"),
        Seq(Rules.DropSession))))
    assert(dropped.count() == 0)
  }

  test("enrich: cidr join sets country, wise lookup tags by ip") {
    import spark.implicits._
    val geo = Enrich.cidrJoin(sessions.toDF(), col("srcIp"),
      Seq("10.180.0.0/16" -> "US", "0.0.0.0/0" -> "XX"), "srcCountry")
    assert(geo.filter(col("srcCountry") === "US").count() == 3)
    val intel = Seq(("10.180.156.249", "threat", "proxy-node"))
      .toDF("key", "field", "value")
    val wise = Enrich.wiseLookup(sessions.toDF(), col("dstIp"), intel)
    assert(wise.filter(array_contains(col("intel"), "threat=proxy-node")).count() == 3)
  }

  test("enrich: cidr join is longest-prefix regardless of dim order") {
    import spark.implicits._
    val facts = Seq("10.1.2.3", "10.9.9.9", "8.8.8.8", "fd00::1")
      .toDF("ip")
    // least-specific FIRST on purpose: the /24 must still beat the /8,
    // the bare v4 host the /24, and the bare v6 host the v6 /8
    val dim = Seq(
      "0.0.0.0/0" -> "default",
      "10.0.0.0/8" -> "net8",
      "10.1.2.0/24" -> "net24",
      "10.1.2.3" -> "host",
      "fd00::/8" -> "v6net",
      "fd00::1" -> "v6host")
    val out = Enrich.cidrJoin(facts, col("ip"), dim, "label")
      .as[(String, String)].collect().toMap
    assert(out("10.1.2.3") == "host")
    assert(out("10.9.9.9") == "net8")
    assert(out("8.8.8.8") == "default")
    assert(out("fd00::1") == "v6host")
  }

  test("enrich: alert-session interval join matches across buckets, bounds inclusive") {
    import spark.implicits._
    // session spanning 3 hourly buckets; alert at exact start/end included
    val sess = Seq(
      (10L, 0L, 1000L, 8000L),   // spans buckets 0,1,2 at bucket=3600
      (10L, 1L, 20000L, 20010L),
      (11L, 0L, 1000L, 2000L)
    ).toDF("key", "session_seq", "start_s", "end_s")
    val alerts = Seq(
      (10L, 1000L, 100L),  // at start boundary
      (10L, 7500L, 101L),  // mid, second bucket
      (10L, 8000L, 102L),  // at end boundary
      (10L, 9999L, 103L),  // between sessions -> no match
      (11L, 1500L, 104L),
      (12L, 1500L, 105L)   // unknown key -> no match
    ).toDF("key", "alert_s", "alert_id")
    val out = Enrich.alertSessionJoin(sess, alerts, bucketSeconds = 3600)
      .select("key", "session_seq", "alert_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((10L, 0L, 100L), (10L, 0L, 101L), (10L, 0L, 102L),
      (11L, 0L, 104L)))
  }

  test("enrich: packet dedup drops same-hash rows in window") {
    import spark.implicits._
    val df = Seq(
      (1L, "h1", "2024-01-01 00:00:00"),
      (2L, "h1", "2024-01-01 00:00:01"), // dup of h1 in same window
      (3L, "h1", "2024-01-01 01:00:00"), // h1 again, next window
      (4L, "h2", "2024-01-01 00:00:00")
    ).toDF("id", "hash", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = Enrich.dedupPackets(df, Seq("hash"), col("ts"), 60)
    assert(out.count() == 3)
  }

  test("es doc shaping produces parseable nested json") {
    val docs = Enrich.toEsDocs(sessions.toDF()).collect()
    assert(docs.length == 3)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    docs.foreach { r =>
      val node = mapper.readTree(r.getString(0))
      assert(node.get("source").has("ip"))
      assert(node.get("network").has("community_id"))
    }
  }

  test("compiler: transforms (dash2Colon on mac, ipProtocolLookup)") {
    val c = new Compiler(FieldRegistry.sessions, FieldRegistry.sessionCol,
      SparkEntry.now)
    // dash-separated mac folded to colon form + lowercase
    assert(sessions.toDF().filter(
      c.compile("mac.src == 00-1F-5B-FF-51-CB")).count() == 3)
    assert(sessions.toDF().filter(c.compile("ip.protocol == tcp")).count() == 3)
    assert(sessions.toDF().filter(c.compile("ip.protocol == udp")).count() == 0)
  }

  test("compiler: view recursion guard") {
    val c = new Compiler(FieldRegistry.events, now = SparkEntry.now,
      views = Map("a" -> "view == b", "b" -> "view == a"))
    assertThrows[IllegalArgumentException](c.compile("view == a"))
  }

  test("spiview over multiple fields ranks per field") {
    val ev = Tables.load(spark, sf, "events")
    val out = Endpoints.spiview(ev, Seq("event_type", "user_id"), 3).collect()
    assert(out.map(_.getString(0)).distinct.sorted.toSeq == Seq("event_type", "user_id"))
    assert(out.count(_.getString(0) == "event_type") == 3)
  }

  test("spiview counts array fields per element, not per array rendering") {
    import spark.implicits._
    val df = Seq(
      (Seq("tcp", "http"), "a"),
      (Seq("tcp"), "b"),
      (Seq.empty[String], "c"))
      .toDF("protocol", "k")
    val out = Endpoints.spiview(df, Seq("protocol", "k"), 5).collect()
    val prot = out.filter(_.getString(0) == "protocol")
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(prot == Map("tcp" -> 2L, "http" -> 1L),
      s"per-element counts expected, got $prot")
    assert(out.count(_.getString(0) == "k") == 3)
  }

  test("E11 CSV export round-trips values with quoting and header") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = Seq((1L, "plain", "with,comma"), (2L, "q\"uote", "line"))
      .toDF("id", "a", "b")
    Endpoints.writeCsv(df, dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getString(2) == "with,comma")
    assert(back(1).getString(1) == "q\"uote")
  }

  test("E17 history entries accumulate as an append-only queryable log") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    Endpoints.recordHistory(spark, dir, "u1", "/api/sessions",
      "ip == 1.2.3.4", 12L, nowSec = 1700000000L)
    Endpoints.recordHistory(spark, dir, "u2", "/api/unique",
      "port == 80", 7L, nowSec = 1700000001L)
    // rows are listable through the REAL history API (the old stub's
    // ad-hoc schema was invisible to History.list)
    val (rows, total) = graft.query.History.list(spark, dir,
      userId = "admin", isAdmin = true)
    assert(total == 2)
    val u2 = rows.filter(org.apache.spark.sql.functions
      .col("userId") === "u2").collect()
    assert(u2.length == 1)
    assert(u2.head.getAs[String]("expression") == "port == 80")
    assert(u2.head.getAs[String]("uiPage") == "unique")
  }

  test("hierarchy on a fractional-typed level keeps distinct values") {
    import spark.implicits._
    // regression: cast("long") collapsed 1.2/1.7 to 1 and the cast-back
    // semi-join key matched nothing -> empty result
    val df = Seq(("tcp", 1.2), ("tcp", 1.2), ("tcp", 1.7), ("udp", 3.5))
      .toDF("proto", "ratio")
    val h = graft.ops.Endpoints.hierarchy(df, Seq("proto", "ratio"), 3)
      .collect()
    assert(h.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet ==
      Set(("tcp", 1.2, 2L), ("tcp", 1.7, 1L), ("udp", 3.5, 1L)))
  }

  test("timeHistogram floors pre-1970 timestamps into their own bucket") {
    import spark.implicits._
    val df = Seq(-30L, 30L).toDF("s")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds(
        org.apache.spark.sql.functions.col("s")))
    val b = graft.ops.Endpoints.timeHistogram(df, col("ts"), 60)
      .select(org.apache.spark.sql.functions.unix_timestamp(col("bucket")))
      .as[Long].collect().sorted.toSeq
    // cast-truncation would merge both rows into bucket 0
    assert(b == Seq(-60L, 0L))
  }
}
