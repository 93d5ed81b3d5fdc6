package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Wise

/** WISE service semantics (wiseService/simpleSource.js, capture/plugins/
  * wise.c): typed multi-source lookups — exact-first domain fallback,
  * longest-prefix CIDR matching, per-type exclusions, source tags.
  */
class WiseSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def domainSources = Seq(
    Wise.Source("a", "domain",
      Seq(("example.com", "sev", "low"),
        ("www.example.com", "sev", "high"),
        ("evil.net", "sev", "crit")).toDF("key", "field", "value"),
      tags = Seq("src-a")),
    Wise.Source("b", "domain",
      Seq(("example.com", "cat", "ads")).toDF("key", "field", "value")))

  test("domain: exact match shadows the stripped parent per source") {
    val facts = Seq(
      (1L, "www.example.com"), // a: exact 'high' shadows parent 'low'; b: parent 'ads'
      (2L, "mail.example.com"), // a: parent 'low'; b: parent 'ads'
      (3L, "example.com"), // exact in both
      (4L, "other.org") // no hits
    ).toDF("id", "host")
    val out = Wise.lookup(facts, col("id"), col("host"), "domain",
      domainSources)
      .orderBy("id", "source", "field")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "a", "sev", "high"), (1L, "b", "cat", "ads"),
      (2L, "a", "sev", "low"), (2L, "b", "cat", "ads"),
      (3L, "a", "sev", "low"), (3L, "b", "cat", "ads")))
  }

  test("domain: protocol prefix is stripped and suffix excludes drop rows") {
    val facts = Seq(
      (1L, "https://www.example.com"),
      (2L, "http://evil.net"),
      (3L, "sub.evil.net") // excluded by suffix
    ).toDF("id", "host")
    val out = Wise.lookup(facts, col("id"), col("host"), "domain",
      domainSources, excludes = Seq(".evil.net"))
      .orderBy("id", "source", "field").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSeq
      == Seq((1L, "a", "high"), (1L, "b", "ads"), (2L, "a", "crit")))
  }

  test("cidr: most-specific entry wins within a source, sources independent") {
    val geo = Wise.Source("geo", "ip", Seq(
      ("10.0.0.0/8", "scope", "corp"),
      ("10.5.0.0/16", "scope", "lab"),
      ("10.5.7.0/24", "scope", "rack")).toDF("key", "field", "value"))
    val threat = Wise.Source("threat", "ip", Seq(
      ("10.0.0.0/8", "threat", "watch")).toDF("key", "field", "value"))
    val facts = Seq(
      (1L, "10.5.7.9"), // geo: /24 rack; threat: /8 watch
      (2L, "10.5.8.1"), // geo: /16 lab
      (3L, "10.9.0.1"), // geo: /8 corp
      (4L, "11.0.0.1") // none
    ).toDF("id", "ip")
    val out = Wise.lookupIp(facts, col("id"), col("ip"),
      Seq(geo, threat))
      .orderBy("id", "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, "geo", "10.5.7.0/24", "rack"),
      (1L, "threat", "10.0.0.0/8", "watch"),
      (2L, "geo", "10.5.0.0/16", "lab"),
      (2L, "threat", "10.0.0.0/8", "watch"),
      (3L, "geo", "10.0.0.0/8", "corp"),
      (3L, "threat", "10.0.0.0/8", "watch")))
  }

  test("bare-IP intel keys are /32; v6 facts and keys are non-matches, not crashes") {
    val threat = Wise.Source("threat", "ip", Seq(
      ("1.2.3.4", "risk", "bad"), // plain-IP feed entry -> /32
      ("10.0.0.0/8", "risk", "med"),
      ("::1/128", "risk", "v6")   // v6 intel: dropped by the v4 trie
    ).toDF("key", "field", "value"))
    val facts = Seq(
      (1L, "1.2.3.4"),  // exact /32 hit
      (2L, "1.2.3.5"),  // neighbor: no /32 match
      (3L, "::ffff:1"), // v6 fact: skipped (previously ANSI cast crash)
      (4L, "garbage")   // malformed: skipped
    ).toDF("id", "ip")
    val out = Wise.lookupIp(facts, col("id"), col("ip"), Seq(threat))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(4)))
    assert(out.toSeq == Seq((1L, "1.2.3.4", "bad")))
  }

  test("hitTags unions source tags per fact with set semantics") {
    val facts = Seq((1L, "www.example.com"), (2L, "example.com"))
      .toDF("id", "host")
    val hits = Wise.lookup(facts, col("id"), col("host"), "domain",
      domainSources)
    val tags = Wise.hitTags(hits, domainSources)
      .orderBy("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // only source 'a' has tags; both facts hit source a once
    assert(tags.toSeq == Seq((1L, "src-a"), (2L, "src-a")))
  }

  test("url-json source adapter loads a feed and matches the in-memory path") {
    // a source.url.js-style feed: arrayPath into the items, dotted
    // keyPath, field defs with shortcuts and case folds, tags
    val feed = """{"meta":{"v":1},"data":[
      {"indicator":{"domain":"Bad.Example.com"},"mal":{"type":"C2"},"score":9},
      {"indicator":{"domain":"evil.org"},"mal":{"type":"Phish"},"score":""},
      {"indicator":{"domain":"noinfo.net"}},
      {"indicator":{"domain":["multi.io","alias.io"]},"score":3},
      {"indicator":{}},
      {"other":true}]}"""
    val f = java.nio.file.Files.createTempFile("wise-feed", ".json")
    java.nio.file.Files.write(f, feed.getBytes("UTF-8"))
    val src = Wise.fromJsonUrl(spark, "feed", "domain", f.toString,
      keyPath = "indicator.domain", arrayPath = Some("data"),
      fieldDefs = Seq(
        "field:mal.type;db:mal.type;kind:lotermfield;friendly:Type;shortcut:mal.type",
        "field:score;db:score;kind:integer;shortcut:score",
        "view:require:mal" /* UI-side, skipped */),
      tags = Seq("intel-feed"))
    assert(src.typ == "domain" && src.tags == Seq("intel-feed"))
    val got = src.entries.orderBy("key", "field").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("Bad.Example.com", "mal.type", "c2"), // lotermfield folds the VALUE
      ("Bad.Example.com", "score", "9"),
      ("alias.io", "score", "3"), // array key fans out
      ("evil.org", "mal.type", "phish"), // empty score skipped
      ("multi.io", "score", "3"),
      ("noinfo.net", null, null))) // key-only item still registers
    // the loaded source behaves exactly like the same entries in memory:
    // same lookup rows, same hitTags
    val facts = Seq((1L, "bad.example.com"), (2L, "sub.noinfo.net"),
      (3L, "clean.example")).toDF("id", "host")
    val inMem = src.copy(entries = Seq(
      ("bad.example.com", "mal.type", "c2"), ("bad.example.com", "score", "9"),
      ("alias.io", "score", "3"), ("evil.org", "mal.type", "phish"),
      ("multi.io", "score", "3"), ("noinfo.net", null, null))
      .toDF("key", "field", "value"))
    // feed keys keep their case; domain lookups fold the FACT side, so
    // compare via a lowercased copy of the loaded entries (the reference
    // folds domain keys at insert through its lotermfield db type)
    val loadedLc = src.copy(entries = src.entries
      .withColumn("key", lower(col("key"))))
    def rows(s: Wise.Source) =
      Wise.lookup(facts, col("id"), col("host"), "domain", Seq(s))
        .orderBy("id", "source", "field").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3))).toSeq
    assert(rows(loadedLc) == rows(inMem))
    assert(rows(loadedLc) == Seq(
      (1L, "feed", "mal.type", "c2"), (1L, "feed", "score", "9"),
      (2L, "feed", null, null)))
    def tagsOf(s: Wise.Source) =
      Wise.hitTags(Wise.lookup(facts, col("id"), col("host"), "domain",
        Seq(s)), Seq(s)).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(tagsOf(loadedLc) == tagsOf(inMem))
    assert(tagsOf(loadedLc) == Seq((1L, "intel-feed"), (2L, "intel-feed")))
  }

  test("url-json adapter: url-typed keys drop http:// and http GET works") {
    // reference load() strips a leading http:// from url-type keys
    // (simpleSource.js:148-151); https:// is kept
    val feed = """[{"u":"http://x.test/a","c":"bot"},
      {"u":"https://y.test/b","c":"mal"}]"""
    val f = java.nio.file.Files.createTempFile("wise-url", ".json")
    java.nio.file.Files.write(f, feed.getBytes("UTF-8"))
    val src = Wise.fromJsonUrl(spark, "u", "url", s"file://$f",
      keyPath = "u", fieldDefs = Seq("field:cat;shortcut:c"))
    val got = src.entries.orderBy("key").collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    assert(got == Seq(("https://y.test/b", "mal"), ("x.test/a", "bot")))
    // and over HTTP with a request header, like source.url.js
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenHeader: String = null
    server.createContext("/feed", exchange => {
      seenHeader = exchange.getRequestHeaders.getFirst("X-Api-Key")
      val body = feed.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val viaHttp = Wise.fromJsonUrl(spark, "u", "url",
        s"http://127.0.0.1:${server.getAddress.getPort}/feed",
        keyPath = "u", fieldDefs = Seq("field:cat;shortcut:c"),
        headers = Map("X-Api-Key" -> "sekrit"))
      assert(seenHeader == "sekrit")
      assert(viaHttp.entries.orderBy("key").collect()
        .map(r => (r.getString(0), r.getString(2))).toSeq == got)
    } finally server.stop(0)
  }

  test("lookup plan broadcasts the intel and never shuffles the fact scan on a fact key") {
    val facts = spark.range(1000).select(col("id"),
      concat(lit("h"), col("id") % 10, lit(".example.com")).as("host"))
    val plan = Wise.lookup(facts, col("id"), col("host"), "domain",
      domainSources).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
