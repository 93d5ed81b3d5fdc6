package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tagger

class TaggerSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, "10.1.2.3", "8.8.8.8", Seq("www.evil.example", "ok.com"),
        Seq("aa11"), Seq("pre")),
      (2L, "192.168.0.7", "10.1.9.9", Seq("evil.example"), Seq.empty[String],
        Seq.empty[String]),
      (3L, "172.16.0.1", "172.16.0.2", Seq("deep.www.evil.example"),
        Seq("bb22"), Seq.empty[String]),
      (4L, null, "1.1.1.1", null, null, null)
    ).toDF("id", "srcIp", "dstIp", "httpHost", "httpMd5", "tags")
  }

  private val entries = Seq(
    Tagger.Entry("ip", "10.0.0.0/8", Seq("rfc1918-10")),
    Tagger.Entry("ip", "10.1.2.0/24", Seq("watchlist")), // nested prefix also fires
    Tagger.Entry("domain", "evil.example", Seq("bad-domain")),
    Tagger.Entry("md5", "aa11", Seq("known-file")))

  test("tagger: all covering CIDRs fire, domain strips one label, md5 exact") {
    val out = Tagger.tag(df, entries)
      .select("id", "tags").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    // id 1: 10.1.2.3 in both CIDRs; www.evil.example strips to evil.example;
    // md5 aa11; existing tag "pre" kept
    assert(out(1L) == Seq("bad-domain", "known-file", "pre", "rfc1918-10", "watchlist"))
    // id 2: dstIp 10.1.9.9 only in /8; exact domain match
    assert(out(2L) == Seq("bad-domain", "rfc1918-10"))
    // id 3: deep.www.evil.example strips ONE label -> www.evil.example: no
    // match (the reference walks a single level); md5 bb22 not listed
    assert(out(3L) == Seq())
    // id 4: null columns are safe
    assert(out(4L) == Seq())
  }
}
