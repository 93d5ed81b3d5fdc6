package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder
import graft.model.Fixtures

/** Corpus-wide fidelity for the bundled enrichment dimensions: every
  * golden srcOui/dstOui/srcRIR/dstRIR and source/destination geo+AS
  * value must be reproduced from the bundled fixtures
  * (capture/db.c:695-780 emits these at save).
  */
class EnrichFixtureSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()
  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    if (n == null) Nil else n.elements().asScala.map(_.asText()).toSeq

  test("OUI / RIR / geo / ASN match goldens across the corpus") {
    val dir = new java.io.File("/root/reference/tests/pcap")
    var sessions = 0
    var checked = 0
    val bad = Seq.newBuilder[String]
    dir.listFiles().filter(_.getName.endsWith(".pcap")).map(_.getPath).sorted
      .foreach { p =>
        val name = new java.io.File(p).getName.stripSuffix(".pcap")
        val goldenFile = new java.io.File(s"$dir/$name.test")
        if (goldenFile.exists()) {
          val bodies =
            try mapper.readTree(goldenFile).get("sessions3")
              .elements().asScala.map(_.get("body")).toSeq
            catch { case _: Exception => Nil }
          // only compare where sessionization is 1:1 comparable: match
          // sessions by (packets, bytes) signature when unique
          val got = SessionBuilder.sessionizeRef(spark, p).collect()
          val bySig = got.groupBy(r => (r.totPackets, r.totBytes))
          bodies.foreach { b =>
            sessions += 1
            val sig = (b.get("network").get("packets").asLong(),
              b.get("network").get("bytes").asLong())
            bySig.get(sig).filter(_.length == 1).map(_.head).foreach { r =>
              checked += 1
              // a few captures pick the opposite initiator than the
              // reference (response-only flows); align sides by IP
              val goldenSrcIp = Option(b.get("source"))
                .flatMap(s => Option(s.get("ip"))).map(_.asText())
              val flip = goldenSrcIp.contains(r.dstIp) &&
                !goldenSrcIp.contains(r.srcIp)
              val (mSrcOui, mDstOui) =
                if (flip) (r.dstOui, r.srcOui) else (r.srcOui, r.dstOui)
              val (mSrcRIR, mDstRIR) =
                if (flip) (r.dstRIR, r.srcRIR) else (r.srcRIR, r.dstRIR)
              val (mSrcC, mDstC) =
                if (flip) (r.dstCountry, r.srcCountry) else (r.srcCountry, r.dstCountry)
              val (mSrcA, mDstA) =
                if (flip) (r.dstAsn, r.srcAsn) else (r.srcAsn, r.dstAsn)
              // goldens are multi-vintage: compare a key only when the
              // golden carries it (older dumps predate oui/rir/geo files)
              def cmp(what: String, mine: Seq[String],
          golden: Option[Seq[String]]): Unit =
                golden.foreach { g =>
                  if (mine.sorted != g.sorted)
                    bad += s"$name $what mine=${mine.sorted} golden=${g.sorted}"
                }
              def opt(key: String): Option[Seq[String]] =
                Option(b.get(key)).map(n =>
                  if (n.isArray) strs(n) else Seq(n.asText()))
              cmp("srcOui", mSrcOui, opt("srcOui"))
              cmp("dstOui", mDstOui, opt("dstOui"))
              cmp("srcRIR", Option(mSrcRIR).toSeq, opt("srcRIR"))
              cmp("dstRIR", Option(mDstRIR).toSeq, opt("dstRIR"))
              def geo(side: String) = Option(b.get(side))
                .flatMap(s => Option(s.get("geo")))
                .flatMap(g => Option(g.get("country_iso_code")))
                .map(n => Seq(n.asText()))
              def asFull(side: String) = Option(b.get(side))
                .flatMap(s => Option(s.get("as")))
                .flatMap(a => Option(a.get("full")))
                .map(n => Seq(n.asText()))
              cmp("srcCountry", Option(mSrcC).toSeq, geo("source"))
              cmp("dstCountry", Option(mDstC).toSeq, geo("destination"))
              cmp("srcAsn", Option(mSrcA).toSeq, asFull("source"))
              cmp("dstAsn", Option(mDstA).toSeq, asFull("destination"))
            }
          }
        }
      }
    val mismatches = bad.result()
    info(s"enrichment-checked sessions: $checked / $sessions golden sessions")
    info(s"mismatches: ${mismatches.size}")
    mismatches.take(25).foreach(info(_))
    assert(mismatches.isEmpty,
      s"${mismatches.size} enrichment mismatches (first: ${mismatches.headOption})")
  }

  test("fixture point lookups") {
    assert(Fixtures.rirOf("8.8.8.8").contains("ARIN"))
    assert(Fixtures.rirOf("193.1.2.3").contains("RIPE"))
    assert(Fixtures.rirOf("10.1.2.3").isEmpty) // private: no RIR
    // only the [override-ips] entry for 10.0.0.2 carries rir:TEST —
    // other 10.x addresses get no RIR even in test mode (config.test.ini)
    assert(Fixtures.rirOf("10.0.0.2", testMode = true).contains("TEST"))
    assert(Fixtures.rirOf("10.1.2.3", testMode = true).isEmpty)
    assert(Fixtures.rirOf("2001:db8::1").isEmpty)
    assert(Fixtures.ouiOf("00:0C:29:12:34:56").contains("VMware, Inc."))
    assert(Fixtures.ouiOf("ff:ff:ff:ff:ff:ff").isEmpty)
    val g = Fixtures.asnGeoOf("8.8.8.8").get
    assert(g.full.contains("AS15169 Google LLC") && g.country.contains("US"))
    // test-mode private-space entries stay out of production lookups
    assert(Fixtures.asnGeoOf("10.0.0.1").isEmpty)
    assert(Fixtures.asnGeoOf("10.0.0.1", testMode = true)
      .flatMap(_.org).contains("This is neat"))
  }
  test("enrichment and round-4 fields are queryable through the expression language") {
    import graft.expr.Compiler
    import graft.etl.SessionBuilder
    val c = new Compiler(graft.model.FieldRegistry.sessions,
      graft.model.FieldRegistry.sessionCol, SparkEntry.now)
    val dns = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/dns-udp.pcap").toDF()
    def n(df: org.apache.spark.sql.DataFrame, e: String): Long =
      df.filter(c.compile(e)).count()
    assert(n(dns, "asn.dns == \"as36459 github, inc.\"") >= 1)
    assert(n(dns, "country.dns == US") >= 1)
    assert(n(dns, "rir.dns == ARIN") >= 1)
    assert(n(dns, "asn == *github*") >= 1) // meta-field sweep
    assert(n(dns, "dns.host.cnt >= 1") >= 1)   // FLAG_CNT companion
    val mx = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/dns-wiresharkrepo.pcap").toDF()
    assert(n(mx, "ip.dns.mailserver == EXISTS!") >= 1)
    assert(n(mx, "asn.dns.mailserver == \"as15169 google llc\"") >= 1)
    val gre = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/gre-sample.pcap").toDF()
    assert(n(gre, "gre.ip == 66.59.109.137") >= 1)
    assert(n(gre, "asn.gre == *cumberland*") >= 1)
    val xff = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/http-xff.pcap").toDF()
    assert(n(xff, "ip.xff == 10.0.0.3") == 1)
    val smtp = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/smtp-zip.pcap").toDF()
    assert(n(smtp, "email.md5 == EXISTS!") >= 1)
    assert(n(smtp, "email.fn == EXISTS!") >= 1)
  }

}
