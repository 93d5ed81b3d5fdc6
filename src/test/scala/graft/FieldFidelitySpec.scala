package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** Corpus-wide FIELD fidelity floor, one level deeper than
  * CorpusFidelitySpec's (packets, bytes) signatures: for every reference
  * pcap golden, compare the multiset over sessions of each extracted
  * field's sorted-distinct value set against the reference's sessions3
  * dump. Pins the achieved per-field level so extractor regressions fail
  * loudly, field by field.
  */
class FieldFidelitySpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()

  private def goldenVals(body: JsonNode, group: String, key: String): Seq[String] = {
    val g = body.get(group)
    if (g == null || g.get(key) == null) Nil
    else g.get(key).elements().asScala.map(_.asText()).toSeq.distinct.sorted
  }

  // (field label, golden (group, key), our extractor)
  private val fields: Seq[(String, (String, String),
      SessionBuilder.SessionRow => Seq[String])] = Seq(
    ("http.method", ("http", "method"), _.httpMethod),
    ("http.host", ("http", "host"), _.httpHost),
    ("http.path", ("http", "path"), _.httpPath),
    ("http.md5", ("http", "md5"), _.httpMd5),
    ("http.useragent", ("http", "useragent"), _.httpUseragent),
    ("dns.host", ("dns", "host"), _.dnsQname),
    ("dns.qt", ("dns", "qt"), _.dnsQtype),
    ("tls.ja3", ("tls", "ja3"), _.tlsJa3),
    ("tls.version", ("tls", "version"), _.tlsVersion))

  test("per-field fidelity floors across the golden corpus") {
    val dir = new java.io.File("/root/reference/tests/pcap")
    val match_ = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val seen = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val misses = scala.collection.mutable.Map[String, List[String]]()
      .withDefaultValue(Nil)
    dir.listFiles().filter(_.getName.endsWith(".pcap")).map(_.getPath).sorted
      .foreach { p =>
        val name = new java.io.File(p).getName.stripSuffix(".pcap")
        val goldenFile = new java.io.File(s"$dir/$name.test")
        if (goldenFile.exists()) {
          try {
            val bodies = mapper.readTree(goldenFile).get("sessions3")
              .elements().asScala.map(_.get("body")).toSeq
            val rows = SessionBuilder.sessionizeRef(spark, p).collect()
            for ((label, (g, k), ours) <- fields) {
              val want = bodies.map(goldenVals(_, g, k)).filter(_.nonEmpty)
                .map(_.mkString("")).sorted
              val got = rows.map(ours(_).distinct.sorted)
                .filter(_.nonEmpty).toSeq.map(_.mkString("")).sorted
              if (want.nonEmpty || got.nonEmpty) {
                seen(label) += 1
                if (want == got) match_(label) += 1
                else misses(label) ::= name
              }
            }
          } catch { case _: Exception => () }
        }
      }
    // pinned floors = the achieved level at round 3; raise as parsers widen
    val floors = Map(
      "http.method" -> 29, "http.host" -> 33, "http.path" -> 28,
      "http.md5" -> 23, "http.useragent" -> 27, "dns.host" -> 19,
      "dns.qt" -> 18, "tls.ja3" -> 15, "tls.version" -> 17)
    for ((label, _, _) <- fields) {
      info(f"$label%-16s ${match_(label)}%3d / ${seen(label)}%3d" +
        (if (misses(label).nonEmpty)
           s"  missed: ${misses(label).take(6).mkString(", ")}" else ""))
      assert(match_(label) >= floors(label),
        s"$label fidelity regressed: ${match_(label)} < ${floors(label)}")
    }
  }
}
