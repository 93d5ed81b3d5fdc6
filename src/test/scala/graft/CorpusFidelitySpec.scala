package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** Corpus-wide fidelity floor: for every reference pcap with a golden
  * dump, compare the multiset of per-session (packets, bytes) signatures.
  * Pins the achieved level so regressions in decode/keying/segmenting
  * fail loudly. As of round 2 every fixture matches (ARP sessions,
  * fragment reassembly, offline-clock timeouts, BGP mid-save, TCP
  * port-reuse splitting all replicated).
  */
class CorpusFidelitySpec extends AnyFunSuite with SparkSpecBase {

  test("all 145 pcaps match golden session signatures") {
    val mapper = new ObjectMapper()
    val dir = new java.io.File("/root/reference/tests/pcap")
    var full = 0
    var total = 0
    val mismatches = Seq.newBuilder[String]
    dir.listFiles().filter(_.getName.endsWith(".pcap")).map(_.getPath).sorted
      .foreach { p =>
        val name = new java.io.File(p).getName.stripSuffix(".pcap")
        val goldenFile = new java.io.File(s"$dir/$name.test")
        if (goldenFile.exists()) {
          total += 1
          try {
            val want = mapper.readTree(goldenFile).get("sessions3")
              .elements().asScala.map(_.get("body")).toSeq
              .map(b => (b.get("network").get("packets").asLong(),
                b.get("network").get("bytes").asLong())).sorted
            val got = SessionBuilder.sessionizeRef(spark, p).collect()
              .map(r => (r.totPackets, r.totBytes)).toSeq.sorted
            if (got == want) full += 1 else mismatches += name
          } catch { case _: Exception => mismatches += name }
        }
      }
    info(s"full signature matches: $full / $total; mismatched: " +
      mismatches.result().mkString(", "))
    assert(full >= 145, s"fidelity regressed: only $full matched")
  }
}
