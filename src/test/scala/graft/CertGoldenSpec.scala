package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

class CertGoldenSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()
  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  test("https2-301-get: certificate chain fields match golden") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/https2-301-get.pcap").collect()
    assert(got.length == 1)
    val certs = got.head.cert
    val want = mapper.readTree(new java.io.File(
      "/root/reference/tests/pcap/https2-301-get.test"))
      .get("sessions3").elements().asScala.next().get("body").get("cert")
      .elements().asScala.toSeq
    assert(certs.length == want.length)
    // goldens are sorted by the test fixer; sort ours by hash for compare
    val g = certs.sortBy(_.hash)
    val w = want.sortBy(_.get("hash").asText())
    g.zip(w).foreach { case (c, j) =>
      assert(c.hash == j.get("hash").asText())
      assert(c.serial == j.get("serial").asText())
      assert(c.issuerCN == strs(j.get("issuerCN")))
      assert(c.issuerON == strs(j.get("issuerON")))
      assert(c.subjectCN == strs(j.get("subjectCN")))
      assert(c.subjectON == strs(j.get("subjectON")))
      assert(c.notBefore == j.get("notBefore").asLong())
      assert(c.notAfter == j.get("notAfter").asLong())
      assert(c.validDays == j.get("validDays").asLong())
      assert(c.publicAlgorithm == j.get("publicAlgorithm").asText())
      if (j.has("alt")) assert(c.alt.sorted == strs(j.get("alt")).sorted)
    }
  }

  test("nested cert fields are queryable through the expression language") {
    import graft.expr.Compiler
    import graft.model.FieldRegistry
    val sessions = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/https2-301-get.pcap").toDF()
    val c = new Compiler(FieldRegistry.sessions, FieldRegistry.sessionCol,
      SparkEntry.now)
    def n(e: String): Long = sessions.filter(c.compile(e)).count()
    assert(n("cert.subject.cn == \"github.com\"") == 1)
    assert(n("cert.subject.cn == digicert*") == 1)
    assert(n("cert.alt == \"www.github.com\"") == 1)
    assert(n("cert.issuer.on == \"DigiCert Inc\"") == 1)
    assert(n("cert.subject.cn == \"nomatch.example\"") == 0)
    // per-cert numeric/date bounds: notafter of the leaf is 2015-09-02
    assert(n("cert.notafter > \"2015/01/01\"") == 1)
    assert(n("cert.notafter > \"2030/01/01\"") == 0)
    assert(n("cert.validfor > 1000") == 1)
    assert(n("cert.publicAlgorithm == rsaEncryption") == 1)
  }
}
