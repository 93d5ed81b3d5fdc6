package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** TLS/JA3 extraction vs reference goldens. */
class TlsGoldenSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()

  private def goldenTls(name: String, idx: Int = 0) = {
    val root = mapper.readTree(
      new java.io.File(s"/root/reference/tests/pcap/$name.test"))
    val bodies = root.get("sessions3").elements().asScala.map(_.get("body")).toSeq
      .sortBy(_.get("firstPacket").asLong())
    bodies(idx).get("tls")
  }

  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  test("https2-301-get: TLSv1 JA3S, cipher, session id") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/https2-301-get.pcap").collect()
      .sortBy(_.firstPacket)
    assert(got.length == 1)
    val g = got.head
    val w = goldenTls("https2-301-get")
    assert(g.protocol.contains("tls"))
    assert(g.tlsVersion == strs(w.get("version")))
    assert(g.tlsCipher == strs(w.get("cipher")))
    assert(g.tlsJa3s == strs(w.get("ja3s")))
    assert(g.tlsJa3sString == strs(w.get("ja3sstring")))
    assert(g.tlsDstSessionId == strs(w.get("dstSessionId")))
  }

  test("curl-enabled-tls13: TLS 1.3 JA3 + JA3S") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/curl-enabled-tls13.pcap").collect()
      .sortBy(_.firstPacket)
    val tls = got.filter(_.protocol.contains("tls"))
    assert(tls.nonEmpty)
    val g = tls.head
    // find the golden session with tls populated
    val root = mapper.readTree(new java.io.File(
      "/root/reference/tests/pcap/curl-enabled-tls13.test"))
    val w = root.get("sessions3").elements().asScala.map(_.get("body"))
      .find(b => b.has("tls")).get.get("tls")
    assert(g.tlsVersion == strs(w.get("version")))
    assert(g.tlsCipher == strs(w.get("cipher")))
    assert(g.tlsJa3 == strs(w.get("ja3")))
    assert(g.tlsJa3String == strs(w.get("ja3string")))
    assert(g.tlsJa3s == strs(w.get("ja3s")))
    assert(g.tlsJa3sString == strs(w.get("ja3sstring")))
  }
}
