package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** Golden fidelity for the HTTP/2 parser (HPACK + huffman +
  * CONTINUATION + PUSH_PROMISE + DATA md5) against the reference's
  * http2-nghttp2 capture (capture/parsers/http2.c).
  */
class Http2GoldenSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()
  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  private lazy val golden = mapper.readTree(new java.io.File(
    "/root/reference/tests/pcap/http2-nghttp2.test"))
    .get("sessions3").elements().asScala.next().get("body")

  private lazy val session = {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/http2-nghttp2.pcap").collect()
    assert(got.length == 1)
    got.head
  }

  test("http2-nghttp2: protocol tag and pseudo-header fields match golden") {
    assert(session.protocol.sorted == strs(golden.get("protocol")).sorted)
    assert(session.httpHost == strs(golden.get("http").get("host")))
    assert(session.httpMethod == strs(golden.get("http").get("method")))
    assert(session.httpPath.sorted ==
      strs(golden.get("http").get("path")).sorted)
    assert(session.httpStatuscode ==
      golden.get("http").get("statuscode").elements().asScala.map(_.asInt()).toSeq)
  }

  test("http2-nghttp2: DATA body md5s match golden (per-stream digest)") {
    assert(session.httpMd5.sorted ==
      strs(golden.get("http").get("md5")).sorted)
  }

  test("http2-nghttp2: header name lists survive HPACK + CONTINUATION") {
    // continuation-test-1..6 only decode if CONTINUATION fragments are
    // stitched into one HPACK block; the long dash values are huffman-coded
    assert(session.httpRequestHeader ==
      strs(golden.get("http").get("requestHeader")))
    assert(session.httpResponseHeader ==
      strs(golden.get("http").get("responseHeader")))
  }

  test("http2 fields are queryable through the expression language") {
    import graft.expr.Compiler
    import graft.model.FieldRegistry
    val df = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/http2-nghttp2.pcap").toDF()
    val c = new Compiler(FieldRegistry.sessions, FieldRegistry.sessionCol,
      SparkEntry.now)
    def n(e: String): Long = df.filter(c.compile(e)).count()
    assert(n("protocols == http2") == 1)
    assert(n("host.http == nghttp2.org") == 1)
    assert(n("http.method == GET") == 1)
    assert(n("http.statuscode == 200") == 1)
    assert(n("http.uri == \"/stylesheets/screen.css\"") == 0) // no urlString in http2
  }
}
