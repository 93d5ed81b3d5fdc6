package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

class SmtpGoldenSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()
  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  test("smtp-data-521: envelope + message headers match golden") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/smtp-data-521.pcap").collect()
    assert(got.length == 1)
    val g = got.head
    val w = mapper.readTree(new java.io.File(
      "/root/reference/tests/pcap/smtp-data-521.test"))
      .get("sessions3").elements().asScala.next().get("body").get("email")
    assert(g.protocol.contains("smtp"))
    assert(g.smtpHello == strs(w.get("smtpHello")))
    assert(g.emailSrc == strs(w.get("src")))
    assert(g.emailDst == strs(w.get("dst")))
    assert(g.emailSubject == strs(w.get("subject")))
    assert(g.emailContentType == strs(w.get("contentType")))
    assert(g.emailMimeVersion == strs(w.get("mimeVersion")))
    assert(g.emailHeader == strs(w.get("header")).sorted)
  }

  test("AUTH PLAIN user is the authcid, with or without an authzid") {
    import java.nio.charset.StandardCharsets
    def session(cred: String): Seq[String] = {
      val b64 = java.util.Base64.getEncoder.encodeToString(
        cred.getBytes(StandardCharsets.ISO_8859_1))
      val stream = s"EHLO client.example\r\nAUTH PLAIN $b64\r\n"
        .getBytes(StandardCharsets.ISO_8859_1)
      graft.etl.SmtpParser.parse(stream).map(_.user).getOrElse(Nil)
    }
    val nul = Character.MIN_VALUE
    assert(session(s"${nul}Alice${nul}hunter2") == Seq("alice"))
    // authzid present: the user is still the authcid (smtp.c:536-548)
    assert(session(s"admin${nul}Bob${nul}pw") == Seq("bob"))
    assert(session("nonulshere").isEmpty)
  }

  test("malformed B-encoded words decode best-effort, like g_base64_decode") {
    import graft.etl.SmtpParser.decodeEncodedWords
    // well-formed baseline
    assert(decodeEncodedWords("=?utf-8?B?aGVsbG8=?=") == "hello")
    // '!' is outside the alphabet: glib skips it and keeps decoding, so
    // the word must yield decoded text, not fall back to the raw header
    assert(decodeEncodedWords("=?utf-8?B?aGVs!bG8=?=") == "hello")
    // an odd trailing group is dropped, not an error
    assert(decodeEncodedWords("=?utf-8?B?aGVsbG8xx?=").startsWith("hello"))
    // interior '=' acts like any other non-alphabet byte (skipped)
    assert(decodeEncodedWords("=?utf-8?B?aGVs=bG8=?=") == "hello")
  }
}
