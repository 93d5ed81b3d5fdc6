package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

class MiscParsersGoldenSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()
  private def body(name: String) =
    mapper.readTree(new java.io.File(s"/root/reference/tests/pcap/$name.test"))
      .get("sessions3").elements().asScala.next().get("body")
  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  test("irc: nick + channel") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/irc.pcap").collect()
      .filter(_.protocol.contains("irc"))
    assert(got.nonEmpty)
    val g = got.head
    val w = body("irc").get("irc")
    assert(g.ircNick == strs(w.get("nick")))
    assert(g.ircChannel == strs(w.get("channel")))
  }

  test("postgres-good: user/db/app") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/postgres-good.pcap").collect()
      .filter(_.protocol.contains("postgresql"))
    assert(got.nonEmpty)
    val g = got.head
    val w = body("postgres-good").get("postgresql")
    assert(g.pgUser == w.get("user").asText())
    assert(g.pgDb == w.get("db").asText())
    assert(g.pgApp == w.get("app").asText())
  }

  test("mysql-allow and mysql-deny: version + user") {
    for (name <- Seq("mysql-allow", "mysql-deny")) {
      val got = SessionBuilder.sessionizeRef(spark,
        s"/root/reference/tests/pcap/$name.pcap").collect()
        .filter(_.protocol.contains("mysql"))
      assert(got.nonEmpty, name)
      val g = got.head
      val w = body(name).get("mysql")
      assert(g.mysqlVersion == w.get("version").asText(), name)
      assert(g.mysqlUser == w.get("user").asText(), name)
    }
  }
}
