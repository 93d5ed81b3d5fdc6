package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

class SshDhcpGoldenSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()

  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  test("ssh2: versions, hassh, hasshServer, host key match golden") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/ssh2.pcap").collect()
    assert(got.length == 1)
    val g = got.head
    val w = mapper.readTree(new java.io.File(
      "/root/reference/tests/pcap/ssh2.test"))
      .get("sessions3").elements().asScala.next().get("body").get("ssh")
    assert(g.protocol.contains("ssh"))
    assert(g.sshVersion == strs(w.get("version")).sorted)
    assert(g.sshHassh == strs(w.get("hassh")))
    assert(g.sshHasshServer == strs(w.get("hasshServer")))
    assert(g.sshKey == strs(w.get("key")))
  }

  test("wireshark-dhcp: xid, mac, message types match golden") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/wireshark-dhcp.pcap").collect()
      .sortBy(_.firstPacket)
    val want = mapper.readTree(new java.io.File(
      "/root/reference/tests/pcap/wireshark-dhcp.test"))
      .get("sessions3").elements().asScala.map(_.get("body")).toSeq
      .sortBy(_.get("firstPacket").asLong())
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.protocol.contains("dhcp"))
      val d = w.get("dhcp")
      assert(g.dhcpId == strs(d.get("id")).sorted)
      assert(g.dhcpMac == strs(d.get("mac")).sorted)
      assert(g.dhcpType == strs(d.get("type")).sorted)
    }
  }
}
