package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** ETL fidelity vs the reference's committed golden session dumps
  * (tests/pcap/<name>.test — canonicalized capture output, see FIXTURES.md).
  */
class EtlGoldenSpec extends AnyFunSuite with SparkSpecBase {

  test("corrupt incl_len stops file iteration instead of throwing") {
    import java.nio.{ByteBuffer, ByteOrder}
    val buf = ByteBuffer.allocate(24 + 16 + 4 + 16).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0xa1b2c3d4).putShort(2).putShort(4).putInt(0).putInt(0)
      .putInt(65535).putInt(1) // snaplen, linktype
    buf.putInt(100).putInt(0).putInt(4).putInt(4) // good record, 4 bytes
    buf.putInt(0xdeadbeef)
    buf.putInt(101).putInt(0).putInt(-7).putInt(60) // negative incl_len
    val packets = graft.etl.Pcap.parseFile(buf.array(), "corrupt.pcap").toSeq
    assert(packets.length == 1)
    assert(packets.head.inclLen == 4)
  }

  private val mapper = new ObjectMapper()

  private def golden(name: String): Seq[JsonNode] = {
    val root = mapper.readTree(
      new java.io.File(s"/root/reference/tests/pcap/$name.test"))
    root.get("sessions3").elements().asScala.map(_.get("body")).toSeq
      .sortBy(_.get("firstPacket").asLong())
  }

  private def run(name: String): Seq[SessionBuilder.SessionRow] =
    SessionBuilder.sessionizeRef(spark, s"/root/reference/tests/pcap/$name.pcap")
      .collect().toSeq.sortBy(_.firstPacket)

  private def longs(n: JsonNode): Seq[Long] =
    n.elements().asScala.map(_.asLong()).toSeq
  private def strs(n: JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  test("socks-http-example matches golden core fields") {
    val got = run("socks-http-example")
    val want = golden("socks-http-example")
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.firstPacket == w.get("firstPacket").asLong())
      assert(g.lastPacket == w.get("lastPacket").asLong())
      assert(g.length == w.get("length").asLong())
      assert(g.ipProtocol == w.get("ipProtocol").asInt())
      assert(g.totPackets == w.get("network").get("packets").asLong())
      assert(g.totBytes == w.get("network").get("bytes").asLong())
      assert(g.totDataBytes == w.get("totDataBytes").asLong())
      assert(g.communityId == w.get("network").get("community_id").asText())
      assert(g.srcIp == w.get("source").get("ip").asText())
      assert(g.srcPort == w.get("source").get("port").asInt())
      assert(g.srcPackets == w.get("source").get("packets").asLong())
      assert(g.srcBytes == w.get("source").get("bytes").asLong())
      assert(g.dstIp == w.get("destination").get("ip").asText())
      assert(g.dstPort == w.get("destination").get("port").asInt())
      assert(g.srcDataBytes == w.get("client").get("bytes").asLong())
      assert(g.dstDataBytes == w.get("server").get("bytes").asLong())
      assert(g.srcPayload8 == w.get("srcPayload8").asText())
      assert(g.dstPayload8 == w.get("dstPayload8").asText())
      val tf = w.get("tcpflags")
      assert(g.tcpflagsSyn == tf.get("syn").asInt())
      assert(g.tcpflagsSynAck == tf.get("syn-ack").asInt())
      assert(g.tcpflagsAck == tf.get("ack").asInt())
      assert(g.tcpflagsPsh == tf.get("psh").asInt())
      assert(g.tcpflagsFin == tf.get("fin").asInt())
      assert(g.tcpflagsRst == tf.get("rst").asInt())
      assert(g.tcpflagsSrcZero == tf.get("srcZero").asInt())
      assert(g.tcpflagsDstZero == tf.get("dstZero").asInt())
      assert(g.packetPos.toSeq == longs(w.get("packetPos")))
      assert(g.packetLen.toSeq.map(_.toLong) == longs(w.get("packetLen")))
      assert(g.protocol.sorted == strs(w.get("protocol")).sorted)
      assert(g.srcMac == strs(w.get("source").get("mac")).sorted)
      assert(g.dstMac == strs(w.get("destination").get("mac")).sorted)
      // http extraction
      val http = w.get("http")
      assert(g.httpMethod == strs(http.get("method")))
      assert(g.httpHost == strs(http.get("host")))
      assert(g.httpStatuscode == http.get("statuscode").elements().asScala.map(_.asInt()).toSeq)
      assert(g.httpUseragent == strs(http.get("useragent")))
      // socks destination
      val socks = w.get("socks")
      assert(g.socksPort == socks.get("port").asInt())
      if (socks.has("ip")) assert(g.socksIp == socks.get("ip").asText())
      if (socks.has("host")) assert(g.socksHost == socks.get("host").asText())
    }
  }

  test("dns-error matches golden dns fields") {
    val got = run("dns-error")
    val want = golden("dns-error")
    assert(got.length == 1)
    val (g, w) = (got.head, want.head)
    assert(g.ipProtocol == 17)
    assert(g.totBytes == w.get("network").get("bytes").asLong())
    assert(g.communityId == w.get("network").get("community_id").asText())
    assert(g.dnsQname == strs(w.get("dns").get("host")))
    assert(g.dnsQtype == strs(w.get("dns").get("qt")))
    assert(g.dnsRcode == strs(w.get("dns").get("status")))
    assert(g.srcPayload8 == w.get("srcPayload8").asText())
    assert(g.dstPayload8 == w.get("dstPayload8").asText())
  }

  test("v6-http decodes IPv6 sessions") {
    val got = run("v6-http")
    assert(got.nonEmpty)
    assert(got.exists(_.protocol.contains("http")))
    val http = got.filter(_.protocol.contains("http"))
    assert(http.forall(_.srcIp.contains(":")))
  }

  test("wireshark-retrans: retransmissions deduped in reassembly") {
    val got = run("wireshark-retrans")
    assert(got.length == 1)
    val g = got.head
    assert(g.protocol.contains("http"))
    assert(g.httpMethod == Seq("POST"))
    assert(g.httpStatuscode == Seq(200))
  }
}
