package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Decode, Hex, PacketCodec}
import graft.etl.Decode.DecodedPacket

class PacketCodecSpec extends AnyFunSuite {

  private def roundTrip(p: DecodedPacket): Unit = {
    val q = PacketCodec.unpack(PacketCodec.pack(p))
    assert(q.file === p.file)
    assert(q.index === p.index)
    assert(q.tsMicros === p.tsMicros)
    assert(q.fileOffset === p.fileOffset)
    assert(q.recLen === p.recLen)
    assert(q.wireLen === p.wireLen)
    assert(q.macSrc === p.macSrc)
    assert(q.macDst === p.macDst)
    assert(q.ipProtocol === p.ipProtocol)
    assert(q.srcIp === p.srcIp)
    assert(q.dstIp === p.dstIp)
    assert(q.srcPort === p.srcPort)
    assert(q.dstPort === p.dstPort)
    assert(q.tcpFlags === p.tcpFlags)
    assert(q.tcpWindow === p.tcpWindow)
    assert(q.tcpSeq === p.tcpSeq)
    assert(q.tcpAck === p.tcpAck)
    assert(q.payload.toSeq === p.payload.toSeq)
    assert(q.tunnels === p.tunnels)
    assert(q.greIps === p.greIps)
    assert(q.isisMsgType === p.isisMsgType)
    assert(q.vlanIds === p.vlanIds)
    assert(q.keyOverride === p.keyOverride)
    assert(q.icmpType === p.icmpType)
    assert(q.icmpCode === p.icmpCode)
    assert(q.prevTsMicros === p.prevTsMicros)
    assert(q.l4Offset === p.l4Offset)
  }

  test("round-trips a minimal non-IP packet (sentinels, nulls, empties)") {
    roundTrip(DecodedPacket("/tmp/a.pcap", 0, 1700000000000000L, 24L, 80, 64,
      "", "", 0, "", "", -1, -1, 0, 0, 0L, 0L, Array.emptyByteArray))
  }

  test("round-trips a full tcp packet with tunnels/vlans/unicode path") {
    roundTrip(DecodedPacket("/data/caps/día-β.pcap", 123456, 1234567890123456L,
      987654321L, 1516, 1500, "aa:bb:cc:dd:ee:ff", "00:11:22:33:44:55",
      6, "2001:db8::1", "10.0.0.255", 65535, 443, 0xff, 65535,
      0xffffffffL, 0x80000000L, Array.tabulate(300)(_.toByte),
      tunnels = Seq("gre", "ppp", "vxlan"), greIps = Seq("1.2.3.4", "5.6.7.8"),
      isisMsgType = "lan-l1-hello", vlanIds = Seq(1, 4095),
      keyOverride = "arp|10.1.2.3", icmpType = 255, icmpCode = 0,
      prevTsMicros = 1234567890000000L, l4Offset = 54))
  }

  test("round-trips icmp sentinel -1 and large payload") {
    roundTrip(DecodedPacket("f", 1, 2L, 3L, 4, 5, "", "", 1,
      "8.8.8.8", "1.1.1.1", 0, 0, 0, 0, 0L, 0L,
      Array.fill(70000)(0x5a.toByte), icmpType = -1, icmpCode = -1))
  }

  test("truncates >255-entry repeated fields instead of wrapping the count") {
    val p = DecodedPacket("f", 1, 2L, 3L, 4, 5, "", "", 6,
      "10.0.0.1", "10.0.0.2", 1, 2, 0, 0, 0L, 0L, Array.emptyByteArray,
      tunnels = Seq.tabulate(300)(i => s"t$i"),
      greIps = Seq.tabulate(260)(i => s"10.0.${i % 256}.1"),
      vlanIds = Seq.tabulate(400)(_ % 4096))
    val q = PacketCodec.unpack(PacketCodec.pack(p))
    assert(q.tunnels === p.tunnels.take(255))
    assert(q.greIps === p.greIps.take(255))
    assert(q.vlanIds === p.vlanIds.take(255))
    // the rest of the stream stays aligned past the truncated lists
    assert(q.srcIp === p.srcIp)
    assert(q.dstIp === p.dstIp)
    assert(q.l4Offset === p.l4Offset)
  }

  test("real decode → codec round-trip over a reference capture") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/pcap/socks-http-example.pcap"))
    val pkts = graft.etl.Pcap.parseFile(bytes, "socks-http-example.pcap")
      .flatMap(Decode.decode(_)).toSeq
    assert(pkts.nonEmpty)
    pkts.foreach(roundTrip)
  }

  test("Hex matches the format-string rendering") {
    val b = Array[Byte](0, 1, 0x7f, -128, -1, 0x5a)
    assert(Hex.hex(b) === b.map(x => f"${x & 0xff}%02x").mkString)
    assert(Hex.hexColon(b) === b.map(x => f"${x & 0xff}%02x").mkString(":"))
    assert(Hex.hex(b, 2, 3) === "7f80ff")
    assert(Hex.hexColon(Array.emptyByteArray) === "")
  }
}
