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

  test("round-trips 300 seeded random packets over the decode domain") {
    // the codec is the sessionize shuffle wire format: every field
    // combination Decode can produce must survive pack→unpack exactly.
    // Random packets over the full value domain (sentinels, empty and
    // unicode strings, v4/v6, 32-bit seq wraps, list fields, payloads
    // up to 70 KB) — seeded LCG, failures reproduce.
    var seed = 0x9ac4e77L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    val files = Seq("f", "/a/b.pcap", "/data/caps/día-β.pcap",
      "x" * 300 + ".pcap", "")
    val macs = Seq("", "aa:bb:cc:dd:ee:ff", "00:00:00:00:00:00")
    val ips = Seq("", "10.0.0.1", "255.255.255.255", "2001:db8::1",
      "::1", "fe80::1%0", "8.8.8.8")
    // the nullable string fields' domain is null-or-NON-EMPTY (Decode
    // only ever sets a real label); the codec normalizes "" back to
    // null, pinned by its own test below
    val strs = Seq(null, "lan-l1-hello", "arp|10.1.2.3", "δ|x")
    for (_ <- 0 until 300) {
      val payLen = oneOf(Seq(0, 1, 7, 64, 1500, 70000, nextInt(4096)))
      val pay = Array.tabulate(payLen)(i => (i * 31 + nextInt(256)).toByte)
      roundTrip(DecodedPacket(
        file = oneOf(files),
        index = oneOf(Seq(0, 1, 123456, Int.MaxValue, nextInt(1 << 30))),
        tsMicros = math.abs(nextInt(1 << 30).toLong * nextInt(1 << 20)),
        fileOffset = math.abs(nextInt(1 << 30).toLong * nextInt(1 << 10)),
        recLen = nextInt(1 << 20),
        wireLen = nextInt(1 << 17),
        macSrc = oneOf(macs), macDst = oneOf(macs),
        ipProtocol = oneOf(Seq(0, 1, 2, 6, 17, 47, 58, 132, 255)),
        srcIp = oneOf(ips), dstIp = oneOf(ips),
        srcPort = oneOf(Seq(-1, 0, 80, 65535, nextInt(65536))),
        dstPort = oneOf(Seq(-1, 0, 443, 65535, nextInt(65536))),
        tcpFlags = nextInt(256),
        tcpWindow = oneOf(Seq(0, 1, 65535, nextInt(65536))),
        tcpSeq = oneOf(Seq(0L, 1L, 0x7fffffffL, 0x80000000L, 0xffffffffL,
          nextInt(Int.MaxValue).toLong)),
        tcpAck = oneOf(Seq(0L, 0xffffffffL, nextInt(Int.MaxValue).toLong)),
        payload = pay,
        tunnels = Seq.fill(nextInt(4))(oneOf(Seq("gre", "ppp", "vxlan",
          "mpls", "ipip"))),
        greIps = Seq.fill(nextInt(3))(oneOf(ips.filter(_.nonEmpty))),
        isisMsgType = oneOf(strs),
        vlanIds = Seq.fill(nextInt(3))(nextInt(4096)),
        keyOverride = oneOf(strs),
        icmpType = oneOf(Seq(-1, 0, 8, 255)),
        icmpCode = oneOf(Seq(-1, 0, 255)),
        prevTsMicros = math.abs(nextInt(1 << 30).toLong),
        l4Offset = oneOf(Seq(-1, 0, 14, 54, nextInt(1 << 16)))))
    }
  }

  test("empty nullable strings normalize to null across the wire") {
    // isisMsgType/keyOverride are null-or-non-empty in Decode's output;
    // the codec writes null and "" identically and unpacks both as null
    val p = DecodedPacket("f", 0, 1L, 2L, 3, 4, "", "", 6, "1.2.3.4",
      "5.6.7.8", 1, 2, 0, 0, 0L, 0L, Array.emptyByteArray,
      isisMsgType = "", keyOverride = "")
    val q = PacketCodec.unpack(PacketCodec.pack(p))
    assert(q.isisMsgType == null && q.keyOverride == null)
  }

  test("Hex matches the format-string rendering") {
    val b = Array[Byte](0, 1, 0x7f, -128, -1, 0x5a)
    assert(Hex.hex(b) === b.map(x => f"${x & 0xff}%02x").mkString)
    assert(Hex.hexColon(b) === b.map(x => f"${x & 0xff}%02x").mkString(":"))
    assert(Hex.hex(b, 2, 3) === "7f80ff")
    assert(Hex.hexColon(Array.emptyByteArray) === "")
  }
}
