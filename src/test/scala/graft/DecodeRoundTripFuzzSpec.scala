package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Decode, Pcap}

/** Round-trip fuzz for the link/network/transport decode (reference:
  * capture/packet.c dispatch + parsers/{gre,tcp,udp,icmp}.c): packets
  * built by independent encoders typed from the public header layouts,
  * expectations computed from the generation model — inner 5-tuple,
  * tunnel tags in peel order, outermost-header-only MAC/VLAN fields
  * (packet.c:318-333), GRE carrier IPs, ICMP type/code, payload bytes
  * and the absolute innermost-L4 offset (the databytes base). Covers
  * DLT 1/0/108/113/101/107/127/239, VLAN+QinQ, MPLS stacks, PPPoE,
  * GRE v0 flag combos, PPTP GRE v1+PPP(+HDLC), ERSPAN II/III, VXLAN,
  * GTP-U (+S/PN/E and extension chains), IPIP/IP6IP4, v4 options and
  * fragments, v6 extension-header chains, and all L4 kinds.
  */
class DecodeRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0xdec0def22L
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))
  private def randBytes(n: Int): Array[Byte] =
    Array.fill(n)(nextInt(256).toByte)
  private def cat(xs: Array[Byte]*): Array[Byte] =
    xs.foldLeft(Array.emptyByteArray)(_ ++ _)

  // ------------------------------------------------------- expectations
  private final case class Expect(
      srcIp: String, dstIp: String, proto: Int,
      srcPort: Int = -1, dstPort: Int = -1,
      tcpFlags: Int = 0, tcpWindow: Int = 0, tcpSeq: Long = 0L, tcpAck: Long = 0L,
      payload: Array[Byte] = Array.emptyByteArray,
      tunnels: Seq[String] = Nil, vlans: Seq[Int] = Nil,
      macSrc: String = "", macDst: String = "",
      greIps: Seq[String] = Nil,
      icmpType: Int = -1, icmpCode: Int = -1,
      l4Abs: Int = -1)

  private def hexMac(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString(":")

  private def checkPacket(got: Option[Decode.DecodedPacket], e: Expect,
      data: Array[Byte]): Unit = {
    val d = got.getOrElse(fail("decode returned None"))
    assert(d.srcIp == e.srcIp, "srcIp")
    assert(d.dstIp == e.dstIp, "dstIp")
    assert(d.ipProtocol == e.proto, "proto")
    assert(d.srcPort == e.srcPort, "srcPort")
    assert(d.dstPort == e.dstPort, "dstPort")
    assert(d.tcpFlags == e.tcpFlags, "tcpFlags")
    assert(d.tcpWindow == e.tcpWindow, "tcpWindow")
    assert(d.tcpSeq == e.tcpSeq, "tcpSeq")
    assert(d.tcpAck == e.tcpAck, "tcpAck")
    assert(java.util.Arrays.equals(d.payload, e.payload), "payload")
    assert(d.tunnels == e.tunnels, s"tunnels ${d.tunnels} != ${e.tunnels}")
    assert(d.vlanIds == e.vlans, s"vlans ${d.vlanIds} != ${e.vlans}")
    assert(d.macSrc == e.macSrc, "macSrc")
    assert(d.macDst == e.macDst, "macDst")
    assert(d.greIps == e.greIps, "greIps")
    assert(d.icmpType == e.icmpType, "icmpType")
    assert(d.icmpCode == e.icmpCode, "icmpCode")
    assert(d.l4Offset == e.l4Abs, s"l4Offset ${d.l4Offset} != ${e.l4Abs}")
    assert(d.wireLen == data.length && d.recLen == data.length + 16)
  }

  // ----------------------------------------------------------- L4 model
  private sealed trait L4M { def proto(v6: Boolean): Int }
  private final case class TcpM(sp: Int, dp: Int, seqN: Long, ack: Long,
      flags: Int, win: Int, optWords: Int, pay: Array[Byte]) extends L4M {
    def proto(v6: Boolean) = 6
  }
  private final case class UdpM(sp: Int, dp: Int, pay: Array[Byte]) extends L4M {
    def proto(v6: Boolean) = 17
  }
  private final case class IcmpM(typ: Int, code: Int, pay: Array[Byte]) extends L4M {
    def proto(v6: Boolean) = if (v6) 58 else 1
  }
  private final case class SctpM(sp: Int, dp: Int, pay: Array[Byte]) extends L4M {
    def proto(v6: Boolean) = 132
  }
  private final case class BareM(p: Int) extends L4M { // IGMP/ESP/OSPF/PIM
    def proto(v6: Boolean) = p
  }

  private def genL4(): L4M = nextInt(6) match {
    case 0 | 1 => TcpM(nextInt(65536), nextInt(65536),
      nextInt(1 << 30).toLong * 4 + nextInt(4), // exercises high bit via *4
      nextInt(1 << 30).toLong, nextInt(64), nextInt(65536), nextInt(4),
      randBytes(nextInt(40)))
    case 2 | 3 =>
      // dst 4789/2152 would make the inner UDP itself a tunnel candidate
      val dp = nextInt(65536) match {
        case p if p == 4789 || p == 2152 => p + 1
        case p => p
      }
      UdpM(nextInt(65536), dp, randBytes(nextInt(40)))
    case 4 => IcmpM(nextInt(256), nextInt(256), randBytes(nextInt(30)))
    case _ => if (chance(50)) SctpM(nextInt(65536), nextInt(65536), randBytes(nextInt(20)))
              else BareM(oneOf(Seq(2, 50, 89, 103)))
  }

  private def encodeL4(m: L4M): Array[Byte] = m match {
    case t: TcpM =>
      val dOff = 5 + t.optWords
      val h = new Array[Byte](dOff * 4)
      h(0) = (t.sp >> 8).toByte; h(1) = t.sp.toByte
      h(2) = (t.dp >> 8).toByte; h(3) = t.dp.toByte
      h(4) = (t.seqN >> 24).toByte; h(5) = (t.seqN >> 16).toByte
      h(6) = (t.seqN >> 8).toByte; h(7) = t.seqN.toByte
      h(8) = (t.ack >> 24).toByte; h(9) = (t.ack >> 16).toByte
      h(10) = (t.ack >> 8).toByte; h(11) = t.ack.toByte
      h(12) = (dOff << 4).toByte; h(13) = t.flags.toByte
      h(14) = (t.win >> 8).toByte; h(15) = t.win.toByte
      (16 until dOff * 4).foreach(i => h(i) = nextInt(256).toByte)
      h ++ t.pay
    case u: UdpM =>
      val len = 8 + u.pay.length
      Array((u.sp >> 8).toByte, u.sp.toByte, (u.dp >> 8).toByte, u.dp.toByte,
        (len >> 8).toByte, len.toByte, nextInt(256).toByte, nextInt(256).toByte) ++ u.pay
    case i: IcmpM =>
      Array(i.typ.toByte, i.code.toByte,
        nextInt(256).toByte, nextInt(256).toByte) ++ i.pay
    case s: SctpM =>
      Array((s.sp >> 8).toByte, s.sp.toByte, (s.dp >> 8).toByte, s.dp.toByte) ++
        randBytes(8) ++ s.pay
    case _: BareM => randBytes(4 + nextInt(20))
  }

  /** Expectation fields contributed by the L4 (ports/flags/payload). */
  private def l4Expect(e: Expect, m: L4M): Expect = m match {
    case t: TcpM => e.copy(srcPort = t.sp, dstPort = t.dp, tcpFlags = t.flags,
      tcpWindow = t.win, tcpSeq = t.seqN & 0xffffffffL, tcpAck = t.ack,
      payload = t.pay)
    case u: UdpM => e.copy(srcPort = u.sp, dstPort = u.dp, payload = u.pay)
    case i: IcmpM => e.copy(srcPort = 0, dstPort = 0, icmpType = i.typ,
      icmpCode = i.code, payload = i.pay)
    case s: SctpM => e.copy(srcPort = s.sp, dstPort = s.dp, payload = s.pay)
    case _: BareM => e // session with no L4 fields
  }

  // ----------------------------------------------------------- IP model
  /** One inner IP packet. Returns (bytes, l4 offset within bytes, expect);
    * l4 offset is -1 for a non-first v4 fragment (counters-only packet).
    */
  private def genIp(allowFrag: Boolean): (Array[Byte], Int, Expect) = {
    val v6 = chance(40)
    val m = genL4()
    val l4 = encodeL4(m)
    if (!v6) {
      val src = randBytes(4); val dst = randBytes(4)
      val sStr = src.map(_ & 0xff).mkString(".")
      val dStr = dst.map(_ & 0xff).mkString(".")
      val optWords = nextInt(4)
      val ihl = 5 + optWords
      val frag = allowFrag && chance(10)
      val fragOff = if (frag) 1 + nextInt(2000) else 0
      val hdr = new Array[Byte](ihl * 4)
      hdr(0) = (0x40 | ihl).toByte
      hdr(1) = nextInt(256).toByte
      val totalLen = ihl * 4 + l4.length
      hdr(2) = (totalLen >> 8).toByte; hdr(3) = totalLen.toByte
      hdr(4) = nextInt(256).toByte; hdr(5) = nextInt(256).toByte
      hdr(6) = (((fragOff >> 8) & 0x1f) | (if (chance(30)) 0x40 else 0)).toByte
      hdr(7) = fragOff.toByte
      hdr(8) = (1 + nextInt(255)).toByte
      hdr(9) = m.proto(v6 = false).toByte
      hdr(10) = nextInt(256).toByte; hdr(11) = nextInt(256).toByte
      System.arraycopy(src, 0, hdr, 12, 4)
      System.arraycopy(dst, 0, hdr, 16, 4)
      (20 until ihl * 4).foreach(i => hdr(i) = nextInt(256).toByte)
      val base = Expect(sStr, dStr, m.proto(v6 = false))
      if (frag) (hdr ++ l4, -1, base) // ports/payload/l4Offset stay unset
      else (hdr ++ l4, ihl * 4, l4Expect(base, m).copy(l4Abs = ihl * 4))
    } else {
      // nonzero groups only → canonical form is the plain join
      val groups = Array.fill(8)(1 + nextInt(0xfffe))
      val addrS = groups.map(g => Integer.toHexString(g)).mkString(":")
      val src16 = groups.flatMap(g => Array((g >> 8).toByte, g.toByte))
      val groups2 = Array.fill(8)(1 + nextInt(0xfffe))
      val addrD = groups2.map(g => Integer.toHexString(g)).mkString(":")
      val dst16 = groups2.flatMap(g => Array((g >> 8).toByte, g.toByte))
      val nExts = nextInt(3)
      val extTypes = Seq.fill(nExts)(oneOf(Seq(0, 43, 60)))
      val proto = m.proto(v6 = true)
      val exts = extTypes.zipWithIndex.map { case (_, i) =>
        val nextT = if (i + 1 < nExts) extTypes(i + 1) else proto
        val lenUnits = nextInt(3)
        val e = new Array[Byte](8 + lenUnits * 8)
        e(0) = nextT.toByte; e(1) = lenUnits.toByte
        (2 until e.length).foreach(j => e(j) = nextInt(256).toByte)
        e
      }
      val extBytes = cat(exts: _*)
      val payLen = extBytes.length + l4.length
      val hdr = new Array[Byte](40)
      hdr(0) = (0x60 | nextInt(16)).toByte
      hdr(1) = nextInt(256).toByte; hdr(2) = nextInt(256).toByte
      hdr(3) = nextInt(256).toByte
      hdr(4) = (payLen >> 8).toByte; hdr(5) = payLen.toByte
      hdr(6) = (if (nExts > 0) extTypes.head else proto).toByte
      hdr(7) = (1 + nextInt(255)).toByte
      System.arraycopy(src16, 0, hdr, 8, 16)
      System.arraycopy(dst16, 0, hdr, 24, 16)
      val l4Rel = 40 + extBytes.length
      (cat(hdr, extBytes, l4),
        l4Rel, l4Expect(Expect(addrS, addrD, proto), m).copy(l4Abs = l4Rel))
    }
  }

  // ----------------------------------------------------- layer encoders
  /** Ethernet frame: returns bytes; vlan tags 0..2 with optional QinQ
    * outer TPID; priority bits randomized (the id is 12 bits).
    */
  private def eth(dst: Array[Byte], src: Array[Byte], vlanIds: Seq[Int],
      etherType: Int, payload: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= dst; out ++= src
    vlanIds.zipWithIndex.foreach { case (v, i) =>
      val tpid = if (i == 0 && vlanIds.length == 2 && chance(50)) 0x88a8 else 0x8100
      out += (tpid >> 8).toByte; out += tpid.toByte
      out += (((nextInt(8) << 5) | ((v >> 8) & 0x0f)) & 0xff).toByte
      out += v.toByte
    }
    out += (etherType >> 8).toByte; out += etherType.toByte
    (out ++= payload).toArray
  }

  private def greHeader(proto: Int, pptp: Boolean): Array[Byte] = {
    if (pptp) {
      val hasSeq = chance(60); val hasAck = chance(60)
      val flags = (if (hasSeq) 0x10 else 0) | 0x20 // K mandatory in v1
      val verByte = (if (hasAck) 0x80 else 0) | 0x01
      cat(Array(flags.toByte, verByte.toByte,
        (proto >> 8).toByte, proto.toByte),
        randBytes(4), // key (payload length + call id)
        if (hasSeq) randBytes(4) else Array.emptyByteArray,
        if (hasAck) randBytes(4) else Array.emptyByteArray)
    } else {
      val c = chance(30); val k = chance(30); val s = chance(30); val r = chance(20)
      val flags = (if (c) 0x80 else 0) | (if (r) 0x40 else 0) |
        (if (k) 0x20 else 0) | (if (s) 0x10 else 0)
      cat(Array(flags.toByte, (nextInt(8) << 5).toByte, // ver 0, recur bits
        (proto >> 8).toByte, proto.toByte),
        if (c) randBytes(4) else Array.emptyByteArray,
        if (k) randBytes(4) else Array.emptyByteArray,
        if (s) randBytes(4) else Array.emptyByteArray,
        if (r) randBytes(4) else Array.emptyByteArray)
    }
  }

  /** Outer IPv4/IPv6 carrier for a tunnel payload. Returns
    * (bytes, payload offset within bytes, carrier src, carrier dst, isV4).
    */
  private def carrierIp(proto: Int, payload: Array[Byte]): (Array[Byte], Int, String, String, Boolean) = {
    if (chance(70)) {
      val src = randBytes(4); val dst = randBytes(4)
      val totalLen = 20 + payload.length
      val hdr = new Array[Byte](20)
      hdr(0) = 0x45
      hdr(2) = (totalLen >> 8).toByte; hdr(3) = totalLen.toByte
      hdr(8) = 64.toByte; hdr(9) = proto.toByte
      System.arraycopy(src, 0, hdr, 12, 4)
      System.arraycopy(dst, 0, hdr, 16, 4)
      (hdr ++ payload, 20,
        src.map(_ & 0xff).mkString("."), dst.map(_ & 0xff).mkString("."), true)
    } else {
      val g1 = Array.fill(8)(1 + nextInt(0xfffe))
      val g2 = Array.fill(8)(1 + nextInt(0xfffe))
      val hdr = new Array[Byte](40)
      hdr(0) = 0x60.toByte
      hdr(4) = (payload.length >> 8).toByte; hdr(5) = payload.length.toByte
      hdr(6) = proto.toByte; hdr(7) = 64.toByte
      System.arraycopy(g1.flatMap(g => Array((g >> 8).toByte, g.toByte)), 0, hdr, 8, 16)
      System.arraycopy(g2.flatMap(g => Array((g >> 8).toByte, g.toByte)), 0, hdr, 24, 16)
      (hdr ++ payload, 40,
        g1.map(Integer.toHexString).mkString(":"),
        g2.map(Integer.toHexString).mkString(":"), false)
    }
  }

  private def udpWrap(sp: Int, dp: Int, payload: Array[Byte]): Array[Byte] = {
    val len = 8 + payload.length
    Array((sp >> 8).toByte, sp.toByte, (dp >> 8).toByte, dp.toByte,
      (len >> 8).toByte, len.toByte, 0.toByte, 0.toByte) ++ payload
  }

  // --------------------------------------------------------- the trials
  private def decode(data: Array[Byte], linkType: Int): Option[Decode.DecodedPacket] =
    Decode.decode(Pcap.RawPacket("fuzz.pcap", 0, 1700000000000000L,
      data.length, data.length, 0L, linkType, data))

  private def shiftL4(e: Expect, by: Int): Expect =
    if (e.l4Abs < 0) e else e.copy(l4Abs = e.l4Abs + by)

  test("every link type, tunnel stack and L4 round-trips at the model") {
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    (0 until 400).foreach { trial =>
      val variant = nextInt(15)
      val name = Seq("eth", "null", "sll", "rawip", "fr", "radiotap",
        "nflog", "mpls", "pppoe", "ipip", "gre", "pptp", "erspan",
        "vxlan", "gtp")(variant)
      counts(name) += 1
      val (data, linkType, expect): (Array[Byte], Int, Expect) = variant match {
        case 0 => // plain ethernet (+vlans)
          val (ip, _, e) = genIp(allowFrag = true)
          val mS = randBytes(6); val mD = randBytes(6)
          val vl = Seq.fill(nextInt(3))(1 + nextInt(4094))
          val et = if (e.srcIp.contains(":")) 0x86dd else 0x0800
          (eth(mD, mS, vl, et, ip), 1,
            shiftL4(e, 14 + 4 * vl.length).copy(
              macSrc = hexMac(mS), macDst = hexMac(mD), vlans = vl))
        case 1 => // BSD NULL/loopback: 4-byte AF, either byte order
          val (ip, _, e) = genIp(allowFrag = false)
          val v6 = e.srcIp.contains(":")
          val af: Array[Byte] =
            if (v6) Array(24, 0, 0, 0)
            else if (chance(50)) Array(2, 0, 0, 0) else Array(0, 0, 0, 2)
          (af ++ ip, if (chance(50)) 0 else 108, shiftL4(e, 4))
        case 2 => // Linux SLL
          val (ip, _, e) = genIp(allowFrag = false)
          val hdr = randBytes(16)
          val et = if (e.srcIp.contains(":")) 0x86dd else 0x0800
          hdr(14) = (et >> 8).toByte; hdr(15) = et.toByte
          (hdr ++ ip, 113, shiftL4(e, 16))
        case 3 => // raw IP
          val (ip, _, e) = genIp(allowFrag = false)
          (ip, 101, e)
        case 4 => // Frame Relay: cisco ethertype / NLPID / SNAP
          val (ip, _, e) = genIp(allowFrag = false)
          val v6 = e.srcIp.contains(":")
          nextInt(3) match {
            case 0 =>
              val et = if (v6) 0x86dd else 0x0800
              (cat(randBytes(2), Array((et >> 8).toByte, et.toByte), ip),
                107, shiftL4(e, 4))
            case 1 =>
              val ctrl = chance(60)
              val nlpid: Byte = if (v6) 0x8e.toByte else 0xcc.toByte
              val pre = if (ctrl) cat(randBytes(2), Array(3.toByte, nlpid))
                        else cat(randBytes(2), Array(nlpid))
              (pre ++ ip, 107, shiftL4(e, pre.length))
            case _ =>
              val et = if (v6) 0x86dd else 0x0800
              (cat(randBytes(2), Array(3.toByte, 0x80.toByte), randBytes(3),
                Array((et >> 8).toByte, et.toByte), ip), 107, shiftL4(e, 9))
          }
        case 5 => // Radiotap + 802.11 data + LLC/SNAP
          val (ip, _, e) = genIp(allowFrag = false)
          val rtLen = 8 + nextInt(12)
          val rt = randBytes(rtLen)
          rt(0) = 0; rt(1) = 0
          rt(2) = (rtLen & 0xff).toByte; rt(3) = ((rtLen >> 8) & 0xff).toByte
          val qos = chance(40); val wds = chance(30)
          val fc0 = 0x08 | (if (qos) 0x80 else 0) // data, subtype 8 = QoS
          val fc1 = if (wds) 0x03 else nextInt(3)
          val hdr80211 = cat(Array(fc0.toByte, fc1.toByte), randBytes(22),
            if (wds) randBytes(6) else Array.emptyByteArray,
            if (qos) randBytes(2) else Array.emptyByteArray)
          val et = if (e.srcIp.contains(":")) 0x86dd else 0x0800
          val llc = cat(Array(0xaa.toByte, 0xaa.toByte, 3.toByte), randBytes(3),
            Array((et >> 8).toByte, et.toByte))
          val data = cat(rt, hdr80211, llc, ip)
          (data, 127, shiftL4(e, rtLen + hdr80211.length + 8))
        case 6 => // NFLOG: noise TLVs then NFULA_PAYLOAD
          val (ip, _, e) = genIp(allowFrag = false)
          val v6 = e.srcIp.contains(":")
          val hdr = Array[Byte](if (v6) 10 else 2, 0,
            nextInt(256).toByte, nextInt(256).toByte)
          val noise = if (chance(60)) {
            val body = 1 + nextInt(9)
            val tlvLen = 4 + body
            val padded = (tlvLen + 3) & ~3
            val t = new Array[Byte](padded)
            t(0) = (tlvLen & 0xff).toByte; t(1) = ((tlvLen >> 8) & 0xff).toByte
            t(2) = 1; t(3) = 0 // NFULA_PACKET_HDR
            t
          } else Array.emptyByteArray
          val pLen = 4 + ip.length
          val pHdr = Array((pLen & 0xff).toByte, ((pLen >> 8) & 0xff).toByte,
            9.toByte, (if (chance(30)) 0x80 else 0).toByte)
          (cat(hdr, noise, pHdr, ip), 239, shiftL4(e, 4 + noise.length + 4))
        case 7 => // ethernet + MPLS label stack
          val (ip, _, e) = genIp(allowFrag = false)
          val mS = randBytes(6); val mD = randBytes(6)
          val vl = Seq.fill(nextInt(2))(1 + nextInt(4094))
          val nLabels = 1 + nextInt(3)
          val labels = cat((0 until nLabels).map { i =>
            val bos = i == nLabels - 1
            val l = randBytes(4)
            l(2) = ((l(2) & 0xfe) | (if (bos) 1 else 0)).toByte
            l
          }: _*)
          val et = if (chance(50)) 0x8847 else 0x8848
          (eth(mD, mS, vl, et, labels ++ ip), 1,
            shiftL4(e, 14 + 4 * vl.length + labels.length).copy(
              tunnels = "mpls" +: e.tunnels, vlans = vl,
              macSrc = hexMac(mS), macDst = hexMac(mD)))
        case 8 => // PPPoE session
          val (ip, _, e) = genIp(allowFrag = false)
          val mS = randBytes(6); val mD = randBytes(6)
          val vl = Seq.fill(nextInt(2))(1 + nextInt(4094))
          val ppp = if (e.srcIp.contains(":")) 0x0057 else 0x0021
          val hdr = cat(Array(0x11.toByte, 0.toByte), randBytes(2),
            randBytes(2), Array((ppp >> 8).toByte, ppp.toByte))
          (eth(mD, mS, vl, 0x8864, hdr ++ ip), 1,
            shiftL4(e, 14 + 4 * vl.length + 8).copy(
              tunnels = "pppoe" +: e.tunnels, vlans = vl,
              macSrc = hexMac(mS), macDst = hexMac(mD)))
        case 9 => // IPIP / IP6-in-IP4: untagged decap (packet.c ip-proto 4/41)
          val (ip, _, e) = genIp(allowFrag = false)
          val v6 = e.srcIp.contains(":")
          val (outer, payOff, _, _, _) = {
            // carrier must be v4 for proto 4; proto 41 works from either
            val src = randBytes(4); val dst = randBytes(4)
            val totalLen = 20 + ip.length
            val hdr = new Array[Byte](20)
            hdr(0) = 0x45
            hdr(2) = (totalLen >> 8).toByte; hdr(3) = totalLen.toByte
            hdr(8) = 64.toByte; hdr(9) = (if (v6) 41 else 4).toByte
            System.arraycopy(src, 0, hdr, 12, 4)
            System.arraycopy(dst, 0, hdr, 16, 4)
            (hdr ++ ip, 20, "", "", true)
          }
          val mS = randBytes(6); val mD = randBytes(6)
          (eth(mD, mS, Nil, 0x0800, outer), 1,
            shiftL4(e, 14 + payOff).copy(
              macSrc = hexMac(mS), macDst = hexMac(mD)))
        case 10 => // GRE v0 over v4/v6 carrier
          val (ip, _, e) = genIp(allowFrag = false)
          val proto = if (e.srcIp.contains(":")) 0x86dd else 0x0800
          val gre = greHeader(proto, pptp = false)
          val (outer, payOff, cS, cD, carrierV4) = carrierIp(47, gre ++ ip)
          val mS = randBytes(6); val mD = randBytes(6)
          (eth(mD, mS, Nil, if (carrierV4) 0x0800 else 0x86dd, outer), 1,
            shiftL4(e, 14 + payOff + gre.length).copy(
              tunnels = "gre" +: e.tunnels,
              greIps = if (carrierV4) Seq(cS, cD) else Nil,
              macSrc = hexMac(mS), macDst = hexMac(mD)))
        case 11 => // PPTP enhanced GRE v1 + PPP (+HDLC, 1/2-byte proto)
          val (ip, _, e) = genIp(allowFrag = false)
          val v6 = e.srcIp.contains(":")
          val gre = greHeader(0x880b, pptp = true)
          val hdlc = if (chance(50)) Array(0xff.toByte, 0x03.toByte)
                     else Array.emptyByteArray
          val pppProto: Array[Byte] =
            if (chance(50)) Array(if (v6) 0x57.toByte else 0x21.toByte)
            else Array(0.toByte, if (v6) 0x57.toByte else 0x21.toByte)
          val (outer, payOff, cS, cD, carrierV4) =
            carrierIp(47, cat(gre, hdlc, pppProto, ip))
          val mS = randBytes(6); val mD = randBytes(6)
          (eth(mD, mS, Nil, if (carrierV4) 0x0800 else 0x86dd, outer), 1,
            shiftL4(e, 14 + payOff + gre.length + hdlc.length + pppProto.length)
              .copy(tunnels = Seq("gre", "ppp") ++ e.tunnels,
                greIps = if (carrierV4) Seq(cS, cD) else Nil,
                macSrc = hexMac(mS), macDst = hexMac(mD)))
        case 12 => // ERSPAN II/III in GRE wrapping a full inner frame
          val (ip, _, e) = genIp(allowFrag = false)
          val innerVl = Seq.fill(nextInt(2))(1 + nextInt(4094))
          val innerEt = if (e.srcIp.contains(":")) 0x86dd else 0x0800
          val innerFrame = eth(randBytes(6), randBytes(6), innerVl, innerEt, ip)
          val erspanType = if (chance(50)) 0x88be else 0x22eb
          val hdrLen = if (erspanType == 0x88be) 8 else 12
          val gre = greHeader(erspanType, pptp = false)
          val (outer, payOff, cS, cD, carrierV4) =
            carrierIp(47, cat(gre, randBytes(hdrLen), innerFrame))
          val mS = randBytes(6); val mD = randBytes(6)
          val outerVl = Seq.fill(nextInt(2))(1 + nextInt(4094))
          (eth(mD, mS, outerVl, if (carrierV4) 0x0800 else 0x86dd, outer), 1,
            shiftL4(e, 14 + 4 * outerVl.length + payOff + gre.length + hdrLen +
              14 + 4 * innerVl.length)
              .copy(tunnels = "gre" +: e.tunnels,
                vlans = outerVl, // inner-frame vlans dropped (packet.c:328)
                greIps = if (carrierV4) Seq(cS, cD) else Nil,
                macSrc = hexMac(mS), macDst = hexMac(mD)))
        case 13 => // VXLAN over UDP 4789 wrapping a full inner frame
          val (ip, _, e) = genIp(allowFrag = false)
          val innerVl = Seq.fill(nextInt(2))(1 + nextInt(4094))
          val innerEt = if (e.srcIp.contains(":")) 0x86dd else 0x0800
          val innerFrame = eth(randBytes(6), randBytes(6), innerVl, innerEt, ip)
          val vxlan = cat(Array((if (chance(30)) 0x88 else 0x08).toByte,
            (if (chance(30)) 0x48 else 0).toByte), randBytes(6))
          val udp = udpWrap(nextInt(65536), 4789, vxlan ++ innerFrame)
          val (outer, payOff, _, _, carrierV4) = carrierIp(17, udp)
          val mS = randBytes(6); val mD = randBytes(6)
          val outerVl = Seq.fill(nextInt(2))(1 + nextInt(4094))
          (eth(mD, mS, outerVl, if (carrierV4) 0x0800 else 0x86dd, outer), 1,
            shiftL4(e, 14 + 4 * outerVl.length + payOff + 8 + 8 +
              14 + 4 * innerVl.length)
              .copy(tunnels = "vxlan" +: e.tunnels,
                vlans = outerVl, // inner-frame vlans dropped
                macSrc = hexMac(mS), macDst = hexMac(mD)))
        case _ => // GTP-U over UDP 2152 (+optional S/PN/E + ext chain)
          val (ip, _, e) = genIp(allowFrag = false)
          val sFlags = if (chance(50)) 0 else oneOf(Seq(1, 2, 4, 7))
          val withExt = sFlags != 0 && chance(40)
          val opt =
            if (sFlags == 0) Array.emptyByteArray
            else {
              val o = randBytes(4)
              o(3) = (if (withExt) 0x85 else 0).toByte
              o
            }
          val ext = if (withExt) {
            val blk = randBytes(4); blk(0) = 1; blk(3) = 0; blk
          } else Array.emptyByteArray
          val gtpLen = opt.length + ext.length + ip.length
          val gtp = cat(Array((0x30 | sFlags).toByte, 0xff.toByte,
            (gtpLen >> 8).toByte, gtpLen.toByte), randBytes(4), opt, ext)
          val udp = udpWrap(nextInt(65536), 2152, gtp ++ ip)
          val (outer, payOff, _, _, carrierV4) = carrierIp(17, udp)
          val mS = randBytes(6); val mD = randBytes(6)
          (eth(mD, mS, Nil, if (carrierV4) 0x0800 else 0x86dd, outer), 1,
            shiftL4(e, 14 + payOff + 8 + 8 + opt.length + ext.length)
              .copy(tunnels = "gtp" +: e.tunnels,
                macSrc = hexMac(mS), macDst = hexMac(mD)))
      }
      withClue(s"trial $trial variant $name: ") {
        checkPacket(decode(data, linkType), expect, data)
      }
    }
    // every variant actually ran
    Seq("eth", "null", "sll", "rawip", "fr", "radiotap", "nflog", "mpls",
      "pppoe", "ipip", "gre", "pptp", "erspan", "vxlan", "gtp")
      .foreach(v => assert(counts(v) > 0, s"variant $v never generated"))
  }

  test("truncation and corruption never throw across all variants") {
    (0 until 120).foreach { trial =>
      // reuse the generator through a full trial, then mutate
      val (ip, _, e) = genIp(allowFrag = true)
      val mS = randBytes(6); val mD = randBytes(6)
      val vl = Seq.fill(nextInt(3))(1 + nextInt(4094))
      val et = if (e.srcIp.contains(":")) 0x86dd else 0x0800
      val variants: Seq[(Array[Byte], Int)] = Seq(
        (eth(mD, mS, vl, et, ip), 1),
        (cat(Array[Byte](2, 0, 0, 0), ip), 0),
        (ip, 101),
        (cat(randBytes(2), Array(3.toByte, 0xcc.toByte), ip), 107),
        (cat(randBytes(4), ip), 239))
      val (data, lt) = oneOf(variants)
      withClue(s"trial $trial: ") {
        decode(data.take(nextInt(data.length + 1)), lt)
        val c = data.clone()
        (0 until 4).foreach(_ => c(nextInt(c.length)) = nextInt(256).toByte)
        decode(c, lt)
        decode(randBytes(nextInt(80)), oneOf(Seq(1, 0, 108, 113, 101, 107, 127, 239)))
      }
    }
  }

  test("v6 canonicalization special cases pin the inet_ntop form") {
    // all-zero groups, leading/trailing runs, single zero not compressed
    def v6Packet(addr: Array[Byte]): Array[Byte] = {
      val hdr = new Array[Byte](40)
      hdr(0) = 0x60.toByte
      hdr(4) = 0; hdr(5) = 8
      hdr(6) = 17; hdr(7) = 64
      System.arraycopy(addr, 0, hdr, 8, 16)
      System.arraycopy(addr, 0, hdr, 24, 16)
      hdr ++ udpWrap(53, 53, Array.emptyByteArray)
    }
    def grp(gs: Int*): Array[Byte] =
      gs.flatMap(g => Seq((g >> 8).toByte, g.toByte)).toArray
    val cases = Seq(
      grp(0x2001, 0xdb8, 0, 0, 0, 0, 0, 1) -> "2001:db8::1",
      grp(0, 0, 0, 0, 0, 0, 0, 1) -> "::1",
      grp(0xfe80, 0, 0, 0, 0x1ff, 0xfe23, 0x4567, 0x890a) ->
        "fe80::1ff:fe23:4567:890a",
      grp(0x2001, 0xdb8, 0, 1, 1, 1, 1, 1) -> "2001:db8:0:1:1:1:1:1",
      // leftmost LONGEST run wins: idx4-6 (len 3) beats idx1-2 (len 2)
      grp(0x2001, 0, 0, 1, 0, 0, 0, 1) -> "2001:0:0:1::1",
      grp(1, 2, 3, 4, 5, 6, 0, 0) -> "1:2:3:4:5:6::")
    cases.foreach { case (addr, want) =>
      val d = decode(v6Packet(addr), 101)
      assert(d.exists(_.srcIp == want), s"$want got ${d.map(_.srcIp)}")
    }
  }
}
