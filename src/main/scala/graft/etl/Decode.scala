package graft.etl

import java.nio.{ByteBuffer, ByteOrder}

import graft.functions.IpUtil

/** Link/network/transport decode: Ethernet (+VLAN), IPv4/IPv6, TCP/UDP/
  * ICMP → one flat decoded-packet record.
  *
  * Mirrors the decode steps of the reference's packet path
  * (capture/packet.c ethertype switch; parsers/tcp.c header fields) for
  * the encapsulations the round-1 fixtures use; tunnels (GRE/MPLS/GTP…)
  * hang off the same ethertype/ip-proto dispatch later.
  */
object Decode {

  final case class DecodedPacket(
      file: String,
      index: Int,
      tsMicros: Long,
      fileOffset: Long,
      recLen: Int,   // 16-byte record header + captured bytes (ref packetLen)
      wireLen: Int,  // captured length (ref pktlen → network.bytes)
      macSrc: String,
      macDst: String,
      ipProtocol: Int,
      srcIp: String,
      dstIp: String,
      srcPort: Int,
      dstPort: Int,
      tcpFlags: Int,
      tcpWindow: Int,
      tcpSeq: Long,
      tcpAck: Long,
      payload: Array[Byte],
      tunnels: Seq[String] = Nil, // outer encapsulations (gre, ppp, ...)
      greIps: Seq[String] = Nil,  // v4 endpoints of the GRE carrier header
      isisMsgType: String = null, // parsers/isis.c message-type label
      vlanIds: Seq[Int] = Nil,
      // non-5-tuple session key (ARP sessions key on the looked-up IP,
      // reference parsers/arp.c:27-39); null for normal flows
      keyOverride: String = null,
      icmpType: Int = -1,
      icmpCode: Int = -1,
      // offline clock: ts of the preceding packet in the file
      prevTsMicros: Long = 0L,
      // absolute offset of the (innermost) L4 header in the captured
      // bytes — the reference's payloadOffset, used for its per-protocol
      // databytes accounting (udp.c:73, icmp.c:100)
      l4Offset: Int = -1)

  private val HexLo = "0123456789abcdef".toCharArray

  // hand-rolled hex: the f-interpolator version cost ~12 format calls
  // per ethernet packet and showed up first in the ingest profile
  private def mac(b: Array[Byte], off: Int): String = {
    val c = new Array[Char](17)
    var i = 0
    while (i < 6) {
      val v = b(off + i) & 0xff
      val o = i * 3
      c(o) = HexLo(v >> 4)
      c(o + 1) = HexLo(v & 0xf)
      if (i < 5) c(o + 2) = ':'
      i += 1
    }
    new String(c)
  }

  /** Dotted-quad without Range/boxing/mkString — per-packet hot. */
  private[etl] def ip4String(b: Array[Byte], off: Int): String = {
    val sb = new java.lang.StringBuilder(15)
    var i = 0
    while (i < 4) {
      if (i > 0) sb.append('.')
      sb.append(b(off + i) & 0xff)
      i += 1
    }
    sb.toString
  }

  val TH_FIN = 0x01; val TH_SYN = 0x02; val TH_RST = 0x04
  val TH_PSH = 0x08; val TH_ACK = 0x10; val TH_URG = 0x20

  /** Decode one raw packet by its pcap link type; None for non-IP.
    * Link types (public tcpdump registry): 1 Ethernet, 0/108 BSD
    * loopback/NULL, 113 Linux cooked (SLL), 101 raw IP.
    */
  def decode(p: Pcap.RawPacket): Option[DecodedPacket] = {
    val b = p.data
    p.linkType match {
      case 1 => decodeEthernet(p, b)
      case 0 | 108 => // 4-byte AF header, host order: 2 = INET, 24/28/30 = INET6
        if (b.length < 5) None
        else {
          // AF in host order — either byte position, tested directly
          if ((b(0) & 0xff) == 2 || (b(3) & 0xff) == 2)
            decodeIp4(p, b, 4, "", "")
          else decodeIp6(p, b, 4, "", "")
        }
      case 113 => // Linux SLL: 16-byte header, protocol at offset 14
        if (b.length < 16) None
        else {
          val proto = ((b(14) & 0xff) << 8) | (b(15) & 0xff)
          proto match {
            case 0x0800 => decodeIp4(p, b, 16, "", "")
            case 0x86dd => decodeIp6(p, b, 16, "", "")
            case _      => None
          }
        }
      case 101 => // raw IP
        if (b.isEmpty) None
        else if ((b(0) & 0xf0) == 0x40) decodeIp4(p, b, 0, "", "")
        else decodeIp6(p, b, 0, "", "")
      case 107 => decodeFrameRelay(p, b)
      case 127 => decodeRadiotap(p, b)
      case 239 => decodeNflog(p, b)
      case _ => None
    }
  }

  /** Frame Relay (DLT 107): 2-byte Q.922 address, optional 0x03 control,
    * NLPID 0xcc = IPv4 / 0x8e = IPv6 (or SNAP 0x80 + OUI + ethertype).
    */
  private def decodeFrameRelay(p: Pcap.RawPacket, b: Array[Byte]): Option[DecodedPacket] = {
    if (b.length < 4) return None
    var off = 2
    // Cisco encapsulation: ethertype immediately after the address
    val maybeEt = ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    if (maybeEt == 0x0800) return decodeIp4(p, b, 4, "", "")
    if (maybeEt == 0x86dd) return decodeIp6(p, b, 4, "", "")
    if ((b(off) & 0xff) == 0x03) off += 1
    (b(off) & 0xff) match {
      case 0xcc => decodeIp4(p, b, off + 1, "", "")
      case 0x8e => decodeIp6(p, b, off + 1, "", "")
      case 0x80 if off + 6 < b.length => // SNAP: OUI(3) + ethertype(2)
        val et = ((b(off + 4) & 0xff) << 8) | (b(off + 5) & 0xff)
        et match {
          case 0x0800 => decodeIp4(p, b, off + 6, "", "")
          case 0x86dd => decodeIp6(p, b, off + 6, "", "")
          case _      => None
        }
      case _ => None
    }
  }

  /** Radiotap (DLT 127): LE header length at offset 2, then an 802.11
    * frame; unencrypted data frames carry LLC/SNAP → IP.
    */
  private def decodeRadiotap(p: Pcap.RawPacket, b: Array[Byte]): Option[DecodedPacket] = {
    if (b.length < 4) return None
    val rtLen = (b(2) & 0xff) | ((b(3) & 0xff) << 8)
    val w = rtLen // start of 802.11 header
    if (w + 24 > b.length) return None
    val fc0 = b(w) & 0xff
    val fc1 = b(w + 1) & 0xff
    val ftype = (fc0 >> 2) & 0x3
    if (ftype != 2) return None // data frames only
    if ((fc1 & 0x40) != 0) return None // protected (encrypted)
    val subtype = (fc0 >> 4) & 0xf
    var off = w + 24
    if ((fc1 & 0x03) == 0x03) off += 6 // addr4 (WDS)
    if ((subtype & 0x08) != 0) off += 2 // QoS control
    // LLC/SNAP: aa aa 03 oui(3) ethertype(2)
    if (off + 8 > b.length || (b(off) & 0xff) != 0xaa || (b(off + 1) & 0xff) != 0xaa)
      return None
    val et = ((b(off + 6) & 0xff) << 8) | (b(off + 7) & 0xff)
    // no mac fields: the reference records macs only on DLT_EN10MB
    // captures (packet.c:319) — radiotap sessions carry none
    et match {
      case 0x0800 => decodeIp4(p, b, off + 8, "", "")
      case 0x86dd => decodeIp6(p, b, off + 8, "", "")
      case _      => None
    }
  }

  /** Linux NFLOG (DLT 239): family(1) version(1) resource(2), then
    * little-endian TLVs; type 9 (NFULA_PAYLOAD) holds the raw IP packet.
    */
  private def decodeNflog(p: Pcap.RawPacket, b: Array[Byte]): Option[DecodedPacket] = {
    if (b.length < 8) return None
    val family = b(0) & 0xff
    var off = 4
    while (off + 4 <= b.length) {
      val tlvLen = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      val tlvType = (b(off + 2) & 0xff) | ((b(off + 3) & 0xff) << 8)
      if (tlvLen < 4) return None
      if ((tlvType & 0x7fff) == 9) { // NFULA_PAYLOAD
        val ipOff = off + 4
        return family match {
          case 2  => decodeIp4(p, b, ipOff, "", "")
          case 10 => decodeIp6(p, b, ipOff, "", "")
          case _  => None
        }
      }
      off += (tlvLen + 3) & ~3 // 4-byte aligned
    }
    None
  }

  private def decodeEthernet(p: Pcap.RawPacket, b: Array[Byte]): Option[DecodedPacket] = {
    if (b.length < 14) return None
    val mSrc = mac(b, 6)
    val mDst = mac(b, 0)
    var off = 12
    var etherType = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    off += 2
    // VLAN (802.1Q / QinQ) unwrap — capture/packet.c ethertype loop
    var vlans = List.empty[Int]
    while ((etherType == 0x8100 || etherType == 0x88a8) && off + 4 <= b.length) {
      vlans = (((b(off) & 0x0f) << 8) | (b(off + 1) & 0xff)) :: vlans
      etherType = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      off += 4
    }
    // NOTE: tunnel branches must NOT return early — VLAN tags collected
    // above apply to every path (the reference records the outermost
    // header's vlans regardless of what follows, packet.c:328-333)
    val decoded = etherType match {
      // MPLS (0x8847/0x8848): pop labels to bottom-of-stack, then IP
      case 0x8847 | 0x8848 =>
        var mOff = off
        var bos = false
        var guard = 0
        while (!bos && guard < 8 && mOff + 4 <= b.length) {
          bos = (b(mOff + 2) & 0x01) != 0
          mOff += 4
          guard += 1
        }
        if (bos && mOff < b.length) {
          val v = (b(mOff) & 0xf0) >> 4
          val inner =
            if (v == 4) decodeIp4(p, b, mOff, mSrc, mDst)
            else if (v == 6) decodeIp6(p, b, mOff, mSrc, mDst)
            else None
          inner.map(d => d.copy(tunnels = "mpls" +: d.tunnels))
        } else None
      // PPPoE session (0x8864): 6-byte header + 2-byte PPP protocol
      case 0x8864 if off + 8 <= b.length =>
        val ppp = ((b(off + 6) & 0xff) << 8) | (b(off + 7) & 0xff)
        val inner = off + 8
        (ppp match {
          case 0x0021 => decodeIp4(p, b, inner, mSrc, mDst)
          case 0x0057 => decodeIp6(p, b, inner, mSrc, mDst)
          case _      => None
        }).map(d => d.copy(tunnels = "pppoe" +: d.tunnels))
      case 0x0800 => decodeIp4(p, b, off, mSrc, mDst)
      case 0x86dd => decodeIp6(p, b, off, mSrc, mDst)
      case 0x8909 =>
        // Cisco metadata: skip the 6-byte header, an ethertype follows
        // (parsers/ciscometadata.c:22-30)
        if (off + 8 > b.length) None
        else {
          val innerType = ((b(off + 6) & 0xff) << 8) | (b(off + 7) & 0xff)
          (innerType match {
            case 0x0800 => decodeIp4(p, b, off + 8, mSrc, mDst)
            case 0x86dd => decodeIp6(p, b, off + 8, mSrc, mDst)
            case _      => None
          })
        }
      case 0x0806 =>
        // ARP (reference parsers/arp.c): sessions key on the looked-up
        // protocol address — the target for requests, the sender for
        // replies — so a request and its reply share one session.
        if (off + 28 > b.length || (b(off + 7) & 0xff) > 2) None
        else {
          val op = b(off + 7) & 0xff
          val kOff = if (op == 1) off + 24 else off + 14
          val keyIp = ip4String(b, kOff)
          Some(base(p, mSrc, mDst, 0, "", "").copy(
            tunnels = Seq("arp"), keyOverride = s"arp|$keyIp"))
        }
      case other  =>
        // Non-IP ether sessions (reference keys them on the destination
        // mac; ipProtocol 0): LLDP by ethertype, IS-IS via 802.3 LLC OSI.
        val tag =
          if (other == 0x88cc) Some("lldp")
          else if (other <= 1500 && off + 2 <= b.length &&
            (b(off) & 0xff) == 0xfe && (b(off + 1) & 0xff) == 0xfe) Some("isis")
          else None
        // isis.msgType reads frame byte 21 blindly (parsers/isis.c:36-79)
        val isisType: String =
          if (!tag.contains("isis")) null
          else if (p.inclLen < 22) s"err-len-${p.inclLen}"
          else (b(21) & 0xff) match {
            case 15 => "lan-l1-hello"; case 16 => "lan-l2-hello"
            case 17 => "p2p-hello"
            case 18 => "l1-lsp"; case 20 => "l2-lsp"
            case 24 => "l1-csnp"; case 25 => "l2-csnp"
            case 26 => "l1-psnp"; case 27 => "l2-psnp"
            case n  => s"unk-$n"
          }
        // empty srcIp ⇒ session keyed by dst only; every packet counts as
        // the src direction, matching the reference's ether sessions
        tag.map(t => base(p, mSrc, mDst, 0, "", mDst).copy(tunnels = Seq(t),
          isisMsgType = isisType))
    }
    if (vlans.isEmpty) decoded
    else decoded.map(d => d.copy(vlanIds = vlans.reverse))
  }

  private def decodeIp4(
      p: Pcap.RawPacket, b: Array[Byte], ipOff: Int,
      mSrc: String, mDst: String): Option[DecodedPacket] = {
    if (ipOff + 20 > b.length) return None
    val vIhl = b(ipOff) & 0xff
    if ((vIhl >> 4) != 4) return None
    val ihl = (vIhl & 0x0f) * 4
    val totalLen = ((b(ipOff + 2) & 0xff) << 8) | (b(ipOff + 3) & 0xff)
    val fragField = ((b(ipOff + 6) & 0xff) << 8) | (b(ipOff + 7) & 0xff)
    val fragOffset = fragField & 0x1fff
    val proto = b(ipOff + 9) & 0xff
    val srcIp = ip4String(b, ipOff + 12)
    val dstIp = ip4String(b, ipOff + 16)
    val l4Off = ipOff + ihl
    val l4End = math.min(ipOff + totalLen, b.length)
    if (fragOffset > 0) // non-first fragment: counters only, no L4 decode
      return Some(base(p, mSrc, mDst, proto, srcIp, dstIp)
        .copy(payload = Array.empty))
    decodeL4(p, b, l4Off, l4End, proto, srcIp, dstIp, mSrc, mDst)
  }

  private def decodeIp6(
      p: Pcap.RawPacket, b: Array[Byte], ipOff: Int,
      mSrc: String, mDst: String): Option[DecodedPacket] = {
    if (ipOff + 40 > b.length) return None
    if (((b(ipOff) & 0xf0) >> 4) != 6) return None
    val payLen = ((b(ipOff + 4) & 0xff) << 8) | (b(ipOff + 5) & 0xff)
    var next = b(ipOff + 6) & 0xff
    val srcIp = IpUtil.canonical(java.util.Arrays.copyOfRange(b, ipOff + 8, ipOff + 24))
    val dstIp = IpUtil.canonical(java.util.Arrays.copyOfRange(b, ipOff + 24, ipOff + 40))
    var l4Off = ipOff + 40
    // skip hop-by-hop / routing / destination-options extension headers
    var guard = 0
    while (guard < 8 && (next == 0 || next == 43 || next == 60) &&
        l4Off + 8 <= b.length) {
      val hdrLen = 8 + (b(l4Off + 1) & 0xff) * 8
      next = b(l4Off) & 0xff
      l4Off += hdrLen
      guard += 1
    }
    val l4End = math.min(ipOff + 40 + payLen, b.length)
    decodeL4(p, b, l4Off, l4End, next, srcIp, dstIp, mSrc, mDst)
  }

  private def base(
      p: Pcap.RawPacket, mSrc: String, mDst: String,
      proto: Int, srcIp: String, dstIp: String): DecodedPacket =
    DecodedPacket(p.file, p.index, p.tsMicros, p.fileOffset, p.inclLen + 16,
      p.inclLen, mSrc, mDst, proto, srcIp, dstIp, -1, -1, 0, 0, 0L, 0L,
      Array.empty, prevTsMicros = p.prevTsMicros)

  /** GRE (ip proto 47) decap, including PPTP enhanced GRE v1 carrying
    * PPP (reference: capture/parsers/gre.c). The decoded packet keeps
    * the INNER 5-tuple (the reference keys tunnel sessions on the inner
    * flow) and records the outer encapsulation in `tunnels`.
    */
  private def decodeGre(
      p: Pcap.RawPacket, b: Array[Byte], greOff: Int,
      mSrc: String, mDst: String,
      carrierSrc: String = null, carrierDst: String = null): Option[DecodedPacket] = {
    // greIp keeps the v4 header that directly precedes the GRE header
    // (packet.c:339-343 reads vpnIpOffset as struct ip; v4-only add)
    val carrierIps: Seq[String] =
      if (carrierSrc != null && !carrierSrc.contains(":"))
        Seq(carrierSrc, carrierDst)
      else Nil
    if (greOff + 4 > b.length) return None
    val flags = b(greOff) & 0xff
    val verByte = b(greOff + 1) & 0xff
    val ver = verByte & 0x07
    var proto = ((b(greOff + 2) & 0xff) << 8) | (b(greOff + 3) & 0xff)
    var off = greOff + 4
    if (ver == 1) { // PPTP enhanced GRE: key mandatory, S/A optional
      off += 4
      if ((flags & 0x10) != 0) off += 4 // sequence
      if ((verByte & 0x80) != 0) off += 4 // ack
    } else {
      if ((flags & 0x80) != 0) off += 4 // checksum + reserved
      if ((flags & 0x20) != 0) off += 4 // key
      if ((flags & 0x10) != 0) off += 4 // sequence
      if ((flags & 0x40) != 0) off += 4 // routing (ignore SRE list)
    }
    var tunnels = List("gre")
    // ERSPAN (II: 0x88be 8-byte header, III: 0x22eb 12-byte) wraps Ethernet
    if (proto == 0x88be || proto == 0x22eb) {
      val hdr = if (proto == 0x88be) 8 else 12
      // MAC fields keep the OUTERMOST ethernet header — the reference
      // reads pcapData+0 regardless of tunnels (packet.c:318-326)
      // VLANs come only from the OUTERMOST ethernet header (packet.c:
      // 328-333 walks pcapData+12) — drop any the inner frame carried
      return decodeEthernetAt(p, b, off + hdr)
        .map(d => d.copy(tunnels = tunnels.reverse ++ d.tunnels,
          macSrc = mSrc, macDst = mDst, vlanIds = Nil,
          greIps = if (d.greIps.nonEmpty) d.greIps else carrierIps))
    }
    if (proto == 0x880b && off < b.length) { // PPP
      if (off + 1 < b.length && (b(off) & 0xff) == 0xff &&
          (b(off + 1) & 0xff) == 0x03) off += 2 // HDLC framing
      if (off >= b.length) return None // truncated after HDLC bytes
      val p1 = b(off) & 0xff
      val pppProto =
        if ((p1 & 1) == 1) { off += 1; p1 }
        else if (off + 1 < b.length) {
          val v = (p1 << 8) | (b(off + 1) & 0xff); off += 2; v
        } else return None
      tunnels = "ppp" :: tunnels
      proto = pppProto match {
        case 0x0021 => 0x0800
        case 0x0057 => 0x86dd
        case _      => 0
      }
    }
    val inner = proto match {
      case 0x0800 => decodeIp4(p, b, off, mSrc, mDst)
      case 0x86dd => decodeIp6(p, b, off, mSrc, mDst)
      case _      => None
    }
    inner.map(d => d.copy(tunnels = tunnels.reverse ++ d.tunnels,
      greIps = if (d.greIps.nonEmpty) d.greIps else carrierIps))
  }

  private def decodeL4(
      p: Pcap.RawPacket, b: Array[Byte], l4Off: Int, l4End: Int, proto: Int,
      srcIp: String, dstIp: String, mSrc: String, mDst: String): Option[DecodedPacket] = {
    val base0 = base(p, mSrc, mDst, proto, srcIp, dstIp)
      .copy(l4Offset = l4Off)
    proto match {
      // Tunnel decaps whose inner frame fails to parse drop the packet,
      // as the reference's CORRUPT return does — no outer-flow session.
      case 47 => return decodeGre(p, b, l4Off, mSrc, mDst, srcIp, dstIp)
      case 4  => return decodeIp4(p, b, l4Off, mSrc, mDst)
      case 41 => return decodeIp6(p, b, l4Off, mSrc, mDst)
      case 6 if l4Off + 20 <= l4End => // TCP
        val bb = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
        val srcPort = ((b(l4Off) & 0xff) << 8) | (b(l4Off + 1) & 0xff)
        val dstPort = ((b(l4Off + 2) & 0xff) << 8) | (b(l4Off + 3) & 0xff)
        val seq = bb.getInt(l4Off + 4).toLong & 0xffffffffL
        val ack = bb.getInt(l4Off + 8).toLong & 0xffffffffL
        val dataOff = ((b(l4Off + 12) & 0xf0) >> 4) * 4
        val flags = b(l4Off + 13) & 0xff
        val window = ((b(l4Off + 14) & 0xff) << 8) | (b(l4Off + 15) & 0xff)
        val payStart = l4Off + dataOff
        val payload =
          if (payStart < l4End) java.util.Arrays.copyOfRange(b, payStart, l4End)
          else Array.empty[Byte]
        Some(base0.copy(srcPort = srcPort, dstPort = dstPort, tcpFlags = flags,
          tcpWindow = window, tcpSeq = seq, tcpAck = ack, payload = payload))
      case 17 if l4Off + 8 <= l4End => // UDP
        val srcPort = ((b(l4Off) & 0xff) << 8) | (b(l4Off + 1) & 0xff)
        val dstPort = ((b(l4Off + 2) & 0xff) << 8) | (b(l4Off + 3) & 0xff)
        val payStart = l4Off + 8
        // UDP-carried tunnels: VXLAN (dst 4789) wraps an Ethernet frame,
        // GTP-U (dst 2152) wraps an IP packet; sessions key on the inner
        // flow with the tunnel tagged (capture/packet.c:838-855). An
        // inner ARP keeps the OUTER addresses/protocol on the session
        // (the arp handler only re-keys — packet.c leaves the ip fields
        // from the outer parse), and undecodable inners drop the packet.
        if (dstPort == 4789 && payStart + 16 <= l4End &&
            (b(payStart) & 0x77) == 0 && (b(payStart + 1) & 0xb7) == 0 &&
            (b(payStart) & 0x08) != 0) {
          val innerEth = payStart + 8
          return decodeEthernetAt(p, b, innerEth).map { d =>
            val d2 =
              if (d.keyOverride != null)
                d.copy(srcIp = srcIp, dstIp = dstIp, ipProtocol = proto)
              else d
            // MAC and VLAN fields always record the OUTERMOST ethernet
            // header (packet.c:318-333 reads pcapData+0/+12 regardless
            // of tunnels) — inner-frame values are dropped
            d2.copy(tunnels = "vxlan" +: d2.tunnels,
              macSrc = mSrc, macDst = mDst, vlanIds = Nil)
          }
        }
        if (dstPort == 2152 && payStart + 12 <= l4End &&
            (b(payStart) & 0xf0) == 0x30 && (b(payStart + 1) & 0xff) == 0xff &&
            (((b(payStart + 2) & 0xff) << 8) | (b(payStart + 3) & 0xff)) == l4End - payStart - 8) {
          val flags = b(payStart) & 0xff
          var innerOff = payStart + 8
          var bad = false
          if ((flags & 0x07) != 0) { // S/PN/E: 4 more bytes, last = next-ext
            var next = if (innerOff + 4 <= l4End) b(innerOff + 3) & 0xff else { bad = true; 0 }
            innerOff += 4
            var guard = 0
            while (!bad && next != 0 && guard < 8) { // extension chain
              if (innerOff >= l4End) bad = true
              else {
                val extLen = b(innerOff) & 0xff
                if (extLen == 0 || innerOff + extLen * 4 > l4End) bad = true
                else {
                  next = b(innerOff + extLen * 4 - 1) & 0xff
                  innerOff += extLen * 4
                }
              }
              guard += 1
            }
          }
          if (!bad) {
            return (if (innerOff < l4End && (b(innerOff) & 0xf0) == 0x40)
              decodeIp4(p, b, innerOff, mSrc, mDst)
            else if (innerOff < l4End && (b(innerOff) & 0xf0) == 0x60)
              decodeIp6(p, b, innerOff, mSrc, mDst)
            else None).map(d => d.copy(tunnels = "gtp" +: d.tunnels))
          }
          return None
        }
        val payload =
          if (payStart < l4End) java.util.Arrays.copyOfRange(b, payStart, l4End)
          else Array.empty[Byte]
        Some(base0.copy(srcPort = srcPort, dstPort = dstPort, payload = payload))
      case 1 | 58 if l4Off + 4 <= l4End =>
        // ICMP / ICMPv6: no ports in the session key (the reference zeroes
        // them — echo request and reply share one session); type/code
        // surface as icmp.type / icmp.code session fields (parsers/icmp.c)
        Some(base0.copy(srcPort = 0, dstPort = 0,
          icmpType = b(l4Off) & 0xff, icmpCode = b(l4Off + 1) & 0xff,
          payload = java.util.Arrays.copyOfRange(b, l4Off + 4, l4End)))
      case 132 if l4Off + 12 <= l4End => // SCTP: common header ports
        val srcPort = ((b(l4Off) & 0xff) << 8) | (b(l4Off + 1) & 0xff)
        val dstPort = ((b(l4Off + 2) & 0xff) << 8) | (b(l4Off + 3) & 0xff)
        Some(base0.copy(srcPort = srcPort, dstPort = dstPort,
          payload = java.util.Arrays.copyOfRange(b, l4Off + 12, l4End)))
      case 2 | 50 | 89 | 103 =>
        // IGMP / ESP / OSPF / PIM: protocols with registered handlers in
        // the reference (parsers/{igmp,esp,ospf,pim}.c) — session, no L4
        Some(base0)
      case _ =>
        // No handler registered → the reference drops the packet
        // (moloch_packet_run_ip_cb returns UNKNOWN): no session for e.g.
        // RSVP(46) or EIGRP(88) — mpls-basic golden has none.
        None
    }
  }

  /** Decode an Ethernet frame at an arbitrary offset (tunnel payloads). */
  private def decodeEthernetAt(p: Pcap.RawPacket, b: Array[Byte], ethOff: Int): Option[DecodedPacket] = {
    if (ethOff + 14 > b.length) return None
    // the inner decode runs on a slice, so its l4Offset comes out
    // slice-relative — rebase to the captured packet, because databytes
    // accounting is pktlen MINUS THE ABSOLUTE payload offset
    // (icmp.c:100, udp.c:73: outer headers don't count as data)
    decodeEthernet(p, java.util.Arrays.copyOfRange(b, ethOff, b.length))
      .map(d => if (d.l4Offset >= 0) d.copy(l4Offset = d.l4Offset + ethOff) else d)
  }
}
