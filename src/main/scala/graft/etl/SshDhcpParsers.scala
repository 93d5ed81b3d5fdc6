package graft.etl

import java.nio.charset.StandardCharsets

/** SSH metadata extractor: version banners, HASSH fingerprints (public
  * spec: github.com/salesforce/hassh), server host key.
  * Reference parser: capture/parsers/ssh.c.
  */
object SshParser {

  final case class SshInfo(
      version: Seq[String], hassh: Seq[String], hasshServer: Seq[String],
      key: Seq[String])

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Banner line ("SSH-2.0-OpenSSH_5.3") → lowercase version entry. */
  private def banner(stream: Array[Byte]): Option[String] = {
    val head = new String(stream.take(256), StandardCharsets.ISO_8859_1)
    head.split("\r?\n").find(_.startsWith("SSH-")).map(_.trim.toLowerCase)
  }

  /** Iterate SSH binary packets (msgType, payload) after the banner. */
  private def packets(stream: Array[Byte]): Iterator[(Int, Array[Byte])] = {
    val nl = stream.indexWhere(_ == '\n')
    if (nl < 0) return Iterator.empty
    var off = nl + 1
    // a second banner line can follow (protoversion 1.99 servers)
    if (off < stream.length &&
        new String(stream, off, math.min(4, stream.length - off),
          StandardCharsets.ISO_8859_1) == "SSH-") {
      val nl2 = stream.indexWhere(_ == '\n', off)
      if (nl2 > 0) off = nl2 + 1
    }
    new Iterator[(Int, Array[Byte])] {
      private var pos = off
      def hasNext: Boolean = pos + 6 <= stream.length && {
        val len = u32(stream, pos)
        len >= 2 && len < 256 * 1024 && pos + 4 + len <= stream.length + 0
      }
      def next(): (Int, Array[Byte]) = {
        val len = u32(stream, pos).toInt
        val padLen = stream(pos + 4) & 0xff
        val msgType = stream(pos + 5) & 0xff
        val payStart = pos + 6
        val payEnd = math.min(pos + 4 + len - padLen, stream.length)
        val payload =
          if (payEnd > payStart)
            java.util.Arrays.copyOfRange(stream, payStart, payEnd)
          else Array.empty[Byte]
        pos = pos + 4 + len
        (msgType, payload)
      }
    }
  }

  /** KEXINIT payload → the 10 name-lists (after 16-byte cookie). */
  private def kexLists(payload: Array[Byte]): Seq[String] = {
    var off = 16
    val lists = Seq.newBuilder[String]
    var i = 0
    while (i < 10 && off + 4 <= payload.length) {
      val len = u32(payload, off).toInt
      off += 4
      val end = math.min(off + len, payload.length)
      lists += new String(payload, off, end - off, StandardCharsets.ISO_8859_1)
      off = end
      i += 1
    }
    lists.result()
  }

  private def md5(s: String): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  def parse(srcStream: Array[Byte], dstStream: Array[Byte]): Option[SshInfo] = {
    val vSrc = banner(srcStream)
    val vDst = banner(dstStream)
    if (vSrc.isEmpty && vDst.isEmpty) return None
    // HASSH: md5(kex;enc_c2s;mac_c2s;comp_c2s) over the client KEXINIT;
    // hasshServer uses the server's s2c lists.
    val hassh = packets(srcStream).collectFirst { case (20, p) => kexLists(p) }
      .filter(_.length >= 10)
      .map(l => md5(Seq(l(0), l(2), l(4), l(6)).mkString(";")))
    val hasshServer = packets(dstStream).collectFirst { case (20, p) => kexLists(p) }
      .filter(_.length >= 10)
      .map(l => md5(Seq(l(0), l(3), l(5), l(7)).mkString(";")))
    // host key: first string of the server's KEX reply. Message number 31
    // is KEXDH_REPLY for plain DH but KEX_DH_GEX_GROUP for group
    // exchange, so validate the blob shape: a host key starts with a
    // length-prefixed algorithm name ("ssh-rsa", "ecdsa-…").
    def hostKeyOf(p: Array[Byte]): Option[String] = {
      if (p.length < 8) return None
      val len = u32(p, 0).toInt
      if (len <= 8 || 4 + len > p.length) return None
      val blob = java.util.Arrays.copyOfRange(p, 4, 4 + len)
      val algoLen = u32(blob, 0).toInt
      if (algoLen <= 0 || algoLen > 64 || 4 + algoLen > blob.length) return None
      val algo = new String(blob, 4, algoLen, StandardCharsets.ISO_8859_1)
      if (algo.startsWith("ssh-") || algo.startsWith("ecdsa-") ||
          algo.startsWith("rsa-sha2"))
        Some(java.util.Base64.getEncoder.encodeToString(blob))
      else None
    }
    val key = packets(dstStream).collect {
      case (t, p) if t == 31 || t == 33 => hostKeyOf(p)
    }.collectFirst { case Some(k) => k }
    Some(SshInfo(
      version = (vSrc.toSeq ++ vDst.toSeq).distinct.sorted,
      hassh = hassh.toSeq, hasshServer = hasshServer.toSeq, key = key.toSeq))
  }
}

/** DHCP metadata extractor (BOOTP + option 53 message types).
  * Reference parser: capture/parsers/dhcp.c.
  */
object DhcpParser {

  final case class DhcpInfo(id: Seq[String], mac: Seq[String],
      dhcpType: Seq[String], host: Seq[String])

  // names[0] is the empty string — a (bogus) option-53 value of 0 adds
  // it verbatim, as the reference's `value <= 18` check does
  private val typeNames = Array("", "DISCOVER", "OFFER", "REQUEST",
    "DECLINE", "ACK", "NAK", "RELEASE", "INFORM", "FORCERENEW",
    "LEASEQUERY", "LEASEUNASSIGNED", "LEASEUNKNOWN", "LEASEACTIVE",
    "BULKLEASEQUERY", "LEASEQUERYDONE", "ACTIVELEASEQUERY",
    "LEASEQUERYSTATUS", "TLS")

  final case class Msg(id: String, mac: Seq[String],
      types: Seq[String], hosts: Seq[String])

  /** Parse one BOOTP/DHCP message exactly as dhcp_udp_parser walks it
    * (dhcp.c:33-132): 256-byte floor; the xid records even without a
    * message type; the chaddr MAC records for hardware type 1 (six
    * bytes, regardless of hlen); the option walk takes host names from
    * options 12 and 81 (FQDN, ascii encoding only) and a client-id MAC
    * from option 61 — including the reference's two parse quirks, kept
    * bug-compatible: a 0x00 pad byte is treated as an option WITH a
    * length byte (no case 0), and a non-ascii FQDN consumes l+2 bytes
    * (the flags/rcode skip happens before the `l - 1` skip).
    */
  def parseMessage(b: Array[Byte]): Option[Msg] = {
    if (b.length < 256) return None
    val xid = ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    val macs = Seq.newBuilder[String]
    val types = Seq.newBuilder[String]
    val hosts = Seq.newBuilder[String]
    def macAt(off: Int): String =
      (0 until 6).map(i => f"${b(off + i) & 0xff}%02x").mkString(":")
    if ((b(1) & 0xff) == 1) macs += macAt(28)
    var off = 240
    var done = false
    while (!done && off + 2 <= b.length) {
      val t = b(off) & 0xff
      if (t == 255) done = true
      else {
        val l = b(off + 1) & 0xff
        if (l > b.length - off - 2 || l == 0) done = true
        else {
          t match {
            case 12 =>
              hosts += new String(b, off + 2, l,
                java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
              off += 2 + l
            case 53 =>
              if (l == 1) {
                val v = b(off + 2) & 0xff
                if (v <= 18) types += typeNames(v)
              }
              off += 2 + l
            case 61 =>
              if (l == 7 && (b(off + 2) & 0xff) == 1) macs += macAt(off + 3)
              off += 2 + l
            case 81 =>
              if (l < 3) off += 2 + l
              else if ((b(off + 2) & 0xff) != 0) off += 2 + l + 2 // quirk
              else {
                hosts += new String(b, off + 5, l - 3,
                  java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
                off += 2 + l
              }
            case _ => off += 2 + l
          }
        }
      }
    }
    Some(Msg(f"$xid%x", macs.result(), types.result(), hosts.result()))
  }

  def parse(payloads: Seq[Array[Byte]]): Option[DhcpInfo] = {
    val parsed = payloads.flatMap(parseMessage)
    if (parsed.isEmpty) None
    else Some(DhcpInfo(
      id = parsed.map(_.id).distinct.sorted,
      mac = parsed.flatMap(_.mac).distinct.sorted,
      dhcpType = parsed.flatMap(_.types).distinct.sorted,
      host = parsed.flatMap(_.hosts).distinct.sorted))
  }
}
