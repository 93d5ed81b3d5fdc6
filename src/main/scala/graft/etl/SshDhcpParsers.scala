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

  final case class DhcpInfo(id: Seq[String], mac: Seq[String], dhcpType: Seq[String])

  private val typeNames = Map(1 -> "DISCOVER", 2 -> "OFFER", 3 -> "REQUEST",
    4 -> "DECLINE", 5 -> "ACK", 6 -> "NAK", 7 -> "RELEASE", 8 -> "INFORM")

  /** Parse one BOOTP/DHCP message (a UDP payload). */
  def parseMessage(b: Array[Byte]): Option[(String, String, String)] = {
    if (b.length < 240) return None
    // magic cookie at 236
    if ((b(236) & 0xff) != 0x63 || (b(237) & 0xff) != 0x82 ||
        (b(238) & 0xff) != 0x53 || (b(239) & 0xff) != 0x63) return None
    val xid = ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    val hlen = b(2) & 0xff
    val mac = (0 until math.min(hlen, 6))
      .map(i => f"${b(28 + i) & 0xff}%02x").mkString(":")
    var off = 240
    var msgType = -1
    while (off + 2 <= b.length && (b(off) & 0xff) != 255 && msgType < 0) {
      val opt = b(off) & 0xff
      if (opt == 0) { off += 1 }
      else {
        val len = b(off + 1) & 0xff
        if (opt == 53 && len >= 1 && off + 2 < b.length) msgType = b(off + 2) & 0xff
        off += 2 + len
      }
    }
    typeNames.get(msgType).map(t => (f"$xid%x", mac, t))
  }

  def parse(payloads: Seq[Array[Byte]]): Option[DhcpInfo] = {
    val parsed = payloads.flatMap(parseMessage)
    if (parsed.isEmpty) None
    else Some(DhcpInfo(
      id = parsed.map(_._1).distinct.sorted,
      mac = parsed.map(_._2).distinct.sorted,
      dhcpType = parsed.map(_._3).distinct.sorted))
  }
}
