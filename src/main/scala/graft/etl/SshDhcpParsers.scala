package graft.etl

import java.nio.charset.StandardCharsets

/** SSH metadata extractor — version banners, HASSH fingerprints
  * (public spec: github.com/salesforce/hassh), server host key, and the
  * reverse-shell packet-size heuristic — rebuilt as a byte-exact
  * transcription of the reference parser (capture/parsers/ssh.c) over
  * its BSB discipline, pinned by SshDifferentialFuzzSpec plus the
  * golden corpus.
  *
  * The reference machine, which this reproduces:
  *  - classify on the first chunk starting "SSH" (needle, ssh.c:252);
  *    the parser then receives EVERY delivered chunk of both
  *    directions, starting with the classify chunk itself;
  *  - every chunk starting "SSH" (len > 3) is a version banner: the
  *    version is the chunk up to the first 0x0a (a trailing 0x0d
  *    dropped), ascii-lowered — a chunk with no LF records NOTHING,
  *    and the rest of a banner chunk (pipelined binary bytes after the
  *    newline) is DISCARDED (ssh.c:148-159 returns);
  *  - binary messages accumulate per direction into an 8196-byte
  *    buffer (overflow truncates); a declared length < 2 or > 8196
  *    sets a SHARED done flag (both directions stop decoding, while
  *    packet counting continues);
  *  - KEXINIT (code 20) hashes the hassh/hasshServer lists from a walk
  *    bounded by the BUFFER, not the message — lists overrunning the
  *    declared message length read into subsequent buffered bytes
  *    (ssh.c:186 passes BSB_REMAINING of the whole buffer);
  *  - the hassh walk errors out (no hash) when any needed list import
  *    fails; an overrunning FIRST list (kex) errors via the null
  *    EXPORT_ptr (bsb.h:88-97);
  *  - the host key comes ONLY from message code 33, base64 of the
  *    length-prefixed blob, no shape validation (ssh.c:188-199), and
  *    sets done;
  *  - packets 6..15 of each direction count sizes < 50 and 50..99;
  *    past 15 packets in one direction the session tags
  *    ssh-reverse-shell iff BOTH directions saw more mid-size than
  *    small packets, and the parser unregisters (ssh.c:122-141).
  */
object SshParser {

  final case class SshInfo(
      version: Seq[String], hassh: Seq[String], hasshServer: Seq[String],
      key: Seq[String], reverseShell: Boolean = false)

  private def md5(s: Array[Byte]): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  /** ssh_parse_keyinit (ssh.c:34-117): data is the buffer tail after
    * the 4-byte length + padding byte + code byte; the walk is bounded
    * by `len`, NOT by the message's declared length.
    */
  private def keyinit(buf: Array[Byte], off: Int, len: Int,
      isDst: Boolean): Option[String] = {
    var p = off
    val end = off + len
    var err = false
    // lengths are uint32 in the C: pointer arithmetic zero-extends, so
    // a huge declared length simply overruns and errors (never rewinds)
    def skip(n: Long): Unit =
      if (!err && p + n <= end) p += n.toInt else err = true
    def u32(prev: Long): Long =
      if (!err && p + 4 <= end) {
        val v = ((buf(p) & 0xffL) << 24) | ((buf(p + 1) & 0xffL) << 16) |
          ((buf(p + 2) & 0xffL) << 8) | (buf(p + 3) & 0xffL)
        p += 4; v
      } else { err = true; prev }
    // IMPORT_ptr: on success returns the start offset, on failure -1
    // (value = 0) and errors the cursor
    def ptr(n: Long): Int =
      if (!err && n >= 0 && p + n <= end) { val v = p; p += n.toInt; v }
      else { err = true; -1 }
    val h = new java.io.ByteArrayOutputStream(256)
    var hErr = false
    def exportPtr(at: Int, n: Long): Unit =
      if (at < 0 && n != 0) hErr = true // EXPORT_ptr(hbsb, NULL, len>0)
      else if (at >= 0 && n > 0) h.write(buf, at, n.toInt)
    skip(16) // cookie
    var l = u32(0) // kex_algorithms
    exportPtr(ptr(l), l)
    h.write(';')
    l = u32(l); skip(l) // server_host_key_algorithms
    l = u32(l)
    var v = ptr(l) // encryption_client_to_server
    if (err) return None
    if (!isDst) { exportPtr(v, l); h.write(';') }
    l = u32(l); v = ptr(l) // encryption_server_to_client
    if (err) return None
    if (isDst) { exportPtr(v, l); h.write(';') }
    l = u32(l); v = ptr(l) // mac_client_to_server
    if (err) return None
    if (!isDst) { exportPtr(v, l); h.write(';') }
    l = u32(l); v = ptr(l) // mac_server_to_client
    if (err) return None
    if (isDst) { exportPtr(v, l); h.write(';') }
    l = u32(l); v = ptr(l) // compression_client_to_server
    if (err) return None
    if (!isDst) exportPtr(v, l)
    l = u32(l); v = ptr(l) // compression_server_to_client
    if (err) return None
    if (isDst) exportPtr(v, l)
    if (!err && !hErr) Some(md5(h.toByteArray)) else None
  }

  /** The SSHInfo_t machine over delivered chunks (dir 0 = initiator). */
  def parseChunks(chunks: Seq[(Int, Array[Byte])]): Option[SshInfo] = {
    val version = Seq.newBuilder[String]
    val hassh = Seq.newBuilder[String]
    val hasshServer = Seq.newBuilder[String]
    val key = Seq.newBuilder[String]
    var reverseShell = false
    val buf = Array.ofDim[Byte](2, 8196) // MAX_SSH_BUFFER, 8196 as in C
    val len = new Array[Int](2)
    val packets = new Array[Int](2)
    val counts = Array.ofDim[Int](2, 2)
    var done = false
    var dead = false
    var classified = false

    def feed(which: Int, data: Array[Byte]): Unit = {
      if (dead) return
      packets(which) += 1
      if (packets(which) > 5) {
        if (data.length < 50) counts(which)(0) += 1
        else if (data.length < 100) counts(which)(1) += 1
        if (packets(which) > 15) {
          if (counts(0)(1) > counts(0)(0) && counts(1)(1) > counts(1)(0))
            reverseShell = true
          dead = true
          return
        }
      }
      if (done) return
      if (data.length > 3 && data(0) == 'S' && data(1) == 'S' &&
          data(2) == 'H') {
        var n = data.indexOf(0x0a.toByte)
        if (n > 0 && data(n - 1) == 0x0d) n -= 1
        if (n >= 0)
          version += new String(data, 0, n,
            StandardCharsets.ISO_8859_1).toLowerCase
        return // the rest of a banner chunk is discarded
      }
      val copy = math.min(data.length, buf(which).length - len(which))
      System.arraycopy(data, 0, buf(which), len(which), copy)
      len(which) += copy
      var break = false
      while (!break && len(which) > 6) {
        val sshLen = ((buf(which)(0) & 0xffL) << 24) |
          ((buf(which)(1) & 0xffL) << 16) |
          ((buf(which)(2) & 0xffL) << 8) | (buf(which)(3) & 0xffL)
        if (sshLen < 2 || sshLen > 8196) { done = true; return }
        if (sshLen > len(which) - 4) return // need more bytes
        val code = buf(which)(5) & 0xff
        if (code == 20) {
          val fp = keyinit(buf(which), 6, len(which) - 6, isDst = which == 1)
          fp.foreach(f => if (which == 1) hasshServer += f else hassh += f)
        } else if (code == 33) {
          done = true
          if (len(which) - 6 >= 4) {
            val keyLen = ((buf(which)(6) & 0xffL) << 24) |
              ((buf(which)(7) & 0xffL) << 16) |
              ((buf(which)(8) & 0xffL) << 8) | (buf(which)(9) & 0xffL)
            if (len(which) - 10 >= keyLen)
              key += java.util.Base64.getEncoder.encodeToString(
                java.util.Arrays.copyOfRange(buf(which), 10,
                  10 + keyLen.toInt))
          }
          break = true // the C breaks without consuming
        }
        if (!break) {
          val consumed = (4 + sshLen).toInt
          len(which) -= consumed
          if (len(which) > 0)
            System.arraycopy(buf(which), consumed, buf(which), 0, len(which))
        }
      }
    }

    chunks.foreach { case (dir, data) =>
      if (!classified) {
        if (data.length >= 3 && data(0) == 'S' && data(1) == 'S' &&
            data(2) == 'H') {
          classified = true
          feed(dir, data) // the classify chunk reaches the parser too
        }
      } else feed(dir, data)
    }
    if (!classified) return None
    Some(SshInfo(
      version = version.result().distinct,
      hassh = hassh.result().distinct,
      hasshServer = hasshServer.result().distinct,
      key = key.result().distinct,
      reverseShell = reverseShell))
  }

  /** Peeled tunnel streams lost their packet boundaries: approximate
    * with banner-line chunks (each line through its LF) followed by the
    * binary remainder as one chunk — a whole-stream single chunk would
    * discard everything after the banner (the reference returns after
    * a banner chunk).
    */
  def bannerSplit(stream: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i < stream.length && i + 3 <= stream.length &&
        stream(i) == 'S' && stream(i + 1) == 'S' && stream(i + 2) == 'H') {
      val nl = stream.indexOf(0x0a.toByte, i)
      if (nl < 0) { out += java.util.Arrays.copyOfRange(stream, i, stream.length); i = stream.length }
      else { out += java.util.Arrays.copyOfRange(stream, i, nl + 1); i = nl + 1 }
    }
    if (i < stream.length)
      out += java.util.Arrays.copyOfRange(stream, i, stream.length)
    out.result()
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
