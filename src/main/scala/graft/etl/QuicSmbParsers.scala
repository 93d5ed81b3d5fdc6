package graft.etl

import java.nio.charset.StandardCharsets

/** Google-QUIC (Q024-Q05x) client-hello extraction — rebuilt as a
  * byte-exact transcription of the reference parser
  * (capture/parsers/quic.c) over moloch's UDP dispatch rules
  * (udp.c:85-94), pinned by QuicDifferentialFuzzSpec plus goldens.
  *
  * The reference machine, which this reproduces:
  *  - UDP CLASSIFIERS run only on the FIRST datagram of each direction
  *    (udp.c:85-90): "Q05"/"Q04" at offset 1 with len > 100 and a 0xc0
  *    first byte register the 5x/4648 parsers; "Q02"/"Q03"/"Q04" at
  *    offset 9 with len > 100 and (byte0 & 0x83) == 0x01 register the
  *    2445 parser; "PRST" at offset 9 tags quic outright. A session
  *    whose first datagrams don't match never parses, no matter what
  *    comes later.
  *  - registered parsers then see EVERY datagram (both directions,
  *    including the registration datagram) until they unregister.
  *  - quic_2445 (quic.c:91-186): stays registered through short/reset/
  *    non-frame datagrams; unregisters on version < 24 (including a
  *    missing version) and after the first stream frame, whose CHLO
  *    parse is attempted on MIN(declared, remaining) bytes; the
  *    little-endian frame data length 4 is rewritten to 1024
  *    (quic.c:170-172).
  *  - quic_4648 (quic.c:189-218): the first datagram that is not a
  *    long-header Q04x packet unregisters; otherwise brute-force CHLO
  *    scan to len-20, parse + unregister on a hit.
  *  - quic_5x (quic.c:221-239): unregisters on the first non-Q05
  *    datagram; tags quic once BOTH directions delivered Q05 packets;
  *    gives up after 20 datagrams.
  *  - quic_chlo_parser (quic.c:38-90): tags quic once the 8-byte tag
  *    header imports; the CHLO walk needs remaining >= tagLen*8 + 8
  *    AFTER the header; subtag end offsets are cumulative
  *    little-endian u32s, and a non-monotonic or overflowing offset
  *    stops the walk. The function "succeeds" (fbzero's gate) whenever
  *    the CHLO walk STARTED, even if an entry was bad.
  *  - FBZero (quic.c:284-320): client direction only, accumulated into
  *    a 4096-byte buffer — a declared length past the buffer cap never
  *    parses; "fbzero" tags only when the CHLO walk started, while
  *    "quic" tags on the header alone.
  */
object QuicParser {

  final case class QuicInfo(host: Seq[String], useragent: Seq[String],
      version: Seq[String], tagged: Boolean,
      // the fbzero gate: quic_chlo_parser returned 1 (CHLO walk started)
      chloOk: Boolean = false)

  private def at(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length &&
      new String(b, off, s.length, StandardCharsets.ISO_8859_1) == s

  /** quic_chlo_parser over data[off, off+len): returns (headerRead,
    * walkStarted, hosts, uas, versions).
    */
  private def chloParse(data: Array[Byte], off: Int, len: Int)
      : (Boolean, Boolean, Seq[String], Seq[String], Seq[String]) = {
    if (len < 8) return (false, false, Nil, Nil, Nil)
    // LIMPORT: tag(4) + LE u16 tagLen + skip 2 — "quic" tags here
    val n = (data(off + 4) & 0xff) | ((data(off + 5) & 0xff) << 8)
    if (!at(data, off, "CHLO") || len - 8 < n * 8 + 8)
      return (true, false, Nil, Nil, Nil)
    val host = Seq.newBuilder[String]
    val ua = Seq.newBuilder[String]
    val ver = Seq.newBuilder[String]
    val tableEnd = off + 8 + n * 8
    val dlen = len - 8 - n * 8
    var start = 0
    var i = 0
    var ok = true
    while (ok && i < n) {
      val e = off + 8 + i * 8
      val sub = new String(data, e, 4, StandardCharsets.ISO_8859_1)
      val endOff = (data(e + 4) & 0xff) | ((data(e + 5) & 0xff) << 8) |
        ((data(e + 6) & 0xff) << 16) | ((data(e + 7) & 0xff) << 24)
      if (endOff > dlen || start > dlen || start >= endOff) ok = false
      else {
        val v = new String(data, tableEnd + start, endOff - start,
          StandardCharsets.ISO_8859_1)
        sub match {
          case "SNI\u0000" => host += v
          case "UAID"       => ua += v
          case "VER\u0000" => ver += v
          case _            =>
        }
        start = endOff
      }
      i += 1
    }
    (true, true, host.result(), ua.result(), ver.result())
  }

  /** FBZero (QUIC-over-TCP): 0x31 'QTV', LE length at bytes 5-6, CHLO
    * at offset 9, accumulated to a 4096-byte cap — a longer declared
    * block never parses (FBZERO_MAX_SIZE, quic.c:27,292-299).
    */
  def parseFbzero(srcStream: Array[Byte]): Option[QuicInfo] = {
    if (srcStream.length < 14 || (srcStream(0) & 0xff) != 0x31 ||
      srcStream(1) != 'Q' || srcStream(2) != 'T' || srcStream(3) != 'V')
      return None
    val len = ((srcStream(6) & 0xff) << 8) | (srcStream(5) & 0xff)
    if (9 + len > 4096) return None // buffer cap: never completes
    if (srcStream.length < 9 + len) return None
    val (hdr, walked, h, u, v) = chloParse(srcStream, 9, len)
    if (!hdr) None
    else Some(QuicInfo(h.distinct, u.distinct, v.distinct, tagged = true,
      chloOk = walked))
  }

  /** Compat wrapper for specs without capture interleaving: src
    * datagrams first, then dst.
    */
  def parse(src: Seq[Array[Byte]], dst: Seq[Array[Byte]])
      : Option[QuicInfo] =
    parseDatagrams(src.map(0 -> _) ++ dst.map(1 -> _))

  /** The UDP machine over (direction, datagram) pairs in arrival
    * order.
    */
  def parseDatagrams(dgrams: Seq[(Int, Array[Byte])]): Option[QuicInfo] = {
    val host = Seq.newBuilder[String]
    val ua = Seq.newBuilder[String]
    val ver = Seq.newBuilder[String]
    var tagged = false

    def chlo(data: Array[Byte], off: Int, len: Int): Unit = {
      val (hdr, _, h, u, v) = chloParse(data, off, len)
      if (hdr) tagged = true
      host ++= h; ua ++= u; ver ++= v
    }

    var active2445 = false
    var active4648 = false
    var active5x = false
    var bits5x = 0
    var pkts5x = 0
    val firstSeen = new Array[Boolean](2)

    // returns false to unregister
    def run2445(d: Array[Byte]): Boolean = {
      if (d.length < 9) return true
      if ((d(0) & 0x02) != 0) return true
      var off = 1
      if ((d(0) & 0x08) != 0) off += 8
      if (d.length < off + 5) return true
      var version = -1
      if ((d(0) & 0x01) != 0 && d(off) == 'Q') {
        version = ((d(off + 1) & 0xff) - '0') * 100 +
          ((d(off + 2) & 0xff) - '0') * 10 + ((d(off + 3) & 0xff) - '0')
        off += 4
      }
      if (version < 24) return false // incl. version -1
      off += (if ((d(0) & 0x30) == 0) 1 else ((d(0) & 0x30) >> 4) * 2)
      off += 12 // message-auth hash
      if (version < 34) off += 1 // private flags
      if (off > d.length) return true
      var p = off
      while (p < d.length) { // while REMAINING
        val t = d(p) & 0xff; p += 1
        if ((t & 0x80) == 0) return true // keeps the parser
        val offsetLen = if ((t & 0x1c) != 0) ((t & 0x1c) >> 2) + 1 else 0
        val streamLen = (t & 0x03) + 1
        p += streamLen + offsetLen
        var dataLen = math.max(0, d.length - p) // pre-u16 REMAINING
        var err = p > d.length
        if ((t & 0x20) != 0) {
          if (p + 2 <= d.length && !err) {
            dataLen = (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8) // LE
            p += 2
            if (dataLen == 4) dataLen = 1024 // quic.c:170-172 quirk
          } else err = true
        }
        if (err) return true // BSB error path: return 0, stay registered
        chlo(d, p, math.min(dataLen, d.length - p))
        return false // first frame processed: unregister
      }
      true
    }

    def run4648(d: Array[Byte]): Boolean = {
      if (d.length < 20 || d(1) != 'Q' || (d(0) & 0xc0) != 0xc0)
        return false
      val version = ((d(2) & 0xff) - '0') * 100 +
        ((d(3) & 0xff) - '0') * 10 + ((d(4) & 0xff) - '0')
      if (version < 46 || version > 48) return false
      var p = 5
      while (p < d.length - 20) {
        if (d(p) == 'C' && at(d, p, "CHLO")) {
          chlo(d, p, d.length - p)
          return false
        }
        p += 1
      }
      true
    }

    def run5x(dir: Int, d: Array[Byte]): Boolean = {
      if (d.length < 20 || !at(d, 1, "Q05")) return false
      bits5x |= 1 << dir
      if (bits5x == 0x3) { tagged = true; return false }
      pkts5x += 1
      if (pkts5x > 20) return false
      true
    }

    dgrams.foreach { case (dir, d) =>
      if (!firstSeen(dir)) {
        firstSeen(dir) = true
        // classifiers, first datagram of the direction only (udp.c:90)
        if (d.length > 100 && (d(0) & 0xc0) == 0xc0) {
          if (at(d, 1, "Q05") && !active5x) {
            active5x = true; bits5x = 1 << dir; pkts5x = 0
          }
          if (at(d, 1, "Q04")) active4648 = true
        }
        if (d.length > 100 && (d(0) & 0x83) == 0x01 &&
          (at(d, 9, "Q02") || at(d, 9, "Q03") || at(d, 9, "Q04")))
          active2445 = true
        if (at(d, 9, "PRST")) tagged = true
      }
      // registered parsers see this datagram too
      if (active2445) active2445 = run2445(d)
      if (active4648) active4648 = run4648(d)
      if (active5x) active5x = run5x(dir, d)
    }

    if (!tagged) None
    else Some(QuicInfo(host.result().distinct, ua.result().distinct,
      ver.result().distinct, tagged))
  }
}

/** SMB1/SMB2 metadata extraction (reference: capture/parsers/smb.c).
  * NetBIOS-framed PDUs per direction; SMB1 session-setup yields user/
  * domain/os/version (and the NTLMSSP AUTHENTICATE blob yields domain/
  * user/host), tree-connect yields share, create/open/delete yield
  * filenames; SMB2 tree-connect/create the same via offset fields.
  */
object SmbParser {

  final case class SmbInfo(domain: Seq[String], user: Seq[String],
      host: Seq[String], os: Seq[String], version: Seq[String],
      share: Seq[String], filename: Seq[String],
      // an NTLMSSP triplet pointed outside the blob (smb.c:131-133 tag)
      badSecurityBlob: Boolean = false)

  def isSmb(stream: Array[Byte]): Boolean =
    stream.length >= 8 && ((stream(4) & 0xff) == 0xff || (stream(4) & 0xff) == 0xfe) &&
      stream(5) == 'S' && stream(6) == 'M' && stream(7) == 'B'

  private final class Acc {
    val domain = Seq.newBuilder[String]; val user = Seq.newBuilder[String]
    val host = Seq.newBuilder[String]; val os = Seq.newBuilder[String]
    val ver = Seq.newBuilder[String]; val share = Seq.newBuilder[String]
    val fn = Seq.newBuilder[String]
    var badBlob = false
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  /** Bytes → string: UCS-2LE when the unicode flag is set, else latin-1;
    * stops at the terminating NUL either way.
    */
  private def str(b: Array[Byte], off: Int, len: Int, unicode: Boolean): String = {
    if (len <= 0 || off < 0 || off >= b.length) return ""
    val end = math.min(off + len, b.length)
    if (unicode) {
      val sb = new StringBuilder
      var i = off
      var done = false
      while (!done && i + 1 < end) {
        val c = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        if (c == 0) done = true else { sb.append(c.toChar); i += 2 }
      }
      sb.toString
    } else {
      var i = off
      while (i < end && b(i) != 0) i += 1
      new String(b, off, i - off, StandardCharsets.ISO_8859_1)
    }
  }

  /** NUL-separated string list (ascii or ucs2), like smb1_str_null_split. */
  private def nulSplit(b: Array[Byte], off: Int, len: Int, unicode: Boolean,
      max: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var p = off
    val end = math.min(off + len, b.length)
    var n = 0
    while (n < max && p < end) {
      val s = str(b, p, end - p, unicode)
      out += s
      p += (if (unicode) (s.length + 1) * 2 else s.length + 1)
      n += 1
    }
    out.result().padTo(max, "")
  }

  /** NTLMSSP AUTHENTICATE inside the SPNEGO blob → domain/user/host
    * (smb.c:85-149; [MS-NLMP] 2.2.1.3).
    */
  private def securityBlob(b: Array[Byte], off: Int, len: Int, acc: Acc): Unit = {
    val end = math.min(off + len, b.length)
    // SPNEGO: [1] { SEQUENCE { [2] OCTET-STRING(NTLMSSP...) } }
    var ntlm: Option[(Int, Int)] = None
    for {
      (t1, _) <- Asn1.getTlv(b, off, end); if t1.tag == 1
      (t2, _) <- Asn1.getTlv(b, t1.off, t1.off + t1.len); if t2.tag == 16
      (t3, _) <- Asn1.getTlv(b, t2.off, t2.off + t2.len); if t3.tag == 2
      (t4, _) <- Asn1.getTlv(b, t3.off, t3.off + t3.len); if t4.tag == 4
    } {
      if (t4.len >= 7 && new String(b, t4.off, 7, StandardCharsets.ISO_8859_1) == "NTLMSSP")
        ntlm = Some((t4.off, t4.len))
    }
    ntlm.foreach { case (noff, nlen) =>
      if (nlen < 12 + 6 * 8) return
      val tpe = u32le(b, noff + 8)
      if (tpe != 3) return
      // 6 (len16, maxlen16, offset32) triplets: lmresp, ntresp, domain,
      // user, host, sessionkey
      val lens = new Array[Int](6); val offs = new Array[Int](6)
      var i = 0
      while (i < 6) {
        lens(i) = u16le(b, noff + 12 + i * 8)
        offs(i) = (u32le(b, noff + 12 + i * 8 + 4) & 0x7fffffffL).toInt
        if (offs(i) > nlen || lens(i) > nlen || offs(i) + lens(i) > nlen) {
          acc.badBlob = true // smb.c:131-133 smb:bad-security-blob
          return
        }
        i += 1
      }
      if (lens(2) > 0) acc.domain += str(b, noff + offs(2), lens(2), unicode = true)
      if (lens(3) > 0) acc.user += str(b, noff + offs(3), lens(3), unicode = true)
      if (lens(4) > 0) acc.host += str(b, noff + offs(4), lens(4), unicode = true)
    }
  }

  private def parseSmb1Pdu(b: Array[Byte], pduOff: Int, pduEnd: Int, acc: Acc): Unit = {
    if (pduEnd - pduOff < 32) return
    val cmd = b(pduOff + 4) & 0xff
    val flags = b(pduOff + 9) & 0xff
    val flags2 = u16le(b, pduOff + 10)
    val unicode = (flags2 & 0x8000) != 0
    if ((flags & 0x80) != 0) return // reply
    val body = pduOff + 32 // after the fixed SMB1 header
    if (body >= pduEnd) return
    cmd match {
      case 0xa2 | 0x2d | 0x06 => // nt-create / open / delete: filename
        val wc = b(body) & 0xff
        val p = body + 1 + wc * 2 + 3
        if (p < pduEnd) {
          val s = str(b, p, pduEnd - p, unicode)
          if (s.nonEmpty) acc.fn += s
        }
      case 0x75 => // tree connect andx: share path after the password
        if (body + 10 <= pduEnd) {
          val passlen = u16be(b, body + 6) // reference reads BE here (smb.c:311)
          var p = body + 8 + 2 + passlen
          p += (if ((p - body) % 2 == 0) 2 else 1)
          if (p < pduEnd) {
            val s = str(b, p, pduEnd - p, unicode)
            if (s.nonEmpty) acc.share += s
          }
        }
      case 0x73 => // session setup andx
        val wc = b(body) & 0xff
        if (wc == 12 && body + 15 + 2 + 10 <= pduEnd) {
          val seclen = u16le(b, body + 15)
          var p = body + 15 + 2 + 10
          if (p + seclen <= pduEnd) {
            securityBlob(b, p, seclen, acc)
            p += seclen
            p += (if ((p - body) % 2 == 0) 0 else 1)
            val parts = nulSplit(b, p, pduEnd - p, unicode, 3)
            if (parts(0).nonEmpty) acc.os += parts(0)
            if (parts(1).nonEmpty) acc.ver += parts(1)
            if (parts(2).nonEmpty) acc.domain += parts(2)
          }
        } else if (wc == 13 && body + 15 + 4 + 10 <= pduEnd) {
          val ansipw = u16le(b, body + 15)
          val upw = u16le(b, body + 17)
          var p = body + 19 + 10 + ansipw + upw
          p += (if ((p - body) % 2 == 0) 0 else 1)
          if (p < pduEnd) {
            val parts = nulSplit(b, p, pduEnd - p, unicode, 4)
            if (parts(0).nonEmpty) acc.user += parts(0)
            if (parts(1).nonEmpty) acc.domain += parts(1)
            if (parts(2).nonEmpty) acc.os += parts(2)
            if (parts(3).nonEmpty) acc.ver += parts(3)
          }
        }
      case _ =>
    }
  }

  private def parseSmb2Pdu(b: Array[Byte], pduOff: Int, pduEnd: Int, acc: Acc): Unit = {
    if (pduEnd - pduOff < 64) return
    val cmd = u16le(b, pduOff + 12)
    val flags = u32le(b, pduOff + 16)
    if ((flags & 1) != 0) return // server-to-client
    val body = pduOff + 64
    cmd match {
      case 3 => // tree connect: path offset/len relative to header start
        if (body + 8 <= pduEnd) {
          val pathOff = u16le(b, body + 4)
          val pathLen = u16le(b, body + 6)
          val p = pduOff + pathOff
          if (pathLen > 0 && p + pathLen <= pduEnd) {
            val s = str(b, p, pathLen, unicode = true)
            if (s.nonEmpty) acc.share += s
          }
        }
      case 5 => // create: name offset/len
        if (body + 48 <= pduEnd) {
          val nameOff = u16le(b, body + 44)
          val nameLen = u16le(b, body + 46)
          val p = pduOff + nameOff
          if (nameLen > 0 && p + nameLen <= pduEnd) {
            val s = str(b, p, nameLen, unicode = true)
            if (s.nonEmpty) acc.fn += s
          }
        }
      case _ =>
    }
  }

  /** Walk one direction's NetBIOS-framed stream. */
  private def direction(stream: Array[Byte], acc: Acc): Unit = {
    var p = 0
    while (p + 8 <= stream.length) {
      val remlen = ((stream(p + 1) & 0xff) << 16) | ((stream(p + 2) & 0xff) << 8) |
        (stream(p + 3) & 0xff)
      if (remlen <= 0) return
      val pduOff = p + 4
      val pduEnd = math.min(pduOff + remlen, stream.length)
      val ver = stream(pduOff) & 0xff
      if (ver == 0xff && isSig(stream, pduOff)) parseSmb1Pdu(stream, pduOff, pduEnd, acc)
      else if (ver == 0xfe && isSig(stream, pduOff)) parseSmb2Pdu(stream, pduOff, pduEnd, acc)
      p = pduOff + remlen
    }
  }

  private def isSig(b: Array[Byte], off: Int): Boolean =
    off + 4 <= b.length && b(off + 1) == 'S' && b(off + 2) == 'M' && b(off + 3) == 'B'

  def parse(srcStream: Array[Byte], dstStream: Array[Byte]): Option[SmbInfo] = {
    val acc = new Acc
    direction(srcStream, acc)
    direction(dstStream, acc)
    val info = SmbInfo(acc.domain.result().distinct, acc.user.result().distinct,
      acc.host.result().distinct, acc.os.result().distinct,
      acc.ver.result().distinct, acc.share.result().distinct,
      acc.fn.result().distinct, badSecurityBlob = acc.badBlob)
    if (!info.badSecurityBlob && info.productIterator.collect {
      case s: Seq[_] => s
    }.forall(_.isEmpty)) None
    else Some(info)
  }
}
