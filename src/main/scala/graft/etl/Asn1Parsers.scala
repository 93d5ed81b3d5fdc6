package graft.etl

import java.nio.charset.StandardCharsets

/** Minimal BER/DER TLV reader, mirroring the reference's asn helpers
  * (capture/parsers.c:374-455 moloch_parsers_asn_get_tlv /
  * get_sequence / sequence_to_string): long-form tags and lengths,
  * length clamped to the remaining buffer, indefinite length rejected.
  */
object Asn1 {

  /** One TLV: constructed flag, tag number, and the value slice. */
  final case class Tlv(pc: Boolean, tag: Int, buf: Array[Byte], off: Int, len: Int) {
    def bytes: Array[Byte] = java.util.Arrays.copyOfRange(buf, off, off + len)
    def string: String = new String(buf, off, len, StandardCharsets.ISO_8859_1)
    def lastByte: Int = if (len > 0) buf(off + len - 1) & 0xff else -1
  }

  /** Read one TLV at `pos` (bounded by `end`); returns (tlv, nextPos).
    *
    * BUG-COMPATIBLE transcription of parsers.c:374-430, quirks included
    * (pinned by Asn1DifferentialFuzzSpec against an independent model):
    *   - a multi-byte (high) tag accumulates the FULL continuation
    *     bytes, bits 7 included (parsers.c:389 `(atag << 7) | ch`), and
    *     its final tag byte doubles as the LENGTH byte — the reference
    *     never reads a separate length after the tag loop, so `1f 05 …`
    *     parses as tag 5 with length 5;
    *   - a tag loop that exhausts the buffer is NOT an error: the last
    *     byte read (high bit set) becomes the length byte, usually a
    *     truncated long form that yields a zero-length value;
    *   - long-form length reads up to its count while bytes remain —
    *     a truncated long form keeps whatever accumulated (no error) —
    *     and wraps as uint32;
    *   - `tag` carries the same 32-bit pattern as the C uint32 (5+ tag
    *     bytes wrap; consumers compare small constants, where signed vs
    *     unsigned agree).
    */
  def getTlv(buf: Array[Byte], pos: Int, end: Int): Option[(Tlv, Int)] = {
    if (pos + 2 > end) return None
    var p = pos
    val ch0 = buf(p) & 0xff; p += 1
    val pc = ((ch0 >> 5) & 1) == 1
    var tag = 0
    var lenByte = 0
    if ((ch0 & 0x1f) == 0x1f) {
      var done = false
      while (!done && p < end) {
        val ch = buf(p) & 0xff; p += 1
        tag = (tag << 7) | ch // full byte, incl. the continuation bit
        lenByte = ch // the last tag byte IS the length byte
        if ((ch & 0x80) == 0) done = true
      }
    } else {
      tag = ch0 & 0x1f
      lenByte = buf(p) & 0xff; p += 1 // pos+2 <= end guarantees this
    }
    if (lenByte == 0x80) return None // indefinite
    var len = 0L // uint32 in the reference
    if ((lenByte & 0x80) != 0) {
      var cnt = lenByte & 0x7f
      while (cnt > 0 && p < end) {
        len = ((len << 8) | (buf(p) & 0xff)) & 0xffffffffL
        p += 1; cnt -= 1
      }
    } else len = lenByte
    val ilen = if (len > (end - p).toLong) end - p else len.toInt
    Some((Tlv(pc, tag, buf, p, ilen), p + ilen))
  }

  /** Children of a wrapper SEQUENCE (pc, tag 16), up to `max`. */
  def getSequence(buf: Array[Byte], pos: Int, end: Int, max: Int): Seq[Tlv] =
    getTlv(buf, pos, end) match {
      case Some((outer, _)) if outer.pc && outer.tag == 16 =>
        children(outer, max)
      case _ => Nil
    }

  /** Flat TLV children of a constructed value, up to `max`. */
  def children(t: Tlv, max: Int): Seq[Tlv] = {
    val out = Seq.newBuilder[Tlv]
    var p = t.off
    val end = t.off + t.len
    var n = 0
    var ok = true
    while (ok && n < max && p < end) {
      getTlv(t.buf, p, end) match {
        case Some((c, np)) => out += c; p = np; n += 1
        case None => ok = false
      }
    }
    out.result()
  }

  /** The reference's sequence_to_string: a primitive's own bytes, or the
    * first inner TLV's bytes of a constructed value.
    */
  def toStr(t: Tlv): Option[String] =
    if (!t.pc) Some(t.string)
    else getTlv(t.buf, t.off, t.off + t.len).map(_._1.string)

  /** OID rendering, bug-compatible with moloch_parsers_asn_decode_oid
    * (parsers.c:474-500): the FIRST component accumulates multi-byte
    * like any other, splits as value/40 "." value%40 only when
    * value > 40 (a bare "40" stays one number where X.690 would say
    * 1.0), and the accumulator is a signed int32 — 5+-byte components
    * wrap negative exactly like the C's %d. A trailing byte with its
    * continuation bit set never prints.
    */
  /** `bufsz` mirrors the caller's C buffer: every reference caller passes
    * either 1000 (the RDN/SPKI walks, tls.c:45/85) or 100 (the alt-name
    * walks, tls.c:152 / dtls.c:93). The truncation reproduces
    * decode_oid's snprintf arithmetic exactly: `buflen` accumulates
    * WOULD-BE lengths (snprintf's return value is the untruncated
    * length), the append gate is `buflen < bufsz`, and writes are
    * contiguous until the first truncation — so the rendered string is
    * the full rendering cut at bufsz-1 chars, possibly mid-component.
    * (Behaviorally inert in the reference today: every consumer compares
    * against short literals or maps unknown OIDs to a constant, so a
    * truncated render and a full render classify identically — the cap
    * exists so any future field that STORES the string stays
    * bug-compatible.)
    */
  def decodeOid(buf: Array[Byte], off: Int, len: Int,
      bufsz: Int = 1000): String = {
    val sb = new StringBuilder
    var wouldBe = 0 // C buflen: cumulative snprintf return values
    var v = 0
    var first = true
    var i = 0
    while (i < len) {
      val c = buf(off + i) & 0xff
      v = (v << 7) | (c & 0x7f)
      if ((c & 0x80) == 0) {
        if (first) {
          first = false
          val s = if (v > 40) s"${v / 40}.${v % 40}" else v.toString
          wouldBe = s.length
          sb.append(s)
        } else if (wouldBe < bufsz) {
          val s = s".$v"
          wouldBe += s.length
          sb.append(s)
        }
        v = 0
      }
      i += 1
    }
    if (sb.length > bufsz - 1) sb.setLength(bufsz - 1)
    sb.toString
  }
}

/** Kerberos 5 KDC-REQ field extraction (reference: capture/parsers/krb5.c).
  *
  * AS-REQ (application tag 10) and TGS-REQ (12) carry a req-body with
  * cname [1], realm [2], sname [3]; PrincipalName's name-string parts
  * join with '/'. Replies and errors are recognized for classification
  * but add no fields, like the reference. TCP framing is a 4-byte
  * big-endian record length whose top two bytes are zero (krb5.c:253-261).
  */
object Krb5Parser {

  final case class Krb5Info(realm: Seq[String], cname: Seq[String], sname: Seq[String])

  /** The 03 02 01 05 pvno signature at the reference's classify offsets
    * (krb5.c:291-294): 7/9 for UDP, 11/13 for TCP (+0 here since the
    * stream starts at the 4-byte record header).
    */
  def isKrb5Udp(payload: Array[Byte]): Boolean =
    hasSig(payload, 7) || hasSig(payload, 9)

  /** krb5_udp_classify (krb5.c:216-231): the needle at 7/9 dispatches,
    * then the callback itself requires a constructed outer TLV with an
    * application tag 10/12/30 (its `len >= olen` check is tautological
    * after get_tlv's clamp). Runs only on the FIRST datagram of a
    * direction (udp.c:85-90).
    */
  def classifiesUdp(payload: Array[Byte]): Boolean =
    isKrb5Udp(payload) && (Asn1.getTlv(payload, 0, payload.length) match {
      case Some((t, _)) => t.pc && (t.tag == 10 || t.tag == 12 || t.tag == 30)
      case None => false
    })

  def isKrb5Tcp(stream: Array[Byte]): Boolean =
    stream.length >= 2 && stream(0) == 0 && stream(1) == 0 &&
      (hasSig(stream, 11) || hasSig(stream, 13))

  private def hasSig(b: Array[Byte], off: Int): Boolean =
    b.length >= off + 4 && b(off) == 3 && b(off + 1) == 2 &&
      b(off + 2) == 1 && b(off + 3) == 5

  /** Split a TCP stream into KDC messages, the way krb5_tcp_parser
    * frames them (krb5.c:240-256, r15 bug-compat alignment):
    *  - the record length is the LOW 16 BITS of the 4-byte prefix
    *    (`data[2] << 8 | data[3]` — bytes 0-1 are ignored by the
    *    parser; the classify gate required them to be 0 only for the
    *    FIRST message);
    *  - a zero length parses an empty message (get_tlv fails, nothing
    *    recorded) and the walk continues — not a stop;
    *  - messages accumulate into a 4096-byte per-direction buffer
    *    (KRB5_MAX_SIZE): a declared length past the cap never
    *    completes, so the walk stops there and everything after is
    *    lost, exactly like the stuck reference buffer.
    */
  def tcpMessages(stream: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var p = 0
    var run = true
    while (run && p + 4 <= stream.length) {
      val len = ((stream(p + 2) & 0xff) << 8) | (stream(p + 3) & 0xff)
      if (len + 4 > 4096 || p + 4 + len > stream.length) run = false
      else {
        out += java.util.Arrays.copyOfRange(stream, p + 4, p + 4 + len)
        p += 4 + len
      }
    }
    out.result()
  }

  /** Parse KDC messages; Some iff at least one valid REQ was seen. */
  def parse(messages: Seq[Array[Byte]]): Option[Krb5Info] = {
    val realm = Seq.newBuilder[String]
    val cname = Seq.newBuilder[String]
    val sname = Seq.newBuilder[String]
    var tagged = false
    messages.foreach { m =>
      Asn1.getTlv(m, 0, m.length).foreach { case (outer, _) =>
        if (outer.pc && (outer.tag == 10 || outer.tag == 12)) {
          val seq = Asn1.getSequence(m, outer.off, outer.off + outer.len, 5)
          if (seq.length >= 3 && seq(0).len > 0 && seq(1).len > 0 &&
              seq(0).pc && seq(0).tag == 1 && seq(0).lastByte == 5 &&
              seq(1).pc && seq(1).tag == 2 &&
              (seq(1).lastByte == 10 || seq(1).lastByte == 12)) {
            tagged = true
            val body =
              if (seq(2).pc && seq(2).tag == 4) Some(seq(2))
              // EXACTLY four children (krb5.c:143 `num == 4`): a fifth
              // parsed child disqualifies the seq(3) position — found
              // by Krb5DifferentialFuzzSpec, r15
              else if (seq.length == 4 && seq(3).pc && seq(3).tag == 4)
                Some(seq(3))
              else None
            body.foreach { b =>
              val els = Asn1.getSequence(b.buf, b.off, b.off + b.len, 12)
              // krb5.c:88-90: a body with fewer than 2 elements records
              // nothing at all
              if (els.length >= 2) els.foreach { el =>
                el.tag match {
                  case 1 => principal(el).foreach(cname += _)
                  case 2 => Asn1.toStr(el).filter(_.nonEmpty).foreach(realm += _)
                  case 3 => principal(el).foreach(sname += _)
                  case _ =>
                }
              }
            }
          }
        }
      }
    }
    if (!tagged) None
    else Some(Krb5Info(realm.result().distinct, cname.result().distinct,
      sname.result().distinct))
  }

  /** PrincipalName: [0] name-type, [1] SEQUENCE OF GeneralString; one
    * part stands alone, two join with '/' (krb5.c:38-62). Exact
    * semantics (r15): the single-part case requires a non-null
    * non-empty string, but the TWO-part case joins unconditionally —
    * an empty or unreadable part renders "" (the C's %.*s with the
    * NULL/0 that sequence_to_string returns), so "a/" and "/b" are
    * real outputs. The C snprintfs into a 255-byte buffer; the
    * truncation is reproduced at 254 chars (the reference's add-length
    * arithmetic past that copies uninitialized stack — unpinnable, and
    * no real principal approaches it).
    */
  private def principal(t: Asn1.Tlv): Option[String] = {
    val seq = Asn1.getSequence(t.buf, t.off, t.off + t.len, 2)
    if (seq.length < 2 || seq(1).tag != 1) return None
    val parts = Asn1.getSequence(seq(1).buf, seq(1).off,
      seq(1).off + seq(1).len, 2)
    parts.length match {
      case 1 =>
        Asn1.toStr(parts(0)).filter(_.nonEmpty)
      case 2 =>
        val a = Asn1.toStr(parts(0)).getOrElse("")
        val b = Asn1.toStr(parts(1)).getOrElse("")
        Some(s"$a/$b".take(254))
      case _ => None
    }
  }
}

/** LDAP bind extraction (reference: capture/parsers/ldap.c). Walks
  * LDAPMessages in a direction's stream; BindRequest (op 0) yields
  * bindname ('<ROOT>' when empty) and authtype (simple/none/sasl/
  * ntlmssp…); an extendedReq/Resp (op 23/24, STARTTLS) ends LDAP — the
  * rest of the stream re-classifies (the reference re-runs classify
  * there, which is how ldap+tls both tag).
  */
object LdapParser {

  final case class LdapInfo(authtype: Seq[String], bindname: Seq[String],
      restOffset: Int)

  /** The dispatcher's needle is the literal byte \x30 (ldap.c:179-180):
    * an application-class constructed tag-16 TLV (0x70) never reaches
    * the callback even though its tag number parses as 16; the 2-byte
    * dispatch floor applies.
    */
  def isLdap(data: Array[Byte]): Boolean =
    data.length >= 2 && (data(0) & 0xff) == 0x30 &&
      (Asn1.getTlv(data, 0, data.length) match {
        case Some((outer, _)) if outer.pc && outer.tag == 16 =>
          Asn1.getTlv(outer.buf, outer.off, outer.off + outer.len) match {
            case Some((mid, np)) if !mid.pc && mid.tag == 2 =>
              Asn1.getTlv(outer.buf, np, outer.off + outer.len) match {
                case Some((op, _)) => op.pc && op.tag <= 25
                case None => false
              }
            case _ => false
          }
        case _ => false
      })

  def parse(stream: Array[Byte]): Option[LdapInfo] = {
    val auth = Seq.newBuilder[String]
    val bind = Seq.newBuilder[String]
    var rest = -1
    var p = 0
    var stop = false
    var sawAny = false
    // the reference accumulates at most 8192 bytes per direction
    // (LDAPInfo_t buf, ldap.c:22-25) — later bytes are truncated away
    val cap = math.min(stream.length, 8192)
    while (!stop && cap - p > 5) {
      Asn1.getTlv(stream, p, cap) match {
        case None => stop = true
        case Some((outer, np)) =>
          val end = outer.off + outer.len
          Asn1.getTlv(outer.buf, outer.off, end) match {
            case Some((mid, afterMid)) if !mid.pc && mid.tag == 2 =>
              Asn1.getTlv(outer.buf, afterMid, end) match {
                case Some((op, _)) if op.pc && op.tag <= 25 =>
                  sawAny = true
                  if (op.tag == 0) { // BindRequest
                    val kids = Asn1.children(op, 3)
                    if (kids.length >= 2) {
                      bind += (if (kids(1).len == 0) "<ROOT>" else kids(1).string)
                      if (kids.length >= 3) {
                        auth += (kids(2).tag match {
                          case 0  => if (kids(2).len == 0) "none" else "simple"
                          case 3  => "sasl"
                          case 10 => "ntlmsspNegotiate"
                          case 11 => "ntlmsspAuth"
                          case t  => t.toString
                        })
                      }
                    }
                  } else if (op.tag == 23 || op.tag == 24) {
                    // the reference re-feeds buf + olen + 2 — the
                    // MESSAGE LENGTH plus an assumed 2-byte header,
                    // from the BUFFER START (ldap.c:93-100): correct
                    // only for a short-form first message, kept
                    // bug-compatibly. extendedReq (23) stops the walk;
                    // extendedResp (24) keeps walking messages.
                    if (rest < 0) rest = math.min(outer.len + 2, cap)
                    if (op.tag == 23) stop = true
                  }
                case _ => stop = true
              }
            case _ => stop = true
          }
          p = np
      }
    }
    if (!sawAny) None
    else Some(LdapInfo(auth.result().distinct, bind.result().distinct, rest))
  }
}
