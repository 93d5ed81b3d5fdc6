package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Asn1

/** Differential fuzz for the shared BER/DER TLV reader against an
  * INDEPENDENT transcription of the reference's asn helper
  * (capture/parsers.c:374-430 moloch_parsers_asn_get_tlv), BSB
  * semantics modeled byte-by-byte from the C text — never from the
  * code under test. The reference's quirks are the spec:
  *
  *   - `remaining < 2` refuses before anything is read;
  *   - high-tag (0x1f) forms accumulate FULL continuation bytes
  *     (`(atag << 7) | ch`, bit 7 not masked), and the loop's final
  *     byte is then REUSED as the length byte — no separate length
  *     read happens in that branch;
  *   - a tag loop that exhausts the buffer is not an error (the last
  *     byte, high bit set, becomes a long-form length whose count
  *     can't be satisfied → zero-length value);
  *   - length 0x80 (indefinite) is the only length error;
  *   - long-form length reads min(count, remaining) bytes, keeps the
  *     partial accumulation on truncation, wraps as uint32;
  *   - the final value length clamps to the remaining buffer.
  *
  * The reader feeds the ldap/krb5 classify gates and the lenient X.509
  * walk, so crafted-input behavior must match the reference's.
  */
class Asn1DifferentialFuzzSpec extends AnyFunSuite {

  /** The model: (apc, atag, alen, valueOffset, nextPos) or None for the
    * C function's NULL (apc/atag/alen zeroed). BSB_IMPORT_u08 past the
    * end sets a sticky error; BSB_REMAINING is bytes left.
    */
  private def model(buf: Array[Byte], pos: Int, end: Int)
      : Option[(Boolean, Int, Int, Int, Int)] = {
    var p = pos
    def remaining = end - p
    if (remaining < 2) return None
    var ch = buf(p) & 0xff; p += 1
    val apc = ((ch >> 5) & 1) == 1
    var atag = 0
    if ((ch & 0x1f) == 0x1f) {
      var break = false
      while (!break && remaining > 0) {
        ch = buf(p) & 0xff; p += 1
        atag = (atag << 7) | ch
        if ((ch & 0x80) == 0) break = true
      }
      // loop exit without terminator: no BSB error was set (imports all
      // succeeded); ch keeps the last byte read
    } else {
      atag = ch & 0x1f
      ch = buf(p) & 0xff; p += 1 // remaining >= 2 held at entry
    }
    if (ch == 0x80) return None
    var alen = 0L
    if ((ch & 0x80) != 0) {
      var cnt = ch & 0x7f
      while (cnt > 0 && remaining > 0) {
        alen = ((alen << 8) | (buf(p) & 0xff)) & 0xffffffffL
        p += 1; cnt -= 1
      }
    } else alen = ch
    if (alen > remaining.toLong) alen = remaining.toLong
    val off = p
    p += alen.toInt
    Some((apc, atag, alen.toInt, off, p))
  }

  private def check(buf: Array[Byte], label: String): Unit = {
    val got = Asn1.getTlv(buf, 0, buf.length)
      .map { case (t, np) => (t.pc, t.tag, t.len, t.off, np) }
    val want = model(buf, 0, buf.length)
    assert(got == want,
      s"$label bytes=${buf.map(b => f"${b & 0xff}%02x").mkString(" ")}")
  }

  test("seeded random buffers parse identically to the reference model") {
    var seed = 0xa51dead5L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 0 until 4000) {
      val n = nextInt(24)
      val buf = Array.fill[Byte](n)(nextInt(256).toByte)
      check(buf, s"random trial $trial")
    }
  }

  test("structured trials: every tag form x length form x truncation") {
    var seed = 0x0beef00dL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    val tagHeads = Seq[Seq[Int]](
      Seq(0x02), Seq(0x30), Seq(0x6a), Seq(0x70), Seq(0xdf, 0x05),
      Seq(0x1f, 0x05), Seq(0x1f, 0x85, 0x22), Seq(0x1f, 0x85),
      Seq(0x1f, 0x85, 0x91, 0xa2, 0xb3, 0x44), Seq(0x5f, 0x80, 0x00))
    val lenForms = Seq[Seq[Int]](
      Seq(0x00), Seq(0x05), Seq(0x7f), Seq(0x80), Seq(0x81, 0x03),
      Seq(0x82, 0x00, 0x04), Seq(0x84, 0xff, 0xff, 0xff, 0xff),
      Seq(0x85, 0x01, 0x02, 0x03, 0x04, 0x05), Seq(0x81))
    for {
      th <- tagHeads
      lf <- lenForms
    } {
      val body = Seq.fill(nextInt(9))(nextInt(256))
      // NOTE: for high-tag heads the reference never reads a separate
      // length byte, so `lf` bytes land in the VALUE — the model and
      // the reader must agree on that too
      val full = (th ++ lf ++ body).map(_.toByte).toArray
      for (cut <- 0 to full.length)
        check(full.take(cut), s"head=$th len=$lf cut=$cut")
    }
  }

  /** Independent transcription of moloch_parsers_asn_decode_oid
    * (parsers.c:474-500): signed int32 accumulator, first component
    * printed bare unless value > 40, and a LITERAL snprintf emulation
    * for the caller's buffer — writes truncate at bufsz-1 chars while
    * `buflen` accumulates snprintf's would-be return values, and the
    * append gate is `buflen < bufsz` (so truncation can land
    * mid-component and appends stop only once the would-be length
    * passes the buffer).
    */
  private def modelOid(oid: Array[Byte], bufsz: Int = 1000): String = {
    val buf = new Array[Char](bufsz)
    var buflen = 0
    def snprintf(at: Int, space: Int, s: String): Int = {
      var i = 0
      while (i < s.length && i < space - 1) { buf(at + i) = s(i); i += 1 }
      s.length // snprintf returns the UNtruncated length
    }
    var first = true
    var value = 0
    for (pos <- oid.indices) {
      value = (value << 7) | (oid(pos) & 0x7f)
      if ((oid(pos) & 0x80) == 0) {
        if (first) {
          first = false
          val s = if (value > 40) s"${value / 40}.${value % 40}" else s"$value"
          buflen = snprintf(0, bufsz, s)
        } else if (buflen < bufsz)
          buflen += snprintf(buflen, bufsz - buflen, s".$value")
        value = 0
      }
    }
    new String(buf, 0, math.min(buflen, bufsz - 1))
  }

  test("OID rendering matches the reference model") {
    var seed = 0x01dbeefL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 0 until 2000) {
      val oid = Array.fill[Byte](nextInt(14))(nextInt(256).toByte)
      assert(Asn1.decodeOid(oid, 0, oid.length) == modelOid(oid),
        s"trial $trial " + oid.map(b => f"${b & 0xff}%02x").mkString(" "))
    }
    // pinned quirks: bare 40 stays one number (X.690 would say 1.0);
    // multi-byte FIRST component still splits; int32 wrap goes negative
    assert(Asn1.decodeOid(Array[Byte](0x28), 0, 1) == "40")
    assert(Asn1.decodeOid(Array[Byte](0x29), 0, 1) == "1.1")
    assert(Asn1.decodeOid(Array[Byte](0x55, 4, 3), 0, 3) == "2.5.4.3")
    assert(Asn1.decodeOid(Array[Byte](0x81.toByte, 0x34), 0, 2) == "4.20")
    assert(Asn1.decodeOid(
      Array[Byte](0x2a, 0xff.toByte, 0xff.toByte, 0xff.toByte,
        0xff.toByte, 0x7f), 0, 6).startsWith("1.2.-"))
    // caller-buffer truncation (tls.c:152/dtls.c:93 pass bufsz=100, the
    // RDN/SPKI walks 1000): long OIDs must cut exactly like snprintf —
    // at bufsz-1 chars, possibly mid-component. bufsz=8 stresses cuts
    // inside the FIRST component too.
    for (trial <- 0 until 2000) {
      val oid = Array.fill[Byte](1 + nextInt(120))(nextInt(256).toByte)
      for (bufsz <- Seq(8, 100, 1000))
        assert(Asn1.decodeOid(oid, 0, oid.length, bufsz) ==
          modelOid(oid, bufsz),
          s"trunc trial $trial bufsz=$bufsz " +
            oid.map(b => f"${b & 0xff}%02x").mkString(" "))
    }
    // a 100-char-plus rendering truncates mid-component at 99 chars
    val many = Array.fill[Byte](60)(1) // "1" + 59 × ".1" = 119 chars
    val t = Asn1.decodeOid(many, 0, many.length, 100)
    assert(t.length == 99 && t == modelOid(many, 100))
    assert(Asn1.decodeOid(many, 0, many.length) == "1" + ".1" * 59)
  }

  test("pinned quirks from parsers.c") {
    // high-tag final byte doubles as the length: 1f 05 -> tag 5, and the
    // 05 length byte claims 5 which clamps to the 3 remaining bytes
    val q1 = Array[Byte](0x1f, 0x05, 1, 2, 3)
    val Some((t1, n1)) = Asn1.getTlv(q1, 0, q1.length)
    assert(t1.tag == 5 && t1.len == 3 && t1.off == 2 && n1 == 5)
    // continuation bits stay in the tag: df 85 22 -> tag (0x85<<7)|0x22
    val q2 = Array[Byte](0xdf.toByte, 0x85.toByte, 0x22, 9, 9)
    val Some((t2, _)) = Asn1.getTlv(q2, 0, q2.length)
    assert(t2.tag == ((0x85 << 7) | 0x22))
    assert(t2.len == 0x22.min(2)) // length byte 0x22 clamped to remaining
    // truncated long-form length keeps the partial accumulation
    val q3 = Array[Byte](0x04, 0x82.toByte, 0x01)
    val Some((t3, _)) = Asn1.getTlv(q3, 0, q3.length)
    assert(t3.len == 0) // alen=1 accumulated, clamped to 0 remaining
    // indefinite length is the only length error
    assert(Asn1.getTlv(Array[Byte](0x30, 0x80.toByte, 1, 2), 0, 4).isEmpty)
    // exhausted tag loop is not an error: zero-length value at the end
    val q5 = Array[Byte](0x1f, 0x81.toByte)
    val Some((t5, n5)) = Asn1.getTlv(q5, 0, q5.length)
    assert(t5.len == 0 && n5 == 2)
  }
}
