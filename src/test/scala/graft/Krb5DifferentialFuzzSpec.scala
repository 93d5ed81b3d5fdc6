package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Krb5Parser

/** Differential fuzz of the Kerberos message walk against an
  * independent second transcription of the reference
  * (capture/parsers/krb5.c over parsers.c's ASN helpers) — the
  * ASN.1/HTTP/SMTP/DNS/TLS/SSH/QUIC/DHCP pattern.
  *
  * Quirk surface both transcribe (and the generator aims at):
  *  - moloch's get_tlv (parsers.c:390-430): pc is BIT 5 of the first
  *    byte (not the DER constructed bit semantics alone — application
  *    tags read pc=1), long-form tags (0x1f) accumulate 7-bit groups
  *    and then REUSE the last tag byte as the length (no length byte
  *    is ever read — a genuine reference bug), 0x80 indefinite
  *    lengths error out, and lengths clamp to the remaining bytes;
  *  - KDC-REQ gates: outer pc + tag 10/12, inner wrapper SEQUENCE,
  *    at least 3 children, pvno = LAST byte of seq[0]'s value == 5
  *    (any trailing-5 garbage passes), msg-type = last byte of
  *    seq[1] == 10/12; the req-body is accepted at seq[2] OR — only
  *    when exactly 4 children parsed — seq[3];
  *  - a req-body with fewer than 2 elements records nothing;
  *  - PrincipalName: one part must be non-empty; two parts join with
  *    '/' unconditionally — unreadable or empty parts render "";
  *  - sequence_to_string: a primitive's own bytes, a constructed
  *    value's FIRST inner TLV (null when unreadable).
  */
class Krb5DifferentialFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- model

  /** moloch_parsers_asn_get_tlv re-derivation: returns
    * (pc, tag, valueOff, valueLen, nextPos) or None.
    */
  private def mTlv(b: Array[Byte], pos: Int, end: Int)
      : Option[(Boolean, Long, Int, Int, Int)] = {
    if (end - pos < 2) return None
    var p = pos
    var ch = b(p) & 0xff; p += 1
    val pc = ((ch >> 5) & 1) == 1
    var tag = 0L
    if ((ch & 0x1f) == 0x1f) {
      var going = true
      while (going && p < end) {
        ch = b(p) & 0xff; p += 1
        tag = ((tag << 7) | ch) & 0xffffffffL
        if ((ch & 0x80) == 0) going = false
      }
      // NOTE: no length byte is read — ch (the last tag byte) IS the
      // length field below
    } else {
      tag = ch & 0x1f
      if (p >= end) return None // length-byte import fails
      ch = b(p) & 0xff; p += 1
    }
    if (ch == 0x80) return None // indefinite
    var len = 0L
    if ((ch & 0x80) != 0) {
      var cnt = ch & 0x7f
      while (cnt > 0 && p < end) {
        len = ((len << 8) | (b(p) & 0xff)) & 0xffffffffL
        p += 1; cnt -= 1
      }
    } else len = ch
    if (len > end - p) len = end - p
    Some((pc, tag, p, len.toInt, p + len.toInt))
  }

  private def mChildren(b: Array[Byte], pos: Int, end: Int, max: Int)
      : List[(Boolean, Long, Int, Int)] = {
    var out = List.empty[(Boolean, Long, Int, Int)]
    var p = pos
    var n = 0
    var ok = true
    while (ok && n < max && p < end) {
      mTlv(b, p, end) match {
        case Some((pc, tag, off, len, np)) =>
          out ::= ((pc, tag, off, len)); p = np; n += 1
        case None => ok = false
      }
    }
    out.reverse
  }

  /** get_sequence(wrapper=TRUE) */
  private def mSeq(b: Array[Byte], pos: Int, end: Int, max: Int)
      : List[(Boolean, Long, Int, Int)] =
    mTlv(b, pos, end) match {
      case Some((pc, 16, off, len, _)) if pc =>
        mChildren(b, off, off + len, max)
      case _ => Nil
    }

  /** sequence_to_string */
  private def mToStr(b: Array[Byte], t: (Boolean, Long, Int, Int))
      : Option[String] = {
    val (pc, _, off, len) = t
    if (!pc)
      Some(new String(b, off, len, StandardCharsets.ISO_8859_1))
    else mTlv(b, off, off + len).map { case (_, _, o2, l2, _) =>
      new String(b, o2, l2, StandardCharsets.ISO_8859_1)
    }
  }

  private def mPrincipal(b: Array[Byte], t: (Boolean, Long, Int, Int))
      : Option[String] = {
    val seq = mSeq(b, t._3, t._3 + t._4, 2)
    if (seq.length < 2 || seq(1)._2 != 1) return None
    val inner = seq(1)
    val parts = mSeq(b, inner._3, inner._3 + inner._4, 2)
    parts.length match {
      case 1 => mToStr(b, parts.head).filter(_.nonEmpty)
      case 2 =>
        val a = mToStr(b, parts(0)).getOrElse("")
        val c = mToStr(b, parts(1)).getOrElse("")
        Some(s"$a/$c".take(254))
      case _ => None
    }
  }

  private final case class MK(realm: List[String], cname: List[String],
      sname: List[String])

  private def mParse(msgs: Seq[Array[Byte]]): Option[MK] = {
    var realm = List.empty[String]
    var cname = List.empty[String]
    var sname = List.empty[String]
    var tagged = false
    msgs.foreach { m =>
      mTlv(m, 0, m.length).foreach { case (opc, otag, ooff, olen, _) =>
        if (opc && (otag == 10 || otag == 12)) {
          val seq = mSeq(m, ooff, ooff + olen, 5)
          if (seq.length >= 3 && seq(0)._4 > 0 && seq(1)._4 > 0 &&
            seq(0)._1 && seq(0)._2 == 1 &&
            (m(seq(0)._3 + seq(0)._4 - 1) & 0xff) == 5 &&
            seq(1)._1 && seq(1)._2 == 2 && {
              val mt = m(seq(1)._3 + seq(1)._4 - 1) & 0xff
              mt == 10 || mt == 12
            }) {
            tagged = true
            val body =
              if (seq(2)._1 && seq(2)._2 == 4) Some(seq(2))
              else if (seq.length == 4 && seq(3)._1 && seq(3)._2 == 4)
                Some(seq(3))
              else None
            body.foreach { bdy =>
              val els = mSeq(m, bdy._3, bdy._3 + bdy._4, 12)
              if (els.length >= 2) els.foreach { el =>
                el._2 match {
                  case 1 => mPrincipal(m, el).foreach(cname ::= _)
                  case 2 => mToStr(m, el).filter(_.nonEmpty)
                    .foreach(realm ::= _)
                  case 3 => mPrincipal(m, el).foreach(sname ::= _)
                  case _ =>
                }
              }
            }
          }
        }
      }
    }
    if (tagged)
      Some(MK(realm.reverse.distinct, cname.reverse.distinct,
        sname.reverse.distinct))
    else None
  }

  // ------------------------------------------------------------- compare

  private def compare(msgs: Seq[Array[Byte]], label: String): Unit = {
    val m = mParse(msgs)
    val p = Krb5Parser.parse(msgs)
    (m, p) match {
      case (None, None) => ()
      case (Some(a), Some(b)) =>
        val mf = Seq("realm" -> a.realm, "cname" -> a.cname,
          "sname" -> a.sname)
        val pf = Seq("realm" -> b.realm.toList, "cname" -> b.cname.toList,
          "sname" -> b.sname.toList)
        val diffs = mf.zip(pf).filter { case ((_, x), (_, y)) => x != y }
        assert(diffs.isEmpty, s"\n[$label]\n" + diffs.map {
          case ((f, x), (_, y)) => s"  $f:\n    model=$x\n    ours =$y"
        }.mkString("\n") + "\nmsg0: " + msgs.headOption.map(
          _.take(80).map(x => f"$x%02x").mkString(" ")).getOrElse(""))
      case _ => fail(s"[$label] model=${m.isDefined} ours=${p.isDefined}\n" +
        "msg0: " + msgs.headOption.map(
          _.take(80).map(x => f"$x%02x").mkString(" ")).getOrElse(""))
    }
  }

  // ------------------------------------------------------------ generator

  private var seed = 0x5ca1ab1eL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
  private def chance(pct: Int): Boolean = nextInt(100) < pct

  private def tlv(tagByte: Int, body: Array[Byte],
      lie: Int = 0): Array[Byte] = {
    val l = body.length + lie
    val e = new java.io.ByteArrayOutputStream
    e.write(tagByte)
    if (l < 0x80 && !chance(10)) e.write(l)
    else if (chance(50)) { e.write(0x81); e.write(l & 0xff) }
    else { e.write(0x82); e.write((l >> 8) & 0xff); e.write(l & 0xff) }
    e.write(body, 0, body.length)
    e.toByteArray
  }
  private def cat(xs: Array[Byte]*): Array[Byte] =
    xs.foldLeft(Array.emptyByteArray)(_ ++ _)
  private def gstr(s: String): Array[Byte] =
    tlv(0x1b, s.getBytes(StandardCharsets.ISO_8859_1))

  private def genPrincipal(): Array[Byte] = {
    val nParts = nextInt(4)
    val parts = (0 until nParts).map(_ => pick(Seq(
      s"user${nextInt(50)}", "", s"krbtgt.${nextInt(9)}",
      "x" * nextInt(40))))
    val inner =
      if (chance(10)) tlv(0x04, Array.fill(nextInt(6))(nextInt(256).toByte))
      else tlv(0x30, cat(parts.map(gstr): _*))
    tlv(0xa0 | pick(Seq(1, 1, 3, 3, 2)), tlv(0x30, cat(
      tlv(0xa0, tlv(0x02, Array(nextInt(4).toByte))),
      tlv(0xa0 | pick(Seq(1, 1, 1, 0, 2)), inner))))
  }

  private def genMsg(recipe: StringBuilder): Array[Byte] = {
    val appTag = pick(Seq(10, 10, 12, 11, 30, 14))
    val pvnoLast = pick(Seq(5, 5, 5, 4, 0))
    val msgType = pick(Seq(10, 12, 10, 12, 11, 9))
    val pvno = tlv(0xa0 | pick(Seq(1, 1, 1, 2)),
      if (chance(85)) tlv(0x02, Array(pvnoLast.toByte))
      else tlv(0x02, Array.fill(1 + nextInt(3))(pvnoLast.toByte)))
    val mt = tlv(0xa0 | pick(Seq(2, 2, 2, 1)), tlv(0x02,
      Array(msgType.toByte)))
    val bodyEls = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val nEls = nextInt(5)
    for (_ <- 0 until nEls) nextInt(4) match {
      case 0 => bodyEls += genPrincipal()
      case 1 => bodyEls += tlv(0xa2, gstr(pick(Seq(
        "EXAMPLE.COM", "test.realm", "", "x" * nextInt(30)))))
      case 2 => bodyEls += tlv(0xa0 | (5 + nextInt(7)),
        tlv(0x02, Array.fill(1 + nextInt(4))(nextInt(256).toByte)))
      case _ => // hostile: long-form tag / octet string / garbage
        bodyEls += pick(Seq(
          tlv(0xbf, Array(0x21.toByte, 3.toByte, 1.toByte, 2.toByte,
            3.toByte)), // long-form tag: last tag byte doubles as length
          tlv(0x04, Array.fill(nextInt(8))(nextInt(256).toByte)),
          Array(0x80.toByte, 0x80.toByte)))
    }
    val reqBody = tlv(0xa0 | pick(Seq(4, 4, 4, 3)),
      tlv(0x30, cat(bodyEls.toSeq: _*)))
    val padata = if (chance(30))
      tlv(0xa3, tlv(0x30, Array.fill(nextInt(12))(nextInt(256).toByte)))
    else Array.emptyByteArray
    val children = scala.collection.mutable.ArrayBuffer(pvno, mt)
    if (padata.nonEmpty) children += padata
    children += reqBody
    if (chance(15)) children += tlv(0xa0 | nextInt(8),
      Array.fill(nextInt(5))(nextInt(256).toByte)) // 5th child: seq(3) body rule
    val wrapper =
      if (chance(8)) tlv(0x04, cat(children.toSeq: _*)) // not a SEQUENCE
      else tlv(0x30, cat(children.toSeq: _*),
        lie = if (chance(10)) pick(Seq(-3, 5, 200)) else 0)
    var out = tlv(
      (if (chance(90)) 0x60 else 0x40) | pick(Seq(appTag, appTag, 0x1f)),
      wrapper, lie = if (chance(10)) pick(Seq(-2, 9, 400)) else 0)
    recipe.append(s"app$appTag pv$pvnoLast mt$msgType els$nEls ")
    if (chance(15) && out.length > 3) {
      out = out.take(1 + nextInt(out.length - 1)); recipe.append("trunc ")
    }
    if (chance(18) && out.length > 2) {
      recipe.append("mut ")
      for (_ <- 0 to nextInt(4))
        out(nextInt(out.length)) = nextInt(256).toByte
    }
    out
  }

  // --------------------------------------------------------------- tests

  test("generated messages: walk matches the krb5.c model") {
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(3000)
    for (trial <- 0 until nTrials) {
      val recipe = new StringBuilder
      val msgs = (0 until 1 + nextInt(3)).map(_ => genMsg(recipe))
      compare(msgs, s"trial $trial: $recipe")
    }
  }

  test("pinned krb5.c quirks") {
    def der(tagByte: Int, body: Array[Byte]): Array[Byte] = {
      val e = new java.io.ByteArrayOutputStream
      e.write(tagByte); e.write(body.length); e.write(body, 0, body.length)
      e.toByteArray
    }
    def cat2(xs: Array[Byte]*): Array[Byte] =
      xs.foldLeft(Array.emptyByteArray)(_ ++ _)
    def g(s: String) = der(0x1b, s.getBytes(StandardCharsets.ISO_8859_1))
    // 1. pvno passes on ANY value ending in 5 (last-byte check)
    val pvnoGarbage = der(0xa1, der(0x02, Array[Byte](9, 9, 5)))
    val mt10 = der(0xa2, der(0x02, Array[Byte](10)))
    val body = der(0xa4, der(0x30, cat2(
      der(0xa2, g("REALM.X")),
      der(0xa0, der(0x02, Array[Byte](1)))))) // 2 els: passes the gate
    val m1 = der(0x6a, der(0x30, cat2(pvnoGarbage, mt10, body)))
    assert(Krb5Parser.parse(Seq(m1)).exists(_.realm == Seq("REALM.X")),
      "trailing-5 garbage pvno must pass")
    compare(Seq(m1), "garbage pvno trailing 5")
    // 2. a req-body with ONE element records nothing
    val body1 = der(0xa4, der(0x30, der(0xa2, g("LONELY.REALM"))))
    val m2 = der(0x6a, der(0x30, cat2(
      der(0xa1, der(0x02, Array[Byte](5))), mt10, body1)))
    assert(Krb5Parser.parse(Seq(m2)).exists(_.realm.isEmpty),
      "single-element req-body records nothing")
    compare(Seq(m2), "one-element body")
    // 3. two-part principal with an empty part keeps the slash
    val prin = der(0xa1, der(0x30, cat2(
      der(0xa0, der(0x02, Array[Byte](1))),
      der(0xa1, der(0x30, cat2(g("alice"), g("")))))))
    val m3 = der(0x6a, der(0x30, cat2(
      der(0xa1, der(0x02, Array[Byte](5))), mt10,
      der(0xa4, der(0x30, cat2(prin, der(0xa2, g("R"))))))))
    assert(Krb5Parser.parse(Seq(m3)).exists(_.cname == Seq("alice/")),
      "empty second part renders 'alice/'")
    compare(Seq(m3), "empty principal part")
    // 4. long-form tag: the last tag byte doubles as the length (the
    // reference never reads a length byte after a 0x1f tag)
    val longTag = Array[Byte](0xbf.toByte, 0x22, 0x02, 0x41, 0x42, 0x43)
    // tag bytes bf 22 -> tag 0x22, then "length" = 0x22 clamps to
    // remaining; both walkers must agree on the walk that follows
    val m4 = der(0x6a, der(0x30, cat2(
      der(0xa1, der(0x02, Array[Byte](5))), mt10,
      der(0xa4, der(0x30, cat2(longTag, der(0xa2, g("AFTER"))))))))
    compare(Seq(m4), "long-form tag length reuse")
  }
}
