package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.LdapParser

/** Differential fuzz of the LDAP walker against an independent second
  * transcription of the reference (capture/parsers/ldap.c over
  * parsers.c's get_tlv) — the sibling of Krb5DifferentialFuzzSpec.
  *
  * Quirk surface both transcribe (and the generator aims at):
  *  - the walk covers at most the first 8192 buffered bytes of a
  *    direction and runs while more than 5 bytes remain;
  *  - a messageID that is not a primitive tag 2, or a protocolOp that
  *    is not constructed with tag <= 25, ends the walk;
  *  - BindRequest: a missing version/name/auth TLV `continue`s to the
  *    NEXT message; an empty name records "<ROOT>"; auth tag 0 is
  *    none/simple by emptiness, 3 sasl, 10/11 ntlmssp*, anything else
  *    the DECIMAL of the (possibly wrapped-negative) tag;
  *  - extendedReq (23) stops the walk and re-feeds
  *    buf + contentLen + 2 — the message CONTENT length plus an
  *    assumed 2-byte header from the BUFFER START, correct only for a
  *    short-form first message (ldap.c:93-100); extendedResp (24)
  *    re-feeds the same way but keeps walking.
  */
class LdapDifferentialFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- model

  /** moloch get_tlv re-derivation (same rules as the krb5 model). */
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
    } else {
      tag = ch & 0x1f
      if (p >= end) return None
      ch = b(p) & 0xff; p += 1
    }
    if (ch == 0x80) return None
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

  private final case class ML(auth: List[String], bind: List[String],
      rest: Int)

  private def mParse(stream: Array[Byte]): Option[ML] = {
    val cap = math.min(stream.length, 8192)
    var auth = List.empty[String]
    var bind = List.empty[String]
    var rest = -1
    var saw = false
    var p = 0
    var run = true
    while (run && cap - p > 5) {
      mTlv(stream, p, cap) match {
        case None => run = false
        case Some((_, _, oOff, oLen, oNext)) =>
          val oEnd = oOff + oLen
          mTlv(stream, oOff, oEnd) match {
            case Some((mPc, mTag, _, _, afterId)) if !mPc && mTag == 2 =>
              mTlv(stream, afterId, oEnd) match {
                case Some((oppc, op, opOff, opLen, _))
                    if oppc && op <= 25 =>
                  saw = true
                  if (op == 0) {
                    // version / name / auth: each missing one continues
                    // to the NEXT message
                    val vEnd = opOff + opLen
                    mTlv(stream, opOff, vEnd) match {
                      case Some((_, _, _, _, afterVer)) =>
                        mTlv(stream, afterVer, vEnd) match {
                          case Some((_, _, nOff, nLen, afterName)) =>
                            bind ::= (if (nLen == 0) "<ROOT>"
                              else new String(stream, nOff, nLen,
                                StandardCharsets.ISO_8859_1))
                            mTlv(stream, afterName, vEnd) match {
                              case Some((_, aTag, _, aLen, _)) =>
                                auth ::= (aTag match {
                                  case 0 =>
                                    if (aLen == 0) "none" else "simple"
                                  case 3  => "sasl"
                                  case 10 => "ntlmsspNegotiate"
                                  case 11 => "ntlmsspAuth"
                                  case t  => t.toInt.toString // C (int) cast
                                })
                              case None =>
                            }
                          case None =>
                        }
                      case None =>
                    }
                  } else if (op == 23 || op == 24) {
                    if (rest < 0) rest = math.min(oLen + 2, cap)
                    if (op == 23) run = false
                  }
                case _ => run = false
              }
            case _ => run = false
          }
          if (run) p = oNext
      }
    }
    if (saw) Some(ML(auth.reverse.distinct, bind.reverse.distinct, rest))
    else None
  }

  // ------------------------------------------------------------- compare

  private def compare(stream: Array[Byte], label: String): Unit = {
    val m = mParse(stream)
    val p = LdapParser.parse(stream)
    (m, p) match {
      case (None, None) => ()
      case (Some(a), Some(b)) =>
        val mf = Seq("auth" -> a.auth, "bind" -> a.bind,
          "rest" -> List(a.rest.toString))
        val pf = Seq("auth" -> b.authtype.toList, "bind" -> b.bindname.toList,
          "rest" -> List(b.restOffset.toString))
        val diffs = mf.zip(pf).filter { case ((_, x), (_, y)) => x != y }
        assert(diffs.isEmpty, s"\n[$label]\n" + diffs.map {
          case ((f, x), (_, y)) => s"  $f:\n    model=$x\n    ours =$y"
        }.mkString("\n") + "\nstream: " +
          stream.take(70).map(x => f"$x%02x").mkString(" "))
      case _ =>
        fail(s"[$label] model=${m.isDefined} ours=${p.isDefined}\nstream: " +
          stream.take(70).map(x => f"$x%02x").mkString(" "))
    }
  }

  // ------------------------------------------------------------ generator

  private var seed = 0x1da9f00dL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
  private def chance(pct: Int): Boolean = nextInt(100) < pct

  private def tlv(tagByte: Int, body: Array[Byte], lie: Int = 0)
      : Array[Byte] = {
    val l = math.max(0, body.length + lie)
    val e = new java.io.ByteArrayOutputStream
    e.write(tagByte)
    if (l < 0x80 && !chance(12)) e.write(l)
    else if (chance(50)) { e.write(0x81); e.write(l & 0xff) }
    else { e.write(0x82); e.write((l >> 8) & 0xff); e.write(l & 0xff) }
    e.write(body, 0, body.length)
    e.toByteArray
  }
  private def cat(xs: Array[Byte]*): Array[Byte] =
    xs.foldLeft(Array.emptyByteArray)(_ ++ _)

  private def genMessage(recipe: StringBuilder): Array[Byte] = {
    val msgId = tlv(0x02, Array.fill(1 + nextInt(3))(nextInt(256).toByte))
    val badId = chance(10)
    val id = if (badId) tlv(pick(Seq(0x01, 0x22, 0x04)),
      Array(1.toByte)) else msgId
    val opTag = pick(Seq(0, 0, 0, 23, 24, 1, 2, 16, 25, 26, 0x1f))
    val body: Array[Byte] = opTag match {
      case 0 =>
        val parts = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        val n = nextInt(4) // 0..3 of version/name/auth present
        if (n >= 1) parts += tlv(0x02, Array(3.toByte)) // version
        if (n >= 2) parts += tlv(0x04, pick(Seq("", "cn=admin,dc=x",
          "u" * nextInt(40))).getBytes(StandardCharsets.ISO_8859_1))
        if (n >= 3) {
          val at = pick(Seq(0, 0, 3, 10, 11, 7, 24, 0x1f))
          if (at == 0x1f) // long-form tag: last byte doubles as length
            parts += Array((0x80 | 0x1f).toByte, 0x23.toByte, 0x02.toByte)
          else parts += tlv(0x80 | at,
            Array.fill(nextInt(8))(nextInt(256).toByte))
        }
        recipe.append(s"bind$n ")
        cat(parts.toSeq: _*)
      case 23 | 24 =>
        recipe.append(s"ext$opTag ")
        tlv(0x80, "1.3.6.1.4.1.1466.20037".getBytes(
          StandardCharsets.ISO_8859_1))
      case t =>
        recipe.append(s"op$t ")
        Array.fill(nextInt(10))(nextInt(256).toByte)
    }
    val opByte = opTag match {
      case 0x1f => 0x7f // constructed app long-form tag
      case t if chance(85) => 0x60 | (t & 0x1f) // constructed application
      case t => 0x40 | (t & 0x1f) // primitive application: stops the walk
    }
    val op = tlv(opByte, body)
    tlv(0x30, cat(id, op),
      lie = if (chance(12)) pick(Seq(-2, 3, 60)) else 0)
  }

  // --------------------------------------------------------------- tests

  test("generated streams: walker matches the ldap.c model") {
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(3000)
    for (trial <- 0 until nTrials) {
      val recipe = new StringBuilder
      var stream = cat((0 until 1 + nextInt(5))
        .map(_ => genMessage(recipe)): _*)
      if (chance(10)) { // past the 8192 buffer cap
        stream = stream ++ Array.fill(8300)(0x30.toByte)
        recipe.append("big ")
      }
      if (chance(15) && stream.length > 2) {
        stream = stream.take(1 + nextInt(stream.length - 1))
        recipe.append("trunc ")
      }
      if (chance(18) && stream.length > 2) {
        recipe.append("mut ")
        for (_ <- 0 to nextInt(4))
          stream(nextInt(stream.length)) = nextInt(256).toByte
      }
      compare(stream, s"trial $trial: $recipe")
    }
  }

  test("pinned ldap.c quirks") {
    def der(t: Int, b: Array[Byte]): Array[Byte] = {
      val e = new java.io.ByteArrayOutputStream
      e.write(t); e.write(b.length); e.write(b, 0, b.length)
      e.toByteArray
    }
    def c2(xs: Array[Byte]*): Array[Byte] =
      xs.foldLeft(Array.emptyByteArray)(_ ++ _)
    val id = der(0x02, Array(1.toByte))
    // 1. a bind missing its auth records the name and continues to the
    // next message (whose bind then also records)
    val b1 = der(0x30, c2(id, der(0x60, c2(
      der(0x02, Array(3.toByte)), der(0x04, "abc".getBytes)))))
    val b2 = der(0x30, c2(id, der(0x60, c2(
      der(0x02, Array(3.toByte)), der(0x04, Array.emptyByteArray),
      der(0x80, Array.emptyByteArray)))))
    compare(b1 ++ b2, "missing auth continues")
    val got = LdapParser.parse(b1 ++ b2).get
    assert(got.bindname == Seq("abc", "<ROOT>") &&
      got.authtype == Seq("none"), s"${got.bindname} ${got.authtype}")
    // 2. extendedResp (24) keeps walking; its rest offset uses the
    // reference's contentLen + 2 arithmetic
    val e24 = der(0x30, c2(id, der(0x78, der(0x80, "x".getBytes))))
    val stream2 = e24 ++ b1
    compare(stream2, "extendedResp keeps walking")
    val got2 = LdapParser.parse(stream2).get
    assert(got2.bindname == Seq("abc"), "bind after op 24 still parses")
    assert(got2.restOffset == (e24(1) & 0xff) + 2)
    // 3. an unknown auth tag renders its decimal
    val b3 = der(0x30, c2(id, der(0x60, c2(
      der(0x02, Array(3.toByte)), der(0x04, "q".getBytes),
      der(0x87, Array(1.toByte))))))
    compare(b3, "numeric auth tag")
    assert(LdapParser.parse(b3).get.authtype == Seq("7"))
  }
}
