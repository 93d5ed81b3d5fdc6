package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Krb5Parser, LdapParser}

/** Round-trip fuzz for the ASN.1 extractors: KDC-REQ and LDAPMessage
  * wire bytes produced by an independent DER encoder (RFC 4120 KDC-REQ
  * / RFC 4511 BindRequest layouts typed from the specs), expectations
  * computed from the generation model, never from the parsers. Hostile
  * corners: long-form lengths at every level, length-field lies,
  * truncation, indefinite lengths, junk elements, >2-part principals.
  */
class Krb5LdapRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x6b7b5a5eedL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  // ------------------------------------------------------- DER encoder
  /** TLV with controllable length width: 0 = shortest form, 1 = forced
    * 0x81, 2 = forced 0x82 (BER allows non-minimal lengths; the parser
    * must accept them like the reference's asn_get_tlv).
    */
  private def tlv(tag: Int, body: Array[Byte], width: Int = 0): Array[Byte] = {
    val len = body.length
    val hdr =
      if (width == 2 || len > 255)
        Array((tag & 0xff).toByte, 0x82.toByte,
          ((len >> 8) & 0xff).toByte, (len & 0xff).toByte)
      else if (width == 1 || len > 127)
        Array((tag & 0xff).toByte, 0x81.toByte, (len & 0xff).toByte)
      else Array((tag & 0xff).toByte, (len & 0xff).toByte)
    hdr ++ body
  }
  private def cat(xs: Array[Byte]*): Array[Byte] =
    xs.foldLeft(Array.emptyByteArray)(_ ++ _)
  private def gstr(s: String): Array[Byte] =
    tlv(0x1b, s.getBytes(StandardCharsets.ISO_8859_1)) // GeneralString
  private def int1(v: Int): Array[Byte] = tlv(0x02, Array(v.toByte))

  private val realms = Seq("EXAMPLE.COM", "CORP.LOCAL", "ATHENA.MIT.EDU", "R")
  private val names = Seq("alice", "bob", "host", "krbtgt", "svc-web", "x")

  /** One principal: [ctx] { SEQUENCE { [0] INTEGER type,
    * [1] SEQUENCE OF GeneralString } }. Returns (der, expected) where
    * expected follows the parser contract: first TWO parts, empties
    * dropped, one part stands alone, two join with '/'.
    */
  private def principal(ctx: Int): (Array[Byte], Option[String]) = {
    val nParts = 1 + nextInt(3) // 1..3 — 3 exercises the max-2 walk
    val parts = (0 until nParts).map { _ =>
      if (chance(10)) "" else oneOf(names) + (if (chance(30)) s".${nextInt(9)}" else "")
    }
    val der = tlv(0xa0 | ctx, tlv(0x30, cat(
      tlv(0xa0, int1(oneOf(Seq(1, 2, 3)))),
      tlv(0xa1, tlv(0x30, cat(parts.map(gstr): _*))))))
    // r15 exact semantics (krb5.c:48-60): ONE part must be non-empty;
    // TWO parts join unconditionally, so "a/" and "/b" are real outputs
    val seen = parts.take(2)
    val exp = seen.length match {
      case 1 => Some(seen.head).filter(_.nonEmpty)
      case 2 => Some(s"${seen(0)}/${seen(1)}")
      case _ => None
    }
    (der, exp)
  }

  private final case class Krb5Model(der: Array[Byte],
      realm: Option[String], cname: Option[String], sname: Option[String])

  /** One AS-REQ/TGS-REQ with optional padata and junk req-body elements;
    * outer and message-SEQUENCE lengths forced to 0x82 so the pvno
    * signature lands at the reference classify offsets (9 UDP, 13 TCP).
    */
  private def krb5Req(): Krb5Model = {
    val appTag = if (chance(50)) 10 else 12
    val (cnameDer, cnameExp) =
      if (chance(80)) principal(1) else (Array.emptyByteArray, None)
    val (snameDer, snameExp) =
      if (chance(70)) principal(3) else (Array.emptyByteArray, None)
    val realm = if (chance(90)) Some(oneOf(realms)) else None
    val realmDer = realm.map(r => tlv(0xa2, gstr(r))).getOrElse(Array.emptyByteArray)
    val junk = if (chance(40)) tlv(0xa0 | (5 + nextInt(6)),
      tlv(0x02, Array.fill(1 + nextInt(3))(nextInt(256).toByte)))
    else Array.emptyByteArray
    val reqBody = tlv(0xa4, tlv(0x30, cat(
      tlv(0xa0, tlv(0x03, Array(0.toByte, 0.toByte, nextInt(256).toByte))),
      cnameDer, realmDer, snameDer, junk)))
    val padata = if (chance(40))
      tlv(0xa3, tlv(0x30, tlv(0x30, cat(tlv(0xa1, int1(2)),
        tlv(0xa2, tlv(0x04, Array.fill(nextInt(20))(nextInt(256).toByte)))))))
    else Array.emptyByteArray
    val seqBody = cat(
      tlv(0xa1, int1(5)),       // pvno — the 03 02 01 05 signature
      tlv(0xa2, int1(appTag)),  // msg-type
      padata, reqBody)
    val der = tlv(0x60 | appTag, tlv(0x30, seqBody, width = 2), width = 2)
    Krb5Model(der, realm,
      // the parser only reads the req-body when it sits at seq(2) or
      // seq(3): pvno, msg-type, optional padata, then [4] — always true
      // in this layout
      cnameExp, snameExp)
  }

  test("KRB5 KDC-REQ round-trip: 150 TCP streams vs the DER model") {
    for (_ <- 0 until 150) {
      val msgs = (0 until 1 + nextInt(3)).map(_ => krb5Req())
      // TCP framing: 4-byte big-endian record length per message
      val stream = cat(msgs.map { m =>
        val l = m.der.length
        Array[Byte]((l >> 24).toByte, (l >> 16).toByte,
          (l >> 8).toByte, l.toByte) ++ m.der
      }: _*)
      assert(Krb5Parser.isKrb5Tcp(stream), "classify signature at 13")
      assert(Krb5Parser.isKrb5Udp(msgs.head.der), "classify signature at 9")
      val split = Krb5Parser.tcpMessages(stream)
      assert(split.length == msgs.length)
      val info = Krb5Parser.parse(split)
      assert(info.isDefined)
      val i = info.get
      assert(i.realm == msgs.flatMap(_.realm).distinct,
        s"realm: ${i.realm} vs model")
      assert(i.cname == msgs.flatMap(_.cname).distinct,
        s"cname: ${i.cname} vs model")
      assert(i.sname == msgs.flatMap(_.sname).distinct,
        s"sname: ${i.sname} vs model")
    }
  }

  test("KRB5 hostile: truncation, length lies, indefinite, replies") {
    for (_ <- 0 until 200) {
      val m = krb5Req()
      nextInt(4) match {
        case 0 => // truncate anywhere — must not throw
          val cut = 1 + nextInt(m.der.length - 1)
          Krb5Parser.parse(Seq(m.der.take(cut)))
        case 1 => // inner length lie: corrupt a random length byte
          val b = m.der.clone()
          val i = 4 + nextInt(b.length - 4)
          b(i) = (b(i) ^ (1 << nextInt(8))).toByte
          Krb5Parser.parse(Seq(b))
        case 2 => // indefinite outer length is rejected
          val b = m.der.clone()
          b(1) = 0x80.toByte
          assert(Krb5Parser.parse(Seq(b)).isEmpty)
        case _ => // a reply (app 11/13) classifies nothing here
          val body = tlv(0x30, cat(tlv(0xa0, int1(5)), tlv(0xa1, int1(11))))
          assert(Krb5Parser.parse(Seq(tlv(0x60 | 11, body))).isEmpty)
      }
    }
    // record-length lie in the TCP stream: a length past the buffer
    // ends the walk without emitting the phantom message
    val m = krb5Req()
    val l = m.der.length + 1000
    val stream = Array[Byte]((l >> 24).toByte, (l >> 16).toByte,
      (l >> 8).toByte, l.toByte) ++ m.der
    assert(Krb5Parser.tcpMessages(stream).isEmpty)
    // 2^31-ish length must not overflow into a crash
    val huge = Array[Byte](0x7f, 0xff.toByte, 0xff.toByte, 0xfe.toByte) ++
      m.der
    assert(Krb5Parser.tcpMessages(huge).isEmpty)
  }

  // ----------------------------------------------------------- LDAP
  private final case class LdapOp(der: Array[Byte],
      bind: Option[String], auth: Option[String], stops: Boolean,
      starttls: Boolean)

  private def ldapMessage(): LdapOp = {
    val msgId = tlv(0x02, Array.fill(1 + nextInt(2))(nextInt(128).toByte))
    nextInt(6) match {
      case 0 | 1 => // BindRequest: version, name, auth choice
        val name = if (chance(25)) "" else
          s"cn=${oneOf(names)},dc=example,dc=com"
        val (authDer, authExp) = nextInt(5) match {
          case 0 => (tlv(0x80, Array.emptyByteArray), "none")
          case 1 => (tlv(0x80,
            s"pw${nextInt(100)}".getBytes(StandardCharsets.ISO_8859_1)), "simple")
          case 2 => (tlv(0xa3, cat(tlv(0x04,
            "GSSAPI".getBytes(StandardCharsets.ISO_8859_1)))), "sasl")
          case 3 => (tlv(0x8a, Array.emptyByteArray), "ntlmsspNegotiate")
          case _ => (tlv(0x85, Array(1.toByte)), "5") // unknown tag → number
        }
        val op = tlv(0x60, cat(int1(3),
          tlv(0x04, name.getBytes(StandardCharsets.ISO_8859_1)), authDer))
        LdapOp(tlv(0x30, cat(msgId, op)),
          Some(if (name.isEmpty) "<ROOT>" else name), Some(authExp),
          stops = false, starttls = false)
      case 2 => // SearchRequest — recognized, no fields
        val op = tlv(0x63, cat(tlv(0x04,
          "dc=example".getBytes(StandardCharsets.ISO_8859_1)),
          tlv(0x0a, Array(nextInt(3).toByte))))
        LdapOp(tlv(0x30, cat(msgId, op)), None, None,
          stops = false, starttls = false)
      case 3 => // ExtendedRequest (STARTTLS): ends LDAP, rest re-classifies
        val op = tlv(0x77, tlv(0x80,
          "1.3.6.1.4.1.1466.20037".getBytes(StandardCharsets.ISO_8859_1)))
        LdapOp(tlv(0x30, cat(msgId, op)), None, None,
          stops = true, starttls = true)
      case 4 => // UnbindRequest is PRIMITIVE app 2 — the op.pc guard stops
        LdapOp(tlv(0x30, cat(msgId, tlv(0x42, Array.emptyByteArray))),
          None, None, stops = true, starttls = false)
      case _ => // AbandonRequest (app 16, primitive) also stops the walk
        LdapOp(tlv(0x30, cat(msgId, tlv(0x50, Array(1.toByte)))),
          None, None, stops = true, starttls = false)
    }
  }

  test("LDAP round-trip: 200 streams vs the BindRequest model") {
    for (_ <- 0 until 200) {
      val msgs = (0 until 1 + nextInt(5)).map(_ => ldapMessage())
      val stream = cat(msgs.map(_.der): _*)
      // the walk consumes messages in order until a stopper
      val upTo = msgs.indexWhere(_.stops) match {
        case -1 => msgs
        case i  => msgs.take(i + 1)
      }
      val expBind = upTo.flatMap(_.bind).distinct
      val expAuth = upTo.flatMap(_.auth).distinct
      val info = LdapParser.parse(stream)
      // sawAny iff at least one CONSTRUCTED op ≤25 parsed before a stop:
      // a leading primitive-op message yields None
      val sawAny = upTo.exists(m => !m.stops || m.starttls)
      assert(info.isDefined == sawAny, s"sawAny=$sawAny")
      info.foreach { i =>
        assert(i.bindname == expBind, s"bind: ${i.bindname} vs $expBind")
        assert(i.authtype == expAuth, s"auth: ${i.authtype} vs $expAuth")
        val tlsAt = msgs.indexWhere(_.starttls)
        if (tlsAt >= 0 && upTo.length == tlsAt + 1) {
          // r15 exact semantics (ldap.c:93-100): the reference re-feeds
          // buf + olen + 2 — the STARTTLS message's CONTENT length plus
          // an assumed 2-byte header, measured from the BUFFER START —
          // correct only for a short-form first message
          val der = msgs(tlsAt).der
          val contentLen = (der(1) & 0xff) match {
            case l if l < 0x80 => l
            case 0x81          => der(2) & 0xff
            case _             => ((der(2) & 0xff) << 8) | (der(3) & 0xff)
          }
          val expRest = math.min(contentLen + 2,
            math.min(stream.length, 8192))
          assert(i.restOffset == expRest,
            s"STARTTLS rest offset ${i.restOffset} vs $expRest")
        } else assert(i.restOffset == -1)
      }
      // classify accepts the first message of every valid stream whose
      // op is constructed; primitive-op heads are refused
      val headOk = {
        val h = msgs.head
        !h.stops || h.starttls
      }
      assert(LdapParser.isLdap(stream) == headOk)
    }
  }

  test("LDAP hostile: truncation and length lies never throw") {
    for (_ <- 0 until 150) {
      val msgs = (0 until 1 + nextInt(3)).map(_ => ldapMessage())
      val stream = cat(msgs.map(_.der): _*)
      nextInt(3) match {
        case 0 =>
          LdapParser.parse(stream.take(1 + nextInt(stream.length)))
        case 1 =>
          val b = stream.clone()
          val i = nextInt(b.length)
          b(i) = (b(i) ^ (1 << nextInt(8))).toByte
          LdapParser.parse(b)
        case _ => // nested garbage: op body full of random TLV-ish bytes
          val junk = tlv(0x30, cat(tlv(0x02, Array(1.toByte)),
            tlv(0x60, Array.fill(10 + nextInt(40))(nextInt(256).toByte))))
          LdapParser.parse(junk)
      }
    }
  }
}
