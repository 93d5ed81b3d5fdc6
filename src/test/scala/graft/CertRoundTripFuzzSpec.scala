package graft

import java.nio.charset.StandardCharsets
import java.security.{KeyPairGenerator, MessageDigest}
import java.security.spec.ECGenParameterSpec

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.CertParser

/** Round-trip fuzz for the X.509 certificate extractor: DER produced by
  * an independent encoder typed from RFC 5280 layouts, expectations
  * computed from the generation model, never from the parser. Covers
  * both paths — the JDK `CertificateFactory` path (structurally valid
  * certs with real SubjectPublicKeyInfos) and the lenient hand-rolled
  * TBSCertificate walk (certs the JDK refuses: reference semantics at
  * tls.c:82-119). Hostile corners: non-minimal BER lengths, raw
  * non-minimal serial bytes, explicit/oversize EC params ("corrupt",
  * tls.c:109), multi-valued RDNs (DER order, tls.c:64-77), truncation
  * and byte corruption, and the TLS Certificate-message u24 framing.
  */
class CertRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x51e5c47f2dL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))
  private def randBytes(n: Int): Array[Byte] =
    Array.fill(n)(nextInt(256).toByte)

  // ------------------------------------------------------- DER encoder
  /** TLV with controllable length width: 0 = shortest form, 1 = forced
    * 0x81, 2 = forced 0x82. The JDK path only ever sees width 0 (DER);
    * the lenient walker must accept BER's non-minimal forms.
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
  private def oid(dotted: String): Array[Byte] = {
    val parts = dotted.split('.').map(_.toLong)
    val out = scala.collection.mutable.ArrayBuffer[Byte](
      (parts(0) * 40 + parts(1)).toByte)
    parts.drop(2).foreach { v =>
      var x = v
      val grp = scala.collection.mutable.ArrayBuffer((x & 0x7f).toByte)
      x >>= 7
      while (x > 0) { grp.prepend(((x & 0x7f) | 0x80).toByte); x >>= 7 }
      out ++= grp
    }
    tlv(0x06, out.toArray)
  }
  private def algSeq(inner: Array[Byte], width: Int = 0): Array[Byte] =
    tlv(0x30, inner, width)
  private val sha256Rsa = cat(oid("1.2.840.113549.1.1.11"), Array[Byte](5, 0))
  private val sha1Rsa = cat(oid("1.2.840.113549.1.1.5"), Array[Byte](5, 0))

  private def hexOf(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def sha1Colon(der: Array[Byte]): String =
    MessageDigest.getInstance("SHA-1").digest(der)
      .map("%02x".format(_)).mkString(":")

  // -------------------------------------------------------- time model
  /** One Time value: UTCTime (two-digit year, <50 → 20yy) or
    * GeneralizedTime; `withSeconds=false` only for the lenient walker
    * (the JDK requires the seconds field).
    */
  private def timeDer(withSeconds: Boolean = true): (Array[Byte], Long) = {
    val utc = chance(70)
    val y = if (utc) 1960 + nextInt(90) else 2050 + nextInt(120)
    val mo = 1 + nextInt(12); val d = 1 + nextInt(28)
    val h = nextInt(24); val mi = nextInt(60)
    val se = if (withSeconds) nextInt(60) else 0
    val secStr = if (withSeconds) f"$se%02d" else ""
    val body =
      if (utc) f"${y % 100}%02d$mo%02d$d%02d$h%02d$mi%02d${secStr}Z"
      else f"$y%04d$mo%02d$d%02d$h%02d$mi%02d${secStr}Z"
    // a seconds-less UTCTime is 11 bytes and fails the reference's
    // `len > 12` floor (parsers.c:515) — it reads as time 0; the
    // seconds-less GeneralizedTime form parses (optional fields)
    val ms =
      if (utc && !withSeconds) 0L
      else java.time.LocalDateTime.of(y, mo, d, h, mi, se)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000L
    (tlv(if (utc) 0x17 else 0x18, body.getBytes(StandardCharsets.US_ASCII)), ms)
  }

  // -------------------------------------------------------- name model
  private final case class NameModel(der: Array[Byte],
      cns: Seq[String], ons: Seq[String])

  private val cnOid = "2.5.4.3"
  private val onOid = "2.5.4.10"
  private val words = Seq("Example", "ACME Corp", "leaf.example.com",
    "Sub CA 01", "gamma-9", "Widgets Inc", "EU Trust Root")

  /** RDNSequence for the JDK path: single-AVA RDNs, CN/O plus OU noise,
    * PrintableString/UTF8String, values safe under RFC 2253 round-trip.
    * Expected CN (lowercased) and O lists in DER encoding order — the
    * reference's walk order (tls.c:71,76).
    */
  private def jdkName(): NameModel = {
    val n = 1 + nextInt(3)
    var cns = Vector[String](); var ons = Vector[String]()
    val rdns = (0 until n).map { _ =>
      val attr = oneOf(Seq(cnOid, onOid, "2.5.4.11"))
      val v = oneOf(words) + (if (chance(40)) " " + nextInt(100) else "")
      if (attr == cnOid) cns :+= v.toLowerCase
      if (attr == onOid) ons :+= v
      val strTag = if (chance(50)) 0x13 else 0x0c
      tlv(0x31, tlv(0x30, cat(oid(attr),
        tlv(strTag, v.getBytes(StandardCharsets.UTF_8)))))
    }
    NameModel(tlv(0x30, cat(rdns: _*)), cns, ons)
  }

  /** RDNSequence for the lenient walker: any value tag goes through
    * (UTF8String decoded UTF-8, everything else ISO-8859-1), including
    * TeletexString with high bytes and UTF8 multi-byte values.
    */
  private def lenientName(w: => Int): NameModel = {
    val n = nextInt(4)
    var cns = Vector[String](); var ons = Vector[String]()
    val rdns = (0 until n).map { _ =>
      val attr = oneOf(Seq(cnOid, onOid, "2.5.4.11", "1.2.840.113549.1.9.1"))
      val (strTag, bytes, decoded) = nextInt(3) match {
        case 0 => // PrintableString, ASCII
          val v = oneOf(words); (0x13, v.getBytes(StandardCharsets.ISO_8859_1), v)
        case 1 => // UTF8String with multi-byte chars
          val v = oneOf(words) + "éß"
          (0x0c, v.getBytes(StandardCharsets.UTF_8), v)
        case _ => // TeletexString, high bytes read as 8859-1
          val b = oneOf(words).getBytes(StandardCharsets.ISO_8859_1) ++
            Array(0xe9.toByte, 0xfc.toByte)
          (0x14, b, new String(b, StandardCharsets.ISO_8859_1))
      }
      if (attr == cnOid) cns :+= decoded.toLowerCase
      if (attr == onOid) ons :+= decoded
      tlv(0x31, tlv(0x30, cat(oid(attr), tlv(strTag, bytes, w)), w), w)
    }
    NameModel(tlv(0x30, cat(rdns: _*), w), cns, ons)
  }

  // ---------------------------------------------------- SPKI for the JDK
  /** Real SubjectPublicKeyInfos — the JDK path must decode the key to
    * name the algorithm and curve. Generated once, reused across certs.
    */
  private lazy val jdkSpkis: Seq[(Array[Byte], String, String)] = {
    def ec(curveName: String, expect: String) = {
      val g = KeyPairGenerator.getInstance("EC")
      g.initialize(new ECGenParameterSpec(curveName))
      (g.generateKeyPair().getPublic.getEncoded, "id-ecPublicKey", expect)
    }
    val rsa = {
      val g = KeyPairGenerator.getInstance("RSA"); g.initialize(2048)
      (g.generateKeyPair().getPublic.getEncoded, "rsaEncryption", "")
    }
    val dsa = {
      val g = KeyPairGenerator.getInstance("DSA"); g.initialize(2048)
      (g.generateKeyPair().getPublic.getEncoded, "dsaEncryption", "")
    }
    Seq(rsa, dsa, ec("secp256r1", "prime256v1"),
      ec("secp384r1", "secp384r1"), ec("secp521r1", "secp521r1"))
  }

  // ------------------------------------------------------ model record
  private final case class Model(der: Array[Byte], serial: String,
      issuerCN: Seq[String], issuerON: Seq[String],
      subjectCN: Seq[String], subjectON: Seq[String],
      notBefore: Long, notAfter: Long, algo: String, curve: String,
      alt: Seq[String], isCA: Boolean)

  private def check(m: Model, got: Option[CertParser.CertInfo]): Unit = {
    val c = got.getOrElse(fail(s"parse failed for ${hexOf(m.der).take(60)}"))
    assert(c.hash == sha1Colon(m.der))
    assert(c.serial == m.serial)
    assert(c.issuerCN == m.issuerCN, "issuerCN")
    assert(c.issuerON == m.issuerON, "issuerON")
    assert(c.subjectCN == m.subjectCN, "subjectCN")
    assert(c.subjectON == m.subjectON, "subjectON")
    // pre-epoch validity times clamp to 0 and flag the session tag
    // (parsers.c asn_parse_time `if (val < 0)`)
    val nb = math.max(0L, m.notBefore)
    val na = math.max(0L, m.notAfter)
    assert(c.notBefore == nb)
    assert(c.notAfter == na)
    assert(c.validDays == (na - nb) / 86400000L)
    assert(c.preEpoch == (m.notBefore < 0 || m.notAfter < 0), "preEpoch")
    assert(c.publicAlgorithm == m.algo)
    assert(c.curve == m.curve)
    assert(c.alt == m.alt)
    assert(c.isCA == m.isCA)
  }

  // ------------------------------------------------------ JDK-path cert
  private val sanDns = Seq("www.Example-7.com", "api.corp.LOCAL",
    "localhost", "cdn.Edge.example.net", "m.example.org")

  private def jdkCert(): Model = {
    val serialBi = new java.math.BigInteger(1, randBytes(1 + nextInt(16)))
      .add(java.math.BigInteger.ONE)
    val serialBytes = serialBi.toByteArray // minimal two's complement
    val issuer = jdkName(); val subject = jdkName()
    val (t1, nb) = timeDer(); val (t2, na) = timeDer()
    val v3 = chance(80)
    val dns = if (v3 && chance(70)) (0 until (1 + nextInt(3))).map(_ => oneOf(sanDns))
              else Nil
    val ku = if (v3 && chance(60)) Some(Array.fill(9)(chance(30))) else None
    val exts = {
      val items = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      if (dns.nonEmpty) {
        val gens = dns.flatMap { d =>
          val extra = nextInt(3) match {
            case 0 => Seq(tlv(0x81, "a@b.example".getBytes(StandardCharsets.US_ASCII)))
            case 1 => Seq(tlv(0x87, randBytes(4)))
            case _ => Nil
          }
          extra :+ tlv(0x82, d.getBytes(StandardCharsets.US_ASCII))
        }
        items += tlv(0x30, cat(oid("2.5.29.17"),
          tlv(0x04, tlv(0x30, cat(gens: _*)))))
      }
      ku.foreach { bits =>
        var b0 = 0; var b1 = 0
        (0 until 8).foreach(i => if (bits(i)) b0 |= 0x80 >> i)
        if (bits(8)) b1 = 0x80
        val crit = if (chance(50)) Array[Byte](1, 1, 0xff.toByte)
                   else Array.emptyByteArray
        items += tlv(0x30, cat(oid("2.5.29.15"), crit,
          tlv(0x04, tlv(0x03, Array(7.toByte, b0.toByte, b1.toByte)))))
      }
      if (chance(30)) // unknown non-critical extension, must be ignored
        items += tlv(0x30, cat(oid("1.2.3.4.5"), tlv(0x04, randBytes(6))))
      if (v3 && items.nonEmpty) tlv(0xa3, tlv(0x30, cat(items.toSeq: _*)))
      else Array.emptyByteArray
    }
    val (spki, algo, curve) = oneOf(jdkSpkis)
    val tbs = tlv(0x30, cat(
      if (v3) tlv(0xa0, tlv(0x02, Array[Byte](2))) else Array.emptyByteArray,
      tlv(0x02, serialBytes),
      algSeq(sha256Rsa),
      issuer.der,
      tlv(0x30, cat(t1, t2)),
      subject.der,
      spki,
      exts))
    val der = tlv(0x30, cat(tbs, algSeq(sha256Rsa),
      tlv(0x03, 0.toByte +: randBytes(64))))
    Model(der, hexOf(serialBytes), issuer.cns, issuer.ons,
      subject.cns, subject.ons, nb, na, algo, curve,
      dns.map(_.toLowerCase), ku.exists(_(6)))
  }

  // -------------------------------------------------- lenient-path cert
  /** A cert the JDK deterministically refuses (outer SEQUENCE with only
    * two children, or TBS-vs-outer algorithm mismatch) so parseDer falls
    * to the hand-rolled walker. Exercises non-minimal lengths, raw
    * serial bytes, every curve/alg branch, and junk trailing TBS fields.
    */
  private def lenientCert(): Model = {
    def w: Int = if (chance(25)) 1 + nextInt(2) else 0
    val minimal = new java.math.BigInteger(1, randBytes(1 + nextInt(12)))
      .add(java.math.BigInteger.ONE).toByteArray
    val serialBytes = // sometimes non-minimal: raw bytes must round-trip
      if (chance(30)) Array.fill(1 + nextInt(2))(0.toByte) ++ minimal
      else minimal
    val issuer = lenientName(w); val subject = lenientName(w)
    val badTime = chance(10)
    val (t1, nb) =
      if (badTime) (tlv(0x17, "NOTATIME".getBytes(StandardCharsets.US_ASCII)), 0L)
      else timeDer(withSeconds = chance(70))
    val oneTime = chance(10)
    val (t2, na) = if (oneTime) (Array.emptyByteArray, 0L)
                   else timeDer(withSeconds = chance(70))
    val (spkiAlg, algo, curve) = nextInt(8) match {
      case 0 => (cat(oid("1.2.840.113549.1.1.1"), Array[Byte](5, 0)),
        "rsaEncryption", "")
      case 1 => (cat(oid("1.2.840.10040.4.1"), randBytes(0)),
        "dsaEncryption", "")
      case 2 => (cat(oid("1.2.840.10045.2.1"), oid("1.2.840.10045.3.1.7")),
        "id-ecPublicKey", "prime256v1")
      case 3 =>
        val (curveOid, curveName) = oneOf(Seq(
          ("1.3.132.0.34", "secp384r1"), ("1.3.132.0.35", "secp521r1"),
          ("1.3.132.0.10", "secp256k1"), ("1.3.132.0.33", "unknown")))
        (cat(oid("1.2.840.10045.2.1"), oid(curveOid)),
          "id-ecPublicKey", curveName)
      case 4 => // explicit EC params → corrupt (tls.c:109)
        (cat(oid("1.2.840.10045.2.1"), tlv(0x30, randBytes(20))),
          "id-ecPublicKey", "corrupt")
      case 5 => // oversize named-curve OID (len > 12) → corrupt
        (cat(oid("1.2.840.10045.2.1"),
          oid("1.2.840.10045.3.1.7.99.1234567.88.77.66")),
          "id-ecPublicKey", "corrupt")
      case 6 => // EC with no params at all → corrupt
        (oid("1.2.840.10045.2.1"), "id-ecPublicKey", "corrupt")
      case _ => (cat(oid("1.9.9.9"), Array[Byte](5, 0)), "unknown", "")
    }
    val spki = tlv(0x30, cat(algSeq(spkiAlg, w),
      tlv(0x03, 0.toByte +: randBytes(8 + nextInt(40)), w)), w)
    val v3 = chance(50)
    val junkTail = if (chance(30)) tlv(0xa3, randBytes(5)) else Array.emptyByteArray
    val tbs = tlv(0x30, cat(
      if (v3) tlv(0xa0, tlv(0x02, Array[Byte](2))) else Array.emptyByteArray,
      tlv(0x02, serialBytes, w),
      algSeq(sha256Rsa),
      issuer.der,
      tlv(0x30, cat(t1, t2), w),
      subject.der,
      spki,
      junkTail), w)
    val der =
      if (chance(50)) tlv(0x30, cat(tbs, algSeq(sha256Rsa)), w) // 2 children
      else tlv(0x30, cat(tbs, algSeq(sha1Rsa), // alg mismatch
        tlv(0x03, 0.toByte +: randBytes(16))), w)
    Model(der, hexOf(serialBytes), issuer.cns, issuer.ons,
      subject.cns, subject.ons, nb, na, algo, curve, Nil, isCA = false)
  }

  // --------------------------------------------------------------- tests
  test("JDK-path certs: 40 structurally valid X.509, model-derived fields") {
    (0 until 40).foreach { i =>
      val m = jdkCert()
      withClue(s"trial $i: ") { check(m, CertParser.parseDer(m.der)) }
    }
  }

  test("lenient-path certs: 80 JDK-rejected, hand-walker semantics") {
    (0 until 80).foreach { i =>
      val m = lenientCert()
      withClue(s"trial $i: ") { check(m, CertParser.parseDer(m.der)) }
    }
  }

  test("mutation robustness: truncation and byte corruption never throw") {
    val pool = (0 until 30).map(_ => jdkCert().der) ++
      (0 until 30).map(_ => lenientCert().der)
    pool.zipWithIndex.foreach { case (der, i) =>
      withClue(s"der $i: ") {
        // truncate at a random point
        CertParser.parseDer(der.take(1 + nextInt(der.length)))
        // corrupt three random bytes
        (0 until 3).foreach { _ =>
          val c = der.clone()
          c(nextInt(c.length)) = nextInt(256).toByte
          CertParser.parseDer(c)
        }
        // lie in the outer length byte
        val l = der.clone()
        if (l.length > 3) l(1) = (l(1) ^ 0x11).toByte
        CertParser.parseDer(l)
      }
    }
  }

  test("certificate-message framing: u24 chain, truncation, zero-length") {
    def u24(n: Int) = Array(((n >> 16) & 0xff).toByte,
      ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
    (0 until 30).foreach { trial =>
      val models = (0 until (1 + nextInt(4))).map(_ =>
        if (chance(50)) jdkCert() else lenientCert())
      var entries: Seq[(Array[Byte], Option[Model])] =
        models.map(m => (u24(m.der.length) ++ m.der, Some(m)))
      // interleave zero-length entries (skipped, parse continues)
      if (chance(30)) {
        val at = nextInt(entries.length + 1)
        entries = (entries.take(at) :+ ((u24(0), None))) ++ entries.drop(at)
      }
      var body = entries.map(_._1).reduce(_ ++ _)
      var expected = entries.flatMap(_._2)
      var totalField = body.length
      nextInt(3) match {
        case 0 if entries.last._2.nonEmpty =>
          // truncate into the final cert: it is dropped, the rest kept;
          // the declared total may tell the truth or still claim the cut
          val cut = 1 + nextInt(entries.last._1.length)
          body = body.dropRight(cut)
          expected = expected.dropRight(1)
          totalField = body.length + (if (chance(50)) cut else 0)
        case 1 => // total-length lie larger than the body → clamped
          totalField = body.length + 20 + nextInt(60)
        case _ => ()
      }
      val got = CertParser.fromCertificateMessage(u24(totalField) ++ body)
      withClue(s"trial $trial: ") {
        assert(got.length == expected.length)
        got.zip(expected).foreach { case (c, m) => check(m, Some(c)) }
      }
    }
  }

  test("framing: short body and garbage yield empty, never throw") {
    assert(CertParser.fromCertificateMessage(Array.emptyByteArray).isEmpty)
    assert(CertParser.fromCertificateMessage(Array[Byte](0, 0, 5)).isEmpty)
    (0 until 20).foreach { _ =>
      CertParser.fromCertificateMessage(randBytes(3 + nextInt(80)))
    }
  }
}
