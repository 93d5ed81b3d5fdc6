package graft.etl

import java.security.cert.{CertificateFactory, X509Certificate}

import scala.jdk.CollectionConverters._

/** X.509 certificate metadata from the TLS Certificate handshake message
  * (reference: capture/parsers/certs.c; field layout db/db.pl:4199-4247).
  *
  * Uses the JDK's X.509 support; one CertInfo per certificate in chain
  * order. `remainingDays` is wall-clock-relative in the reference and is
  * intentionally not computed here (tests mask it as volatile).
  */
object CertParser {

  final case class CertInfo(
      hash: String,          // sha1 of DER, colon-separated hex
      serial: String,        // lowercase hex, no leading zero byte strip
      issuerCN: Seq[String], // lowercased
      issuerON: Seq[String], // original case
      subjectCN: Seq[String],
      subjectON: Seq[String],
      notBefore: Long,       // epoch ms
      notAfter: Long,
      validDays: Long,
      publicAlgorithm: String,
      curve: String,
      alt: Seq[String],      // dNSName subject-alt-names, lowercased
      // the reference's "isCA" is NOT basicConstraints: tls.c:121-132
      // reads the 4-byte keyUsage TLV and keeps bit 0x02 of its last
      // byte — the cRLSign bit. Absent keyUsage → false.
      isCA: Boolean = false,
      // a validity time parsed to before the epoch: the reference
      // clamps the stored time to 0 and tags cert:pre-epoch-time
      // (parsers.c asn_parse_time `if (val < 0)`)
      preEpoch: Boolean = false)

  private def colonHex(b: Array[Byte]): String =
    Hex.hexColon(b)

  /** RDN attribute values for a given attribute from an X.500 name, in
    * DER encoding order — the reference pushes each value as its ASN.1
    * walk encounters it (tls.c:64-77 DLL_PUSH_TAIL). LdapName.getRdns
    * indexes the RFC 2253 string right-to-left, and RFC 2253 renders
    * the RDNSequence last-encoded-first, so index order IS encoding
    * order; reversing here would flip multi-valued names.
    */
  private def rdnValues(name: javax.security.auth.x500.X500Principal,
      attr: String): Seq[String] = {
    try {
      new javax.naming.ldap.LdapName(name.getName).getRdns.asScala
        .flatMap { rdn =>
          rdn.toAttributes.getAll.asScala.collect {
            case a if a.getID.equalsIgnoreCase(attr) => a.get().toString
          }
        }.toSeq
    } catch { case _: Exception => Nil }
  }

  /** DER-keyed parse cache. Real traffic repeats the same server
    * certificates across thousands of sessions (the same CDN/CA chain),
    * and `CertificateFactory.generateCertificate` is ~100 µs per cert —
    * the hottest single call in the ingest profile. Keyed on the full
    * DER bytes (content equality, not hash-only), bounded per executor,
    * dropped wholesale when full — correctness never depends on it.
    */
  private final class DerKey(val der: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(der)
    override def equals(o: Any): Boolean = o match {
      case k: DerKey => java.util.Arrays.equals(der, k.der)
      case _         => false
    }
  }
  private val derCache =
    new java.util.concurrent.ConcurrentHashMap[DerKey, Option[CertInfo]]()
  private val DerCacheMax = 16384

  def parseDer(der: Array[Byte]): Option[CertInfo] = {
    val k = new DerKey(der)
    val hit = derCache.get(k)
    if (hit != null) return hit
    val parsed = parseDerUncached(der)
    if (derCache.size >= DerCacheMax) derCache.clear()
    derCache.put(k, parsed)
    parsed
  }

  private def parseDerUncached(der: Array[Byte]): Option[CertInfo] = {
    try {
      val cf = CertificateFactory.getInstance("X.509")
      val cert = cf.generateCertificate(new java.io.ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate]
      val sha1 = java.security.MessageDigest.getInstance("SHA-1")
        .digest(cert.getEncoded)
      // raw DER serial bytes incl. any leading sign byte — the reference
      // hex-dumps the encoded value verbatim (cloudshark-dtls1 keeps 00)
      val serial = Hex.hex(cert.getSerialNumber.toByteArray)
      val algo = cert.getPublicKey.getAlgorithm match {
        case "RSA" => "rsaEncryption"
        case "EC"  => "id-ecPublicKey"
        case "DSA" => "dsaEncryption"
        case other => other
      }
      val curve = cert.getPublicKey match {
        case ec: java.security.interfaces.ECPublicKey =>
          ec.getParams.getCurve.getField.getFieldSize match {
            case 256 => "prime256v1"
            case 384 => "secp384r1"
            case 521 => "secp521r1"
            case n   => s"$n-bit"
          }
        case _ => ""
      }
      val alt = Option(cert.getSubjectAlternativeNames).map(_.asScala.toSeq)
        .getOrElse(Nil)
        .collect { case l if l.get(0) == 2 => l.get(1).toString.toLowerCase }
      // pre-epoch validity times clamp to 0 and flag the session tag,
      // like the reference (parsers.c asn_parse_time `if (val < 0)`)
      val nb0 = cert.getNotBefore.getTime
      val na0 = cert.getNotAfter.getTime
      val nb = math.max(0L, nb0)
      val na = math.max(0L, na0)
      Some(CertInfo(
        hash = colonHex(sha1),
        serial = serial,
        issuerCN = rdnValues(cert.getIssuerX500Principal, "CN").map(_.toLowerCase),
        issuerON = rdnValues(cert.getIssuerX500Principal, "O"),
        subjectCN = rdnValues(cert.getSubjectX500Principal, "CN").map(_.toLowerCase),
        subjectON = rdnValues(cert.getSubjectX500Principal, "O"),
        notBefore = nb, notAfter = na,
        validDays = (na - nb) / 86400000L,
        publicAlgorithm = algo,
        curve = curve,
        alt = alt,
        isCA = Option(cert.getKeyUsage).exists(ku => ku.length > 6 && ku(6)),
        preEpoch = nb0 < 0 || na0 < 0))
    } catch { case _: Exception => parseDerLenient(der) }
  }

  /** Hand-rolled TBSCertificate walk for certs the JDK refuses (e.g.
    * CVE-2020-0601-style explicit EC parameters): the reference's ASN.1
    * reader (tls.c:82-119) keeps such certs, labelling the unreadable
    * parts "corrupt" — named-curve params longer than an OID render as
    * curve "corrupt" exactly like tls.c:109.
    */
  private def parseDerLenient(der: Array[Byte]): Option[CertInfo] = {
    import Asn1.{Tlv, getTlv, children}
    def oidString(t: Tlv): String = Asn1.decodeOid(t.buf, t.off, t.len)
    def nameValues(t: Tlv, oid: String): Seq[String] =
      children(t, 64).flatMap(set => children(set, 8)).flatMap { seq =>
        children(seq, 2) match {
          case Seq(o, v) if !o.pc && o.tag == 6 && oidString(o) == oid =>
            Some(new String(v.buf, v.off, v.len,
              if (v.tag == 12) java.nio.charset.StandardCharsets.UTF_8
              else java.nio.charset.StandardCharsets.ISO_8859_1))
          case _ => None
        }
      }
    // Transcription of moloch_parsers_asn_parse_time (parsers.c:
    // 508-575), quirks included: non-digit characters read as 0
    // (char2num), out-of-range fields normalize like timegm (month 00
    // rolls into the previous December), optional GeneralizedTime
    // minutes/seconds/fraction, and the timezone offset is computed in
    // MINUTES but added to the epoch SECONDS — +0130 shifts the time by
    // 90 seconds, exactly like the C. Returns the RAW possibly-negative
    // epoch ms; the caller clamps and flags preEpoch. The JDK path
    // keeps real offset semantics for certs the JDK accepts (no corpus
    // cert carries an offset time).
    def asnTime(t: Tlv): Option[Long] =
      try {
        def c2n(i: Int): Int = {
          val ch = t.buf(t.off + i) & 0xff
          if (ch >= '0' && ch <= '9') ch - '0' else 0
        }
        def s2n(i: Int): Int = c2n(i) * 10 + c2n(i + 1)
        def s4n(i: Int): Int =
          c2n(i) * 1000 + c2n(i + 1) * 100 + c2n(i + 2) * 10 + c2n(i + 3)
        def at(i: Int): Int = t.buf(t.off + i) & 0xff
        def norm(tmYear: Int, mon: Int, mday: Int, hour: Int, min: Int,
            sec: Int): Long =
          java.time.LocalDateTime.of(1900 + tmYear, 1, 1, 0, 0, 0)
            .plusMonths(mon).plusDays(mday - 1L)
            .plusHours(hour).plusMinutes(min).plusSeconds(sec)
            .toEpochSecond(java.time.ZoneOffset.UTC)
        val len = t.len
        if (t.tag == 23 && len > 12) { // UTCTime
          var offMin = 0
          if (len > 17 && at(12) != 'Z') offMin = s2n(13) * 60 + s2n(15)
          if (at(12) == '-') offMin = -offMin
          var tmYear = s2n(0)
          if (tmYear < 50) tmYear += 100
          val sec = norm(tmYear, s2n(2) - 1, s2n(4), s2n(6), s2n(8),
            s2n(10)) + offMin // minutes added as seconds, like the C
          Some(sec * 1000L)
        } else if (t.tag == 24 && len >= 10) { // GeneralizedTime
          val tmYear = s4n(0) - 1900
          val mon = s2n(4) - 1
          val mday = s2n(6)
          val hour = s2n(8)
          var min = 0
          var sec = 0
          var pos = 10
          var done = false
          if (len < 12 || at(10) == 'Z' || at(10) == '+' || at(10) == '-') {
            pos = 10; done = true
          }
          if (!done) {
            min = s2n(10)
            if (len < 14 || at(12) == 'Z' || at(12) == '+' || at(12) == '-') {
              pos = 12; done = true
            }
          }
          if (!done) {
            sec = s2n(12)
            if (len < 15 || at(14) == 'Z' || at(14) == '+' || at(14) == '-') {
              pos = 14
            } else if (at(14) == '.') {
              pos = 18
            } else {
              pos = 14
            }
          }
          var off = 0L
          if (pos != len && pos + 5 < len && (at(pos) == '+' || at(pos) == '-')) {
            off = s2n(pos + 1) * 60 + s2n(pos + 3)
            if (at(pos) == '-') off = -off
          }
          Some((norm(tmYear, mon, mday, hour, min, sec) + off) * 1000L)
        } else None // other tags / under the length floor: 0, untagged
      } catch { case _: Exception => None }
    try {
      val (outer, _) = getTlv(der, 0, der.length).getOrElse(return None)
      val kids = children(outer, 3)
      if (kids.isEmpty) return None
      val tbs = children(kids.head, 16)
      var i = 0
      if (tbs.nonEmpty && tbs(0).pc && tbs(0).tag == 0) i = 1 // [0] version
      if (tbs.length < i + 6) return None
      val serialT = tbs(i)
      val issuerT = tbs(i + 2)
      val validityT = tbs(i + 3)
      val subjectT = tbs(i + 4)
      val spkiT = tbs(i + 5)
      val times = children(validityT, 2)
      val nb0 = times.headOption.flatMap(asnTime).getOrElse(0L)
      val na0 = times.lift(1).flatMap(asnTime).getOrElse(0L)
      // pre-epoch clamp + tag flag, like the JDK path (parsers.c
      // asn_parse_time `if (val < 0)`)
      val nb = math.max(0L, nb0)
      val na = math.max(0L, na0)
      var algo = "corrupt"
      var curve = ""
      children(spkiT, 2).headOption.foreach { algT =>
        val parts = children(algT, 2)
        parts.headOption.filter(o => !o.pc && o.tag == 6).foreach { o =>
          algo = oidString(o) match {
            case "1.2.840.113549.1.1.1" => "rsaEncryption"
            case "1.2.840.10045.2.1"    => "id-ecPublicKey"
            case "1.2.840.10040.4.1"    => "dsaEncryption"
            case _                      => "unknown"
          }
          if (algo == "id-ecPublicKey") {
            curve = parts.lift(1) match {
              case Some(p) if !p.pc && p.tag == 6 && p.len <= 12 =>
                oidString(p) match {
                  case "1.2.840.10045.3.1.7" => "prime256v1"
                  case "1.3.132.0.34"        => "secp384r1"
                  case "1.3.132.0.35"        => "secp521r1"
                  case "1.3.132.0.10"        => "secp256k1"
                  case _                     => "unknown"
                }
              case _ => "corrupt" // explicit params / oversize (tls.c:109)
            }
          }
        }
      }
      val sha1 = java.security.MessageDigest.getInstance("SHA-1").digest(der)
      Some(CertInfo(
        hash = colonHex(sha1),
        serial = Hex.hex(serialT.bytes),
        issuerCN = nameValues(issuerT, "2.5.4.3").map(_.toLowerCase),
        issuerON = nameValues(issuerT, "2.5.4.10"),
        subjectCN = nameValues(subjectT, "2.5.4.3").map(_.toLowerCase),
        subjectON = nameValues(subjectT, "2.5.4.10"),
        notBefore = nb, notAfter = na,
        validDays = (na - nb) / 86400000L,
        publicAlgorithm = algo,
        curve = curve,
        alt = Nil,
        preEpoch = nb0 < 0 || na0 < 0))
    } catch { case _: Exception => None }
  }

  /** Extract chain DERs from a TLS Certificate handshake message body:
    * 3-byte chain length, then per-cert 3-byte length + DER bytes.
    */
  def fromCertificateMessage(body: Array[Byte]): Seq[CertInfo] = {
    def u24(i: Int): Int =
      ((body(i) & 0xff) << 16) | ((body(i + 1) & 0xff) << 8) | (body(i + 2) & 0xff)
    if (body.length < 6) return Nil
    val total = u24(0)
    var off = 3
    val end = math.min(3 + total, body.length)
    val out = Seq.newBuilder[CertInfo]
    while (off + 3 <= end) {
      val len = u24(off)
      off += 3
      if (len > 0 && off + len <= end) {
        parseDer(java.util.Arrays.copyOfRange(body, off, off + len))
          .foreach(out += _)
      }
      off += len
    }
    out.result()
  }
}
