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
      isCA: Boolean = false)

  private def colonHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString(":")

  /** RDN attribute values for a given attribute from an X.500 name. */
  private def rdnValues(name: javax.security.auth.x500.X500Principal,
      attr: String): Seq[String] = {
    try {
      new javax.naming.ldap.LdapName(name.getName).getRdns.asScala
        .flatMap { rdn =>
          rdn.toAttributes.getAll.asScala.collect {
            case a if a.getID.equalsIgnoreCase(attr) => a.get().toString
          }
        }.toSeq.reverse
    } catch { case _: Exception => Nil }
  }

  def parseDer(der: Array[Byte]): Option[CertInfo] = {
    try {
      val cf = CertificateFactory.getInstance("X.509")
      val cert = cf.generateCertificate(new java.io.ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate]
      val sha1 = java.security.MessageDigest.getInstance("SHA-1")
        .digest(cert.getEncoded)
      // raw DER serial bytes incl. any leading sign byte — the reference
      // hex-dumps the encoded value verbatim (cloudshark-dtls1 keeps 00)
      val serial = cert.getSerialNumber.toByteArray
        .map(x => f"${x & 0xff}%02x").mkString
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
      val nb = cert.getNotBefore.getTime
      val na = cert.getNotAfter.getTime
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
        isCA = Option(cert.getKeyUsage).exists(ku => ku.length > 6 && ku(6))))
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
