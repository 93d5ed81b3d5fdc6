package graft.etl

/** DTLS handshake certificate extraction (reference: capture/parsers/
  * dtls.c). DTLS records carry handshake messages that may fragment
  * across records/datagrams; fragments reassemble by message sequence
  * before the Certificate message feeds the shared X.509 parser.
  */
object DtlsParser {

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u24(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)

  def certs(payloads: Seq[Array[Byte]]): Seq[CertParser.CertInfo] = {
    // msg_seq → (buffer, received-bytes count) for Certificate messages
    val frags = scala.collection.mutable.Map[Int, (Array[Byte], Int)]()
    val out = Seq.newBuilder[CertParser.CertInfo]
    payloads.foreach { d =>
      var off = 0
      while (off + 13 <= d.length) {
        val ctype = d(off) & 0xff
        val recLen = u16(d, off + 11)
        val recEnd = math.min(off + 13 + recLen, d.length)
        if (ctype == 22) { // handshake record
          var p = off + 13
          while (p + 12 <= recEnd) {
            val htype = d(p) & 0xff
            val totalLen = u24(d, p + 1)
            val msgSeq = u16(d, p + 4)
            val fragOff = u24(d, p + 6)
            val fragLen = u24(d, p + 9)
            val dataEnd = math.min(p + 12 + fragLen, recEnd)
            if (htype == 11 && totalLen > 0 && totalLen < (1 << 22) &&
                fragOff + (dataEnd - (p + 12)) <= totalLen) {
              val (buf, got) = frags.getOrElse(msgSeq,
                (new Array[Byte](totalLen), 0))
              val n = dataEnd - (p + 12)
              System.arraycopy(d, p + 12, buf, fragOff, n)
              val got2 = got + n
              if (got2 >= totalLen) {
                frags.remove(msgSeq)
                out ++= CertParser.fromCertificateMessage(buf)
              } else frags(msgSeq) = (buf, got2)
            }
            p = dataEnd
            if (fragLen == 0) p = recEnd // avoid stalling on bad length
          }
        }
        off = recEnd
        if (recLen == 0) off = d.length
      }
    }
    out.result()
  }
}

/** RADIUS attribute extraction (reference: capture/parsers/radius.c):
  * User-Name (1), Framed-IP-Address (8), Calling-Station-Id (31,
  * 12 hex chars → colon-separated lowercase mac). ASN/GEO/RIR
  * enrichments of framedIp need external databases and are left to the
  * enrichment join operators.
  */
object RadiusParser {

  final case class RadiusInfo(
      user: Seq[String], framedIp: Seq[String], mac: Seq[String])

  def parse(payloads: Seq[Array[Byte]]): Option[RadiusInfo] = {
    val user = Seq.newBuilder[String]
    val ip = Seq.newBuilder[String]
    val mac = Seq.newBuilder[String]
    var any = false
    payloads.foreach { d =>
      if (d.length >= 20 && d(0) >= 1 && d(0) <= 5 &&
          d.length == ((d(2) & 0xff) << 8 | (d(3) & 0xff))) {
        any = true
        var p = 20
        var ok = true
        while (ok && p + 2 < d.length) {
          val t = d(p) & 0xff
          val l = d(p + 1) & 0xff
          if (l < 3 || p + l > d.length) ok = false
          else {
            val vLen = l - 2
            t match {
              case 1 =>
                user += new String(d, p + 2, vLen,
                  java.nio.charset.StandardCharsets.ISO_8859_1)
              case 8 if vLen == 4 =>
                ip += (p + 2 until p + 6).map(i => (d(i) & 0xff).toString)
                  .mkString(".")
              case 31 if vLen == 12 =>
                val hx = new String(d, p + 2, 12,
                  java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
                mac += hx.grouped(2).mkString(":")
              case _ =>
            }
            p += l
          }
        }
      }
    }
    if (!any) None
    else Some(RadiusInfo(user.result().distinct, ip.result().distinct,
      mac.result().distinct))
  }
}
