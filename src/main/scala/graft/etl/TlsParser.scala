package graft.etl

/** TLS handshake metadata extractor: version, cipher, session ids, and
  * JA3/JA3S fingerprints (public spec: github.com/salesforce/ja3).
  * Reference parser: capture/parsers/tls.c (938 LoC); certificate parsing
  * (cert.* fields) is future work.
  */
object TlsParser {

  final case class TlsInfo(
      version: Seq[String],
      cipher: Seq[String],
      ja3: Seq[String],
      ja3string: Seq[String],
      ja3s: Seq[String],
      ja3sstring: Seq[String],
      srcSessionId: Seq[String],
      dstSessionId: Seq[String],
      cert: Seq[CertParser.CertInfo],
      // client-hello SNI; the reference stores it in the shared http.host
      // field (parsers/tls.c:627,872)
      sni: Seq[String] = Nil,
      alpn: Seq[String] = Nil)

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u24(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)

  private def isGrease(v: Int): Boolean =
    (v & 0x0f0f) == 0x0a0a && ((v >> 8) & 0xff) == (v & 0xff)

  private def md5hex(s: String): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  private def hex(b: Array[Byte], from: Int, len: Int): String =
    Hex.hex(b, from, len)

  def versionName(v: Int): String = v match {
    case 0x0300 => "SSLv3"
    case 0x0301 => "TLSv1"
    case 0x0302 => "TLSv1.1"
    case 0x0303 => "TLSv1.2"
    case 0x0304 => "TLSv1.3"
    // draft negotiations carry 0x7fNN (tls.c:212-213)
    case d if d >= 0x7f00 && d <= 0x7fff => f"TLSv1.3-draft-${d & 0xff}%02d"
    case other  => f"0x$other%04x"
  }

  /** IANA cipher-suite names (public registry), common subset. */
  val cipherNames: Map[Int, String] = Map(
    0x0004 -> "TLS_RSA_WITH_RC4_128_MD5",
    0x0005 -> "TLS_RSA_WITH_RC4_128_SHA",
    0x000a -> "TLS_RSA_WITH_3DES_EDE_CBC_SHA",
    0x002f -> "TLS_RSA_WITH_AES_128_CBC_SHA",
    0x0035 -> "TLS_RSA_WITH_AES_256_CBC_SHA",
    0x003c -> "TLS_RSA_WITH_AES_128_CBC_SHA256",
    0x003d -> "TLS_RSA_WITH_AES_256_CBC_SHA256",
    0x009c -> "TLS_RSA_WITH_AES_128_GCM_SHA256",
    0x009d -> "TLS_RSA_WITH_AES_256_GCM_SHA384",
    0x1301 -> "TLS_AES_128_GCM_SHA256",
    0x1302 -> "TLS_AES_256_GCM_SHA384",
    0x1303 -> "TLS_CHACHA20_POLY1305_SHA256",
    0xc009 -> "TLS_ECDHE_ECDSA_WITH_AES_128_CBC_SHA",
    0xc00a -> "TLS_ECDHE_ECDSA_WITH_AES_256_CBC_SHA",
    0x0033 -> "TLS_DHE_RSA_WITH_AES_128_CBC_SHA",
    0x0039 -> "TLS_DHE_RSA_WITH_AES_256_CBC_SHA",
    0x0067 -> "TLS_DHE_RSA_WITH_AES_128_CBC_SHA256",
    0x006b -> "TLS_DHE_RSA_WITH_AES_256_CBC_SHA256",
    0x009e -> "TLS_DHE_RSA_WITH_AES_128_GCM_SHA256",
    0x009f -> "TLS_DHE_RSA_WITH_AES_256_GCM_SHA384",
    0xc007 -> "TLS_ECDHE_ECDSA_WITH_RC4_128_SHA",
    0xc008 -> "TLS_ECDHE_ECDSA_WITH_3DES_EDE_CBC_SHA",
    0xc011 -> "TLS_ECDHE_RSA_WITH_RC4_128_SHA",
    0xc012 -> "TLS_ECDHE_RSA_WITH_3DES_EDE_CBC_SHA",
    0xc013 -> "TLS_ECDHE_RSA_WITH_AES_128_CBC_SHA",
    0xc014 -> "TLS_ECDHE_RSA_WITH_AES_256_CBC_SHA",
    0xc023 -> "TLS_ECDHE_ECDSA_WITH_AES_128_CBC_SHA256",
    0xc024 -> "TLS_ECDHE_ECDSA_WITH_AES_256_CBC_SHA384",
    0xc027 -> "TLS_ECDHE_RSA_WITH_AES_128_CBC_SHA256",
    0xc028 -> "TLS_ECDHE_RSA_WITH_AES_256_CBC_SHA384",
    0xc02b -> "TLS_ECDHE_ECDSA_WITH_AES_128_GCM_SHA256",
    0xc02c -> "TLS_ECDHE_ECDSA_WITH_AES_256_GCM_SHA384",
    0xc02f -> "TLS_ECDHE_RSA_WITH_AES_128_GCM_SHA256",
    0xc030 -> "TLS_ECDHE_RSA_WITH_AES_256_GCM_SHA384",
    0xcca8 -> "TLS_ECDHE_RSA_WITH_CHACHA20_POLY1305_SHA256",
    0xcca9 -> "TLS_ECDHE_ECDSA_WITH_CHACHA20_POLY1305_SHA256")

  def cipherName(v: Int): String =
    cipherNames.getOrElse(v, f"0x$v%04x")

  /** Iterate TLS records (type, version, body) of a reassembled stream. */
  private def records(stream: Array[Byte]): Iterator[(Int, Int, Array[Byte])] =
    new Iterator[(Int, Int, Array[Byte])] {
      private var off = 0
      def hasNext: Boolean =
        off + 5 <= stream.length && {
          val t = stream(off) & 0xff
          t >= 20 && t <= 24 && u16(stream, off + 1) >= 0x0300 &&
            u16(stream, off + 1) <= 0x0304
        }
      def next(): (Int, Int, Array[Byte]) = {
        val t = stream(off) & 0xff
        val v = u16(stream, off + 1)
        val len = u16(stream, off + 3)
        val end = math.min(off + 5 + len, stream.length)
        val body = java.util.Arrays.copyOfRange(stream, off + 5, end)
        off = off + 5 + len
        (t, v, body)
      }
    }

  /** Concatenate handshake-record bodies, then iterate handshake
    * messages (type, body) — messages may span records.
    */
  private def handshakeMessages(stream: Array[Byte]): Iterator[(Int, Array[Byte])] = {
    // linear concatenation: the foldLeft array append copied the
    // accumulated buffer once per record — quadratic in record count on
    // a large certificate chain
    val hsBuf = new java.io.ByteArrayOutputStream()
    records(stream).foreach { case (ct, _, body) =>
      if (ct == 22) hsBuf.write(body)
    }
    val hs = hsBuf.toByteArray
    new Iterator[(Int, Array[Byte])] {
      private var off = 0
      def hasNext: Boolean = off + 4 <= hs.length
      def next(): (Int, Array[Byte]) = {
        val t = hs(off) & 0xff
        val len = u24(hs, off + 1)
        val end = math.min(off + 4 + len, hs.length)
        val body = java.util.Arrays.copyOfRange(hs, off + 4, end)
        off = off + 4 + len
        (t, body)
      }
    }
  }

  private final case class Hello(
      version: Int, sessionIdHex: String, ciphers: Seq[Int],
      extensions: Seq[Int], curves: Seq[Int], pointFormats: Seq[Int],
      supportedVersions: Seq[Int], chosenCipher: Option[Int],
      sni: Seq[String] = Nil, alpn: Seq[String] = Nil)

  private def parseHello(b: Array[Byte], isClient: Boolean): Option[Hello] = {
    try {
      var off = 0
      val version = u16(b, off); off += 2
      off += 32 // random
      // ServerHello carries a session id only for SSLv3..TLSv1.2 — a
      // TLS 1.3 draft server (0x7fNN) goes straight to the cipher
      // (tls.c:242-257); ClientHello always has the legacy field
      var sid = ""
      if (isClient || (version >= 0x0300 && version <= 0x0303)) {
        val sidLen = b(off) & 0xff; off += 1
        sid = hex(b, off, sidLen); off += sidLen
      }
      var ciphers = Seq.empty[Int]
      var chosen: Option[Int] = None
      if (isClient) {
        val cLen = u16(b, off); off += 2
        ciphers = (0 until cLen / 2).map(i => u16(b, off + i * 2))
        off += cLen
        val compLen = b(off) & 0xff; off += 1 + compLen
      } else {
        chosen = Some(u16(b, off)); off += 2
        off += 1 // compression (tls.c skips it for drafts too)
      }
      var exts = Seq.empty[Int]
      var curves = Seq.empty[Int]
      var formats = Seq.empty[Int]
      var supported = Seq.empty[Int]
      var sni = Seq.empty[String]
      var alpn = Seq.empty[String]
      if (off + 2 <= b.length) {
        val extTotal = u16(b, off); off += 2
        val extEnd = math.min(off + extTotal, b.length)
        while (off + 4 <= extEnd) {
          val et = u16(b, off); val el = u16(b, off + 2)
          val dataOff = off + 4
          // every sub-parse is bounded by THIS extension's end — an
          // internal length larger than el must neither read the next
          // extension's bytes (wrong JA3) nor run past the buffer
          // (exception voiding the whole hello)
          val dEnd = math.min(dataOff + el, b.length)
          exts :+= et
          if (et == 10 && dataOff + 2 <= dEnd) { // supported_groups
            val l = math.min(u16(b, dataOff), math.max(0, dEnd - dataOff - 2))
            curves = (0 until l / 2).map(i => u16(b, dataOff + 2 + i * 2))
          }
          if (et == 11 && dataOff + 1 <= dEnd) { // ec_point_formats
            val l = math.min(b(dataOff) & 0xff, math.max(0, dEnd - dataOff - 1))
            formats = (0 until l).map(i => b(dataOff + 1 + i) & 0xff)
          }
          if (et == 0 && dataOff + 5 <= dEnd) { // server_name
            val nameLen = u16(b, dataOff + 3)
            if (dataOff + 5 + nameLen <= dEnd)
              sni :+= new String(b, dataOff + 5, nameLen,
                java.nio.charset.StandardCharsets.ISO_8859_1)
          }
          if (et == 16 && dataOff + 2 <= dEnd) { // ALPN
            var ap = dataOff + 2
            val apEnd = math.min(dataOff + 2 + u16(b, dataOff), dEnd)
            while (ap < apEnd) {
              val l = b(ap) & 0xff
              if (ap + 1 + l <= apEnd)
                alpn :+= new String(b, ap + 1, l,
                  java.nio.charset.StandardCharsets.ISO_8859_1)
              ap += 1 + l
            }
          }
          if (et == 43) { // supported_versions
            if (isClient && dataOff + 1 <= dEnd) {
              val l = math.min(b(dataOff) & 0xff,
                math.max(0, dEnd - dataOff - 1))
              supported = (0 until l / 2).map(i => u16(b, dataOff + 1 + i * 2))
            } else if (!isClient && dataOff + 2 <= dEnd) {
              supported = Seq(u16(b, dataOff))
            }
          }
          off = dataOff + el
        }
      }
      Some(Hello(version, sid, ciphers, exts, curves, formats, supported,
        chosen, sni, alpn))
    } catch { case _: Exception => None }
  }

  /** First offset of a plausible TLS handshake record: after STARTTLS /
    * CONNECT / MySQL-SSL / LDAP upgrades the stream begins with the
    * cleartext protocol, and the TLS records start mid-stream (the
    * reference's parser engine naturally sees only post-upgrade packets;
    * a whole-stream reparse must scan). Requires content type 0x16,
    * version 0x03xx, a sane record length, and a Client/ServerHello
    * handshake type right after the record header.
    */
  private def tlsStart(stream: Array[Byte]): Int = {
    var i = 0
    while (i + 6 <= stream.length) {
      if (stream(i) == 0x16 && stream(i + 1) == 0x03 &&
          (stream(i + 2) & 0xff) <= 4) {
        val len = u16(stream, i + 3)
        val ht = stream(i + 5) & 0xff
        if (len > 0 && len <= 18432 && (ht == 1 || ht == 2)) return i
      }
      i += 1
    }
    -1
  }

  private def fromTls(stream: Array[Byte]): Array[Byte] = tlsStart(stream) match {
    case 0          => stream
    case -1         => Array.emptyByteArray
    case o          => java.util.Arrays.copyOfRange(stream, o, stream.length)
  }

  /** Parse both directions' reassembled streams into TLS metadata. */
  def parse(srcStream0: Array[Byte], dstStream0: Array[Byte]): Option[TlsInfo] = {
    val srcStream = fromTls(srcStream0)
    val dstStream = fromTls(dstStream0)
    val client = handshakeMessages(srcStream)
      .collectFirst { case (1, body) => body }.flatMap(parseHello(_, isClient = true))
    // one server-direction walk serves both the ServerHello and the
    // certificate chain below
    val serverMsgs = handshakeMessages(dstStream).toSeq
    val server = serverMsgs
      .collectFirst { case (2, body) => body }.flatMap(parseHello(_, isClient = false))
    if (client.isEmpty && server.isEmpty) return None

    val ja3 = client.map { c =>
      val noGrease = (xs: Seq[Int]) => xs.filterNot(isGrease)
      Seq(c.version.toString,
        noGrease(c.ciphers).mkString("-"),
        noGrease(c.extensions).mkString("-"),
        noGrease(c.curves).mkString("-"),
        c.pointFormats.mkString("-")).mkString(",")
    }
    val ja3s = server.map { s =>
      Seq(s.version.toString,
        s.chosenCipher.getOrElse(0).toString,
        s.extensions.filterNot(isGrease).mkString("-")).mkString(",")
    }
    // effective version (tls.c:236-240, 304-311, 324-325): a non-0x0303
    // ServerHello version is taken as-is (incl. 0x7fNN drafts); 0x0303
    // means TLSv1.3 iff supported_versions says 0x0304, else TLSv1.2
    val version = server.map { s =>
      if (s.version != 0x0303) versionName(s.version)
      else if (s.supportedVersions.contains(0x0304)) "TLSv1.3"
      else "TLSv1.2"
    }.orElse(client.map(c => versionName(c.version)))
    val cipher = server.flatMap(_.chosenCipher).map(cipherName)
    val certs = serverMsgs
      .collect { case (11, body) => CertParser.fromCertificateMessage(body) }
      .flatten.toSeq
    Some(TlsInfo(
      version = version.toSeq,
      cipher = cipher.toSeq,
      ja3 = ja3.map(md5hex).toSeq,
      ja3string = ja3.toSeq,
      ja3s = ja3s.map(md5hex).toSeq,
      ja3sstring = ja3s.toSeq,
      srcSessionId = client.map(_.sessionIdHex).filter(_.nonEmpty).toSeq,
      dstSessionId = server.map(_.sessionIdHex).filter(_.nonEmpty).toSeq,
      cert = certs,
      sni = client.map(_.sni).getOrElse(Nil).distinct,
      // negotiated protocol = the server's ALPN choice; a client OFFER
      // of h2 alone doesn't make the session http2
      alpn = server.map(_.alpn).getOrElse(Nil).distinct))
  }
}
