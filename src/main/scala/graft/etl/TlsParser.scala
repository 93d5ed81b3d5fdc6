package graft.etl

import java.nio.charset.StandardCharsets

/** TLS handshake metadata extractor — version, cipher, session ids,
  * SNI, JA3/JA3S — rebuilt as a byte-exact transcription of the
  * reference parser (capture/parsers/tls.c) over its BSB discipline
  * (capture/bsb.h), the same treatment the ASN.1/HTTP/SMTP/DNS walkers
  * got; pinned by DnsDifferentialFuzzSpec's sibling
  * TlsDifferentialFuzzSpec plus the golden corpus.
  *
  * The reference's machine, which this reproduces:
  *  - tls_classify (tls.c:749-763) fires on the first in-order chunk
  *    whose payload STARTS with 16 03 (needle, tls.c:931), minor
  *    version <= 3, and handshake type 1 or 2 at byte 5. A type-1
  *    chunk is parsed as the ClientHello THERE AND ONLY THERE — the
  *    client side is NEVER reassembled, so a hello spanning packets is
  *    clamp-truncated at the packet boundary (every MIN() below).
  *    The server direction is the classify chunk's direction for a
  *    type-2 match, its opposite for type-1.
  *  - the server machine (tls_parser, tls.c:692-729) accumulates the
  *    server chunks into an 8192-byte buffer (overflow TRUNCATES), and
  *    drains AT MOST ONE complete record per feed; a non-handshake
  *    byte at the buffer head unregisters; a ServerHelloDone message
  *    unregisters; session save flushes whatever is buffered as ONE
  *    record body regardless of its declared length (tls_save,
  *    tls.c:732-740).
  *  - JA3 (client, tls.c:514-689): GREASE-filtered ciphers /
  *    extensions / curves; the string is suppressed entirely when any
  *    of its four builders errored — including the rewind-on-empty
  *    error when an extension block, curve list, or format list
  *    contributed nothing (BSB_EXPORT_rewind on an empty buffer errors
  *    it, bsb.h:130-140). A truncated cipher/extension list still
  *    contributes a spurious trailing "0-" / truncated etype.
  *  - JA3S (server, tls.c:283-330): NO grease filter on the extension
  *    list, and supported_versions' 2 payload bytes are consumed TWICE
  *    (read + unconditional skip, tls.c:306-311,320) — every
  *    subsequent extension type in the ja3s string is desynced by 2
  *    bytes. JA3S is emitted even when the hello is truncated (cipher
  *    defaults to 0).
  *  - the version field comes ONLY from ServerHello (0x0303 resolves
  *    to TLSv1.3 iff supported_versions said 0x0304, else TLSv1.2);
  *    the ClientHello version feeds only ja3.
  *  - ALPN is not a stored field: a server extension 0x10 whose
  *    payload is exactly 00 03 02 68 32 ("h2") adds the http2
  *    protocol (tls.c:315-319).
  *
  * Certificate messages (type 11) are routed to [[CertParser]] (its own
  * golden + round-trip pinning, tls_process_server_certificate's
  * moloch-ASN.1 walk).
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
      // "h2" iff the server ALPN extension matched the reference's exact
      // 5-byte needle — the only thing tls.c does with ALPN
      alpn: Seq[String] = Nil)

  // ------------------------------------------------------------- BSB

  /** bsb.h import cursor: error == (end = NULL); failed imports leave
    * the target value unchanged (call sites init 0) and set the error.
    */
  private final class In(val buf: Array[Byte], start: Int, len: Int) {
    var ptr: Int = start
    private[this] var endPos: Int =
      if (len < 0) Int.MinValue else start + len
    def error: Boolean = endPos == Int.MinValue
    def remaining: Int = if (error) 0 else endPos - ptr
    def u08(): Int =
      if (!error && ptr + 1 <= endPos) { val v = buf(ptr) & 0xff; ptr += 1; v }
      else { endPos = Int.MinValue; 0 }
    def u16(): Int =
      if (!error && ptr + 2 <= endPos) {
        val v = ((buf(ptr) & 0xff) << 8) | (buf(ptr + 1) & 0xff)
        ptr += 2; v
      } else { endPos = Int.MinValue; 0 }
    def skip(n: Int): Unit =
      if (!error && ptr + n <= endPos) ptr += n
      else endPos = Int.MinValue
  }

  /** bsb.h export buffer with BSB_EXPORT_sprintf/u08/rewind semantics:
    * sprintf on a len==remaining fit still NUL-truncates the last byte
    * (snprintf), overflow sets the error without advancing, rewind on
    * an empty or errored buffer errors it. `cstr` reads to the first
    * NUL like the reference's strlen() use.
    */
  private final class Out(size: Int) {
    val buf = new Array[Byte](size)
    var len = 0
    var err = false
    def sprintf(s: String): Unit = {
      if (err) return // C: if ((b).end != 0)
      val l = s.length
      val rem = size - len
      if (l < rem) {
        var i = 0; while (i < l) { buf(len + i) = s.charAt(i).toByte; i += 1 }
        len += l
      } else if (l == rem && rem > 0) {
        var i = 0
        while (i < l - 1) { buf(len + i) = s.charAt(i).toByte; i += 1 }
        buf(len + l - 1) = 0
        len += l
      } else {
        // snprintf still wrote the truncated prefix + NUL, visible to
        // the strlen() reader even though the cursor did not advance
        var i = 0
        while (i < rem - 1) { buf(len + i) = s.charAt(i).toByte; i += 1 }
        if (rem > 0) buf(size - 1) = 0
        err = true
      }
    }
    def u08(c: Char): Unit =
      if (!err && len < size) { buf(len) = c.toByte; len += 1 } else err = true
    def rewind1(): Unit =
      if (!err && len >= 1) len -= 1 else err = true
    /** the %.*s view: exactly `len` bytes */
    def lenStr: String = new String(buf, 0, len, StandardCharsets.ISO_8859_1)
    /** the strlen() view: to the first NUL */
    def cstr: String = {
      var i = 0
      while (i < size && buf(i) != 0) i += 1
      new String(buf, 0, i, StandardCharsets.ISO_8859_1)
    }
  }

  // ----------------------------------------------------------- tables

  private def md5hex(s: String): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

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

  /** IANA cipher-suite names (public registry), common subset —
    * mirrors the reference's generated tls-cipher.h table entries the
    * corpus exercises; absent ids render 0xNNNN like the reference's
    * NULL-slot fallback (tls.c:268-272).
    */
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

  /** tls_is_grease_value (tls.c:181-189): low nibble 0xa and equal
    * high/low bytes.
    */
  private def isGrease(v: Int): Boolean =
    (v & 0x0f) == 0x0a && (v & 0xff) == ((v >> 8) & 0xff)

  private def hexLower(b: Array[Byte], from: Int, len: Int): String =
    Hex.hex(b, from, len)

  // -------------------------------------------------- result collector

  private final class Fields {
    val version = Seq.newBuilder[String]
    val cipher = Seq.newBuilder[String]
    val ja3 = Seq.newBuilder[String]
    val ja3string = Seq.newBuilder[String]
    val ja3s = Seq.newBuilder[String]
    val ja3sstring = Seq.newBuilder[String]
    val srcId = Seq.newBuilder[String]
    val dstId = Seq.newBuilder[String]
    val sni = Seq.newBuilder[String]
    val certs = Seq.newBuilder[CertParser.CertInfo]
    var http2 = false
  }

  // --------------------------------------------------- client (1 pkt)

  /** tls_process_client (tls.c:514-689): runs on the classify packet's
    * payload only.
    */
  private[etl] def processClient(data: Array[Byte], f: Fields): Unit = {
    val ja3 = new Out(30000)
    val ecja3 = new Out(10000)
    val ecfja3 = new Out(1000)
    val eja3 = new Out(10000)
    if (data.length > 5) {
      val ssllen =
        math.min(data.length - 5, ((data(3) & 0xff) << 8) | (data(4) & 0xff))
      // pbsb over (data+5, ssllen)
      if (ssllen > 7) {
        val pOff = 5
        val plen = math.min(ssllen - 4,
          ((data(pOff + 2) & 0xff) << 8) | (data(pOff + 3) & 0xff))
        val ver = ((data(pOff + 4) & 0xff) << 8) | (data(pOff + 5) & 0xff)
        ja3.sprintf(s"$ver,")
        val cbsb = new In(data, pOff + 6, plen - 2)
        if (cbsb.remaining > 32) {
          cbsb.skip(32) // Random
          val sidLen = cbsb.u08()
          if (sidLen > 0 && cbsb.remaining > sidLen)
            f.srcId += hexLower(data, cbsb.ptr, sidLen)
          cbsb.skip(sidLen)
          var clen = cbsb.u16() // cipher suites length
          while (!cbsb.error && clen > 0) {
            val c = cbsb.u16() // on a short list this reads 0 once
            if (!isGrease(c)) ja3.sprintf(s"$c-")
            clen -= 2
          }
          ja3.rewind1()
          ja3.u08(',')
          val compLen = cbsb.u08()
          cbsb.skip(compLen)
          if (cbsb.remaining > 6) {
            var etot = cbsb.u16()
            etot = math.min(etot, cbsb.remaining)
            val ebsb = new In(data, cbsb.ptr, etot)
            var break = false
            while (!break && ebsb.remaining > 4) {
              val etype = ebsb.u16()
              val elen = ebsb.u16()
              if (!isGrease(etype)) eja3.sprintf(s"$etype-")
              if (elen > ebsb.remaining) break = true
              else etype match {
                case 0 => // SNI: strict list/type/length equalities
                  val sni = new In(data, ebsb.ptr, elen)
                  ebsb.skip(elen)
                  val listLen = sni.u16()
                  if (listLen == sni.remaining) {
                    val t = sni.u08()
                    if (t == 0) {
                      val nlen = sni.u16()
                      if (nlen == sni.remaining)
                        f.sni += new String(data, sni.ptr, nlen,
                          StandardCharsets.ISO_8859_1)
                    }
                  }
                case 0x0a => // elliptic curves
                  val b = new In(data, ebsb.ptr, elen)
                  ebsb.skip(elen)
                  var llen = b.u16()
                  while (llen > 0 && !b.error) {
                    val c = b.u16()
                    if (!isGrease(c)) ecja3.sprintf(s"$c-")
                    llen -= 2
                  }
                  ecja3.rewind1()
                case 0x0b => // ec point formats
                  val b = new In(data, ebsb.ptr, elen)
                  ebsb.skip(elen)
                  var llen = b.u08()
                  while (llen > 0 && !b.error) {
                    val c = b.u08()
                    ecfja3.sprintf(s"$c-")
                    llen -= 1
                  }
                  ecfja3.rewind1()
                case _ => ebsb.skip(elen)
              }
            }
            eja3.rewind1()
          }
        }
      }
    }
    if (ja3.len > 0 && !ja3.err && !ecja3.err && !eja3.err && !ecfja3.err) {
      ja3.sprintf(s"${eja3.lenStr},${ecja3.lenStr},${ecfja3.lenStr}")
      // config.ja3Strings is on in the reference test deployment; the
      // string field reads via strlen (a failed final sprintf leaves a
      // NUL-truncated prefix), the md5 hashes exactly BSB_LENGTH bytes
      f.ja3string += ja3.cstr
      f.ja3 += md5hex(ja3.lenStr)
    }
  }

  // ----------------------------------------------- server hello / ja3s

  /** tls_process_server_hello (tls.c:222-344). */
  private[etl] def processServerHello(
      data: Array[Byte], off: Int, len: Int, f: Fields): Unit = {
    val bsb = new In(data, off, len)
    val ver = bsb.u16()
    bsb.skip(32)
    if (bsb.error) return
    var add12Later = false
    if (ver != 0x0303) f.version += versionName(ver)
    else add12Later = true
    if (ver >= 0x0300 && ver <= 0x0303) {
      val sidLen = bsb.u08()
      if (sidLen > 0 && bsb.remaining > sidLen)
        f.dstId += hexLower(data, bsb.ptr, sidLen)
      bsb.skip(sidLen)
    }
    val cipher = bsb.u16()
    f.cipher += cipherName(cipher)
    bsb.skip(1) // compression
    val eja3 = new Out(10000)
    if (bsb.remaining > 2) {
      var etot = bsb.u16()
      etot = math.min(etot, bsb.remaining)
      val ebsb = new In(data, bsb.ptr, etot)
      var break = false
      while (!break && ebsb.remaining > 0) {
        val etype = ebsb.u16()
        val elen = ebsb.u16()
        // NO grease filter on ja3s, and a truncated header still
        // exports "0-" (failed imports leave 0)
        eja3.sprintf(s"$etype-")
        if (elen > ebsb.remaining) break = true
        else {
          if (etype == 0x2b && elen == 2) {
            // supported_versions: read... and then ALSO skipped below —
            // the reference consumes these 2 bytes twice, desyncing
            // every later extension in the ja3s string (tls.c:306-320)
            val sv = ebsb.u16()
            if (sv == 0x0304) { f.version += versionName(0x0304); add12Later = false }
          }
          if (etype == 0x10 && elen == 5 && ebsb.remaining >= 5 &&
            data(ebsb.ptr) == 0 && data(ebsb.ptr + 1) == 3 &&
            data(ebsb.ptr + 2) == 2 && data(ebsb.ptr + 3) == 'h' &&
            data(ebsb.ptr + 4) == '2')
            f.http2 = true
          ebsb.skip(elen)
        }
      }
      eja3.rewind1()
    }
    if (add12Later) f.version += versionName(0x0303)
    // ja3s is emitted UNCONDITIONALLY (no error gate, unlike ja3)
    val ja3s = new Out(30000)
    ja3s.sprintf(s"$ver,$cipher,${eja3.lenStr}")
    f.ja3sstring += ja3s.cstr
    f.ja3s += md5hex(ja3s.lenStr)
  }

  /** tls_process_server_handshake_record (tls.c:489-512): walk one
    * record body's messages; returns true on ServerHelloDone
    * (caller unregisters).
    */
  private[etl] def processServerRecord(
      data: Array[Byte], off: Int, len: Int, f: Fields): Boolean = {
    var p = off
    val end = off + len
    while (end - p >= 4) {
      val hlen = math.min(end - p,
        (((data(p + 1) & 0xff) << 16) | ((data(p + 2) & 0xff) << 8) |
          (data(p + 3) & 0xff)) + 4)
      (data(p) & 0xff) match {
        case 2 => processServerHello(data, p + 4, hlen - 4, f)
        case 11 =>
          f.certs ++= CertParser.fromCertificateMessage(
            java.util.Arrays.copyOfRange(data, p + 4, p + hlen))
        case 14 => return true
        case _ =>
      }
      p += hlen
    }
    false
  }

  /** The TLSInfo_t machine (tls.c:692-740): 8 KiB buffer, at most ONE
    * record drained per feed, save-flush parses the remainder as one
    * record body.
    */
  private[etl] final class ServerMachine(f: Fields) {
    private val buf = new Array[Byte](8192)
    private var len = 0
    private var dead = false
    def feed(chunk: Array[Byte]): Unit = {
      if (dead) return
      val copy = math.min(chunk.length, buf.length - len)
      System.arraycopy(chunk, 0, buf, len, copy)
      len += copy
      if (len < 5) return
      if (buf(0) != 0x16) { len = 0; dead = true; return }
      val need = (((buf(3) & 0xff) << 8) | (buf(4) & 0xff)) + 5
      if (need > len) return
      if (processServerRecord(buf, 5, need - 5, f)) {
        len = 0; dead = true; return
      }
      len -= need
      if (len > 0) System.arraycopy(buf, need, buf, 0, len)
    }
    /** tls_save: the buffered remainder parses as ONE record body,
      * ignoring its declared length.
      */
    def finish(): Unit = {
      if (dead) return
      if (len > 5 && buf(0) == 0x16) {
        processServerRecord(buf, 5, len - 5, f)
        len = 0
      }
    }
  }

  // ----------------------------------------------------- entry points

  /** tls_classify's gate on one chunk (tls.c:749-763 + the \x16\x03
    * needle).
    */
  private def classifies(d: Array[Byte]): Boolean =
    d.length >= 6 && d(0) == 0x16 && d(1) == 0x03 && (d(2) & 0xff) <= 3 &&
      (d(5) == 1 || d(5) == 2)

  /** Parse a session's delivered chunks in arrival order; dir 0 =
    * initiator, 1 = responder. Classification, the single-packet
    * ClientHello parse, the server-direction choice, and the
    * one-record-per-chunk drain all follow the reference (see the
    * object Scaladoc).
    */
  def parseChunks(chunks: Seq[(Int, Array[Byte])]): Option[TlsInfo] = {
    val f = new Fields
    var serverDir = -1
    var machine: ServerMachine = null
    chunks.foreach { case (dir, data) =>
      if (machine == null) {
        if (classifies(data)) {
          machine = new ServerMachine(f)
          if (data(5) == 1) {
            processClient(data, f)
            serverDir = 1 - dir
          } else {
            serverDir = dir
            machine.feed(data) // the classify chunk reaches the parser too
          }
        }
      } else if (dir == serverDir) machine.feed(data)
    }
    if (machine == null) return None
    machine.finish()
    val certs = f.certs.result()
    val info = TlsInfo(
      version = f.version.result().distinct,
      cipher = f.cipher.result().distinct,
      ja3 = f.ja3.result().distinct,
      ja3string = f.ja3string.result().distinct,
      ja3s = f.ja3s.result().distinct,
      ja3sstring = f.ja3sstring.result().distinct,
      srcSessionId = f.srcId.result().distinct,
      dstSessionId = f.dstId.result().distinct,
      cert = certs,
      sni = f.sni.result().distinct,
      alpn = if (f.http2) Seq("h2") else Nil)
    Some(info)
  }

  /** Split a reassembled stream into TLS-record-aligned chunks — the
    * per-packet approximation for PEELED tunnel streams, where the
    * inner packet boundaries are gone. One record per chunk keeps the
    * server machine's record-at-a-time drain equivalent to a
    * packet-per-record capture; the tail (incomplete record) rides the
    * save-flush like the reference's.
    */
  def recordChunks(stream: Array[Byte]): Seq[Array[Byte]] = {
    if (stream.isEmpty) return Nil
    if (!(stream.length >= 6 && stream(0) == 0x16 && stream(1) == 0x03))
      return Seq(stream)
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i + 5 <= stream.length) {
      val len = ((stream(i + 3) & 0xff) << 8) | (stream(i + 4) & 0xff)
      val end = math.min(i + 5 + len, stream.length)
      out += java.util.Arrays.copyOfRange(stream, i, end)
      i += 5 + len
    }
    if (i < stream.length)
      out += java.util.Arrays.copyOfRange(stream, i, stream.length)
    out.result()
  }
}
