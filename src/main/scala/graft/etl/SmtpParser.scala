package graft.etl

import java.nio.charset.StandardCharsets

/** SMTP / email metadata extractor: envelope (HELO/EHLO, MAIL FROM,
  * RCPT TO) from the command stream and message headers (Subject, From,
  * To, Content-Type, MIME-Version) from the DATA section.
  * Reference parser: capture/parsers/smtp.c (1072 LoC).
  */
object SmtpParser {

  final case class SmtpInfo(
      hello: Seq[String],
      src: Seq[String],
      dst: Seq[String],
      subject: Seq[String],
      contentType: Seq[String],
      mimeVersion: Seq[String],
      headers: Seq[String],
      user: Seq[String] = Nil,
      id: Seq[String] = Nil,
      host: Seq[String] = Nil,
      ip: Seq[String] = Nil,
      useragent: Seq[String] = Nil,
      // parseSMTPHeaderAll (smtp.c:651-655): headers no parser consumed
      // keep their lowered name and leading-space-stripped raw value
      headerField: Seq[String] = Nil,
      headerValue: Seq[String] = Nil,
      // configured [headers-email] x-elnk-trace → email.header-x-elnk-trace
      headerTrace: Seq[String] = Nil,
      // base64 MIME parts: digests of the decoded content, emitted at the
      // part's closing boundary (smtp.c:700-716), magic of the first
      // decoded chunk, and Content-Disposition filename= values
      md5: Seq[String] = Nil,
      sha256: Seq[String] = Nil,
      filename: Seq[String] = Nil,
      bodyMagic: Seq[String] = Nil,
      // session tags the parser raises (smtp:authplain, smtp:authlogin,
      // smtp:starttls — smtp.c:479-512)
      tags: Seq[String] = Nil)

  /** Received-header walk (smtp.c:375-426): "from "/"by " tokens yield
    * relay hosts (part after a '@' wins, lowercased); any "[...]" span
    * yields a relay ip.
    */
  def parseReceived(v: String,
      hosts: scala.collection.mutable.Builder[String, Seq[String]],
      ips: scala.collection.mutable.Builder[String, Seq[String]]): Unit = {
    val end = v.length
    var i = 0
    while (i < end) {
      if (end - i > 10 &&
        (v.startsWith("from ", i) && (i == 0 || v(i - 1) != '-'))) {
        i += 5
        while (i < end && v(i).isWhitespace) i += 1
        if (i < end && v(i) == '[') {
          i += 1
          val s = i
          while (i < end && v(i) != ']') i += 1
          ips += v.substring(s, i)
          i += 1
        } else {
          var s = i
          while (i < end && v(i) != ' ' && v(i) != ')') {
            if (v(i) == '@') s = i + 1
            i += 1
          }
          if (i > s) hosts += v.substring(s, i).toLowerCase
        }
      } else if (end - i > 10 && v.startsWith("by ", i)) {
        i += 3
        while (i < end && v(i).isWhitespace) i += 1
        var s = i
        while (i < end && v(i) != ' ' && v(i) != ')') {
          if (v(i) == '@') s = i + 1
          i += 1
        }
        if (i > s) hosts += v.substring(s, i).toLowerCase
      } else {
        if (v(i) == '[') {
          val s = i + 1
          var j = s
          while (j < end && v(j) != ']') j += 1
          if (j > s && j < end) ips += v.substring(s, j)
          i = j
        }
        i += 1
      }
    }
  }

  /** moloch_field_ip_add_str parses relay addresses with inet_aton
    * semantics — leading-zero octets are OCTAL — and stores the
    * normalized dotted form; the redacted fixtures rely on this
    * ("10.000.000.002" → 10.0.0.2). Returns None for unparseable text
    * (the C add just fails silently).
    */
  def normalizeMailIp(s0: String): Option[String] = {
    val s = s0.trim
    if (s.isEmpty) return None
    if (s.contains(':')) { // v6
      return Option(graft.functions.IpUtil.toBytes(s))
        .map(graft.functions.IpUtil.expanded)
    }
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    val octets = parts.map { p =>
      try {
        val v =
          if (p.length > 1 && (p.startsWith("0x") || p.startsWith("0X")))
            Integer.parseInt(p.substring(2), 16)
          else if (p.length > 1 && p.startsWith("0")) Integer.parseInt(p, 8)
          else Integer.parseInt(p)
        if (v >= 0 && v <= 255) v else -1
      } catch { case _: NumberFormatException => -1 }
    }
    if (octets.contains(-1)) None else Some(octets.mkString("."))
  }

  private[etl] def isspaceC(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' ||
      c == '\r'

  /** glibc atoi = (int)strtol(s, NULL, 10): strtol clamps overflow to
    * LONG_MAX/LONG_MIN, then the int cast TRUNCATES to the low 32 bits —
    * "9999999999" reads 1410065407, a >LONG_MAX digit string reads
    * (int)LONG_MAX = -1 (used by smtp.c:458 statuscode, smtp.c:471 BDAT).
    */
  private[etl] def atoiC(s: String): Int = {
    var i = 0
    while (i < s.length && isspaceC(s.charAt(i))) i += 1
    var neg = false
    if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) {
      neg = s.charAt(i) == '-'
      i += 1
    }
    var v = 0L
    var over = false
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
      val d = s.charAt(i) - '0'
      if (!over) {
        if (v > (Long.MaxValue - d) / 10) over = true
        else v = v * 10 + d
      }
      i += 1
    }
    val l =
      if (over) { if (neg) Long.MinValue else Long.MaxValue }
      else if (neg) -v
      else v
    l.toInt
  }

  /** smtp_remove_matching (smtp.c:93-108): leading isspace skip, ONE
    * optional opening char, cut at the closing char — or the string END
    * when the closing char never appears (an unquoted
    * `boundary=b; charset=x` keeps `b; charset=x` whole, so such a
    * boundary never matches a part line; the null reverse-path
    * "MAIL FROM:<>" records an empty src — wireshark-bdat golden).
    */
  private[etl] def removeMatching(s: String, open: Char, close: Char): String = {
    var i = 0
    while (i < s.length && isspaceC(s.charAt(i))) i += 1
    if (i < s.length && s.charAt(i) == open) i += 1
    val start = i
    while (i < s.length && s.charAt(i) != close) i += 1
    s.substring(start, i)
  }

  /** Header address-list walk (smtp.c:343-373): skip leading space and a
    * quoted display name, prefer the `<...>` mailbox, else the bare
    * token up to '<' or ','; lowercased, comma-separated.
    */
  def parseAddresses(value: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val end = value.length
    var i = 0
    while (i < end) {
      while (i < end && value(i).isWhitespace) i += 1
      var start = i
      if (i < end && value(i) == '"') {
        i += 1
        while (i < end && value(i) != '"') i += 1
        i += 1
        while (i < end && value(i).isWhitespace) i += 1
        start = i
      }
      while (i < end && value(i) != '<' && value(i) != ',') i += 1
      if (i < end && value(i) == '<') {
        i += 1
        start = i
        while (i < end && value(i) != '>') i += 1
      }
      if (i > start) out += value.substring(start, i).toLowerCase
      while (i < end && value(i) != ',') i += 1
      if (i < end && value(i) == ',') i += 1
    }
    out.result()
  }

  /** RFC 2047 encoded-word decoding with the reference's exact semantics
    * (smtp.c:214-341): plain segments are CP1252→UTF-8; `=?cs?B|Q?..?=`
    * tokens are decoded then converted (gb2312→GBK, ks_c_5601-1987→
    * CP949 aliases as smtp_gformat maps them); a single space between
    * "?=" and "=?" is dropped; any malformed token or failed conversion
    * returns the raw string; bytes that fail final UTF-8 validation
    * yield "Error Decoding".
    */
  def decodeEncodedWords(raw: String): String = {
    val bytesOut = new java.io.ByteArrayOutputStream()
    def strict(name: String) =
      java.nio.charset.Charset.forName(name).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    def convert(segment: Array[Byte], cs: String): Option[Array[Byte]] = {
      val name = cs.toLowerCase match {
        case "ks_c_5601-1987" => "x-windows-949" // CP949 (smtp_gformat)
        case "gb2312"         => "GBK"           // CP936
        case other            => other
      }
      try Some(strict(name).decode(java.nio.ByteBuffer.wrap(segment))
        .toString.getBytes(StandardCharsets.UTF_8))
      catch { case _: Exception => None }
    }
    def qDecode(text: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      var done = false
      while (i < text.length && !done) {
        text(i) match {
          case '=' if i + 2 < text.length && text(i + 1) != '\n' =>
            val hi = Character.digit(text(i + 1), 16)
            val lo = Character.digit(text(i + 2), 16)
            out.write(if (hi >= 0 && lo >= 0) (hi << 4) | lo else 0)
            i += 3
          case '=' => done = true
          case '_' => out.write(' '); i += 1
          case c   => out.write(c.toInt & 0xff); i += 1
        }
      }
      out.toByteArray
    }
    var i = 0
    val n = raw.length
    while (i < n) {
      val start = raw.indexOf("=?", i)
      if (start < 0 || start != i) {
        // plain text (all of it, or the run before the next token);
        // a single joining space before "=?" is dropped
        val segEnd = if (start < 0) n else start
        val skip = if (start == i + 1 && raw(i) == ' ') 1 else 0
        val seg = raw.substring(i + skip, segEnd)
          .getBytes(StandardCharsets.ISO_8859_1)
        convert(seg, "windows-1252") match {
          case Some(b) => bytesOut.write(b)
          case None    => return raw
        }
        i = segEnd
      } else {
        val q = raw.indexOf('?', start + 2)
        if (q < 0 || n - q < 5) return raw
        val endQ = raw.indexOf("?=", q + 3)
        if (endQ < 0) return raw
        val cs = raw.substring(start + 2, q)
        val enc = raw(q + 1)
        val text = raw.substring(q + 3, endQ)
        if (text.nonEmpty) {
          val decoded: Array[Byte] = enc match {
            case 'B' | 'b' => b64BestEffort(text)
            case 'Q' | 'q' => qDecode(text)
            case _         => return raw
          }
          if (cs.equalsIgnoreCase("utf-8")) bytesOut.write(decoded)
          else convert(decoded, cs) match {
            case Some(b) => bytesOut.write(b)
            case None    => return raw
          }
        }
        i = endQ + 2
      }
    }
    try strict("UTF-8").decode(java.nio.ByteBuffer.wrap(bytesOut.toByteArray))
      .toString
    catch { case _: Exception => "Error Decoding" }
  }

  /** Best-effort base64, mirroring glib's g_base64_decode_inplace (which
    * the reference calls for B-encoded words and which never fails):
    * characters outside the base64 alphabet — including '=' padding —
    * are skipped, and any trailing partial group is dropped, so malformed
    * input decodes to (possibly garbage) bytes rather than erroring out
    * to the raw header.
    */
  private def b64BestEffort(text: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(text.length)
    var acc = 0
    var bits = 0
    var k = 0
    while (k < text.length) {
      val c = text.charAt(k)
      val v =
        if (c >= 'A' && c <= 'Z') c - 'A'
        else if (c >= 'a' && c <= 'z') c - 'a' + 26
        else if (c >= '0' && c <= '9') c - '0' + 52
        else if (c == '+') 62
        else if (c == '/') 63
        else -1
      if (v >= 0) {
        acc = (acc << 6) | v
        bits += 6
        if (bits >= 8) { bits -= 8; out.write((acc >> bits) & 0xff) }
      }
      k += 1
    }
    out.toByteArray
  }

  /** SMTP classification (smtp.c:884-897): exact-case `HELO ` / `EHLO `
    * (with the trailing space) on either direction, or a `220 ` banner
    * carrying "SMTP" anywhere in it — so a server-banner-only capture
    * still tags; a lowercase `helo` does not.
    */
  def isSmtp(srcStream: Array[Byte], dstStream: Array[Byte]): Boolean = {
    def hit(b: Array[Byte]): Boolean =
      b.length >= 5 && {
        val h = new String(b, 0, 5, StandardCharsets.ISO_8859_1)
        h == "HELO " || h == "EHLO " ||
          (h.startsWith("220 ") &&
            new String(b, 0, math.min(b.length, 512),
              StandardCharsets.ISO_8859_1).contains("SMTP"))
      }
    hit(srcStream) || hit(dstStream)
  }

  /** Parse one direction's stream — a BYTE-exact transcription of the
    * reference's smtp_parser state machine (smtp.c:430-860, the EMAIL_*
    * states), differential-fuzz pinned by SmtpDifferentialFuzzSpec.
    * Consequences worth naming: lines split ONLY on '\r' (LF-only
    * transcripts never split; a final line without '\r' — and the last
    * DATA header before EOF, whose processing needs one byte beyond its
    * newline — is never processed); MIME boundary lines match loosely
    * (first char '-', second IGNORED, compare at offset 2, trailing
    * junk allowed — smtp.c:691-697); an unquoted boundary=b; charset=x
    * keeps the params (remove_matching cuts at '"' or line END) and so
    * never matches a part line; BDAT counts raw bytes (atoi(arg)+1,
    * one per byte — smtp.c:845-852) and "." is data inside a BDAT
    * chunk; AUTH credential lines base64-decode IN PLACE without
    * truncating the line buffer, so the following command line appends
    * to the decoded garbage and is swallowed (smtp.c:529-555); base64
    * content decodes per line with 6-bit state carried across lines,
    * digests emit only at the part's CLOSING boundary, and lines of
    * 20000+ chars skip the decode but keep the state (smtp.c:721-737).
    */
  def parse(srcStream: Array[Byte]): Option[SmtpInfo] = {
    import scala.collection.mutable.ArrayBuffer
    val hello = ArrayBuffer[String]()
    val src = ArrayBuffer[String]()
    val dst = ArrayBuffer[String]()
    val subject = ArrayBuffer[String]()
    val contentType = ArrayBuffer[String]()
    val mimeVersion = ArrayBuffer[String]()
    val headerNames = ArrayBuffer[String]()
    val user = ArrayBuffer[String]()
    val msgId = ArrayBuffer[String]()
    val relayHosts = Seq.newBuilder[String]
    val relayIps = Seq.newBuilder[String]
    val mailUa = ArrayBuffer[String]()
    val hdrField = ArrayBuffer[String]()
    val hdrValue = ArrayBuffer[String]()
    val hdrTrace = ArrayBuffer[String]()
    val partMd5 = ArrayBuffer[String]()
    val partSha = ArrayBuffer[String]()
    val partFilename = ArrayBuffer[String]()
    val partMagic = ArrayBuffer[String]()
    val sessionTags = ArrayBuffer[String]()

    // EMAIL_* states (smtp.c:68-90; order matters: '\r' does (*state)++)
    val Cmd = 0; val CmdReturn = 1
    val AuthLogin = 2; val AuthLoginReturn = 3
    val AuthPlain = 4; val AuthPlainReturn = 5
    val DataHeader = 6; val DataHeaderReturn = 7; val DataHeaderDone = 8
    val Data = 9; val DataReturn = 10
    val Ignore = 11
    val Mime = 15; val MimeReturn = 16; val MimeDone = 17
    val MimeData = 18; val MimeDataReturn = 19

    var state = Cmd
    val line = new StringBuilder // GString: in-place decode keeps length
    var seenHeaders = false
    var inBDAT = false
    var bdatRemaining = 0L
    var base64Part = false
    var firstInContent = false
    var b64acc = 0
    var b64bits = 0
    var md: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    var sh: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
    var boundaries: List[String] = Nil
    var stopped = false

    def b64val(c: Char): Int =
      if (c >= 'A' && c <= 'Z') c - 'A'
      else if (c >= 'a' && c <= 'z') c - 'a' + 26
      else if (c >= '0' && c <= '9') c - '0' + 52
      else if (c == '+') 62
      else if (c == '/') 63
      else -1

    // g_base64_decode_inplace: rewrite the line's PREFIX with decoded
    // bytes; GString length is NOT updated (the reference never
    // truncates after an AUTH decode — the tail stays)
    def decodeInplace(from: Int): Int = {
      var acc = 0; var bits = 0; var w = from
      var i = from
      while (i < line.length) {
        val v = b64val(line.charAt(i))
        if (v >= 0) {
          acc = (acc << 6) | v; bits += 6
          if (bits >= 8) {
            bits -= 8
            line.setCharAt(w, ((acc >> bits) & 0xff).toChar)
            w += 1
          }
        }
        i += 1
      }
      w - from
    }
    def strlenAt(from: Int, limit: Int): Int = {
      var i = from
      while (i < limit && line.charAt(i) != 0) i += 1
      i - from
    }
    // AUTH LOGIN: decoded prefix is the user; AUTH PLAIN: authzid NUL
    // authcid NUL password, strlen-gated (smtp.c:529-555)
    def addAuthUser(from: Int, plain: Boolean): Unit = {
      val outLen = if (line.length - from > 1) decodeInplace(from) else 0
      if (!plain) {
        if (outLen > 0)
          user += line.substring(from, from + outLen)
            .toLowerCase(java.util.Locale.ROOT)
      } else {
        val zation = strlenAt(from, from + outLen)
        if (zation < outLen) {
          val cation = strlenAt(from + zation + 1, from + outLen)
          if (cation + zation + 1 < outLen) {
            val u = line.substring(from + zation + 1,
              from + zation + 1 + cation)
            if (u.nonEmpty) user += u.toLowerCase(java.util.Locale.ROOT)
          }
        }
      }
    }
    def atoiC(s: String): Int = SmtpParser.atoiC(s)
    def addBoundary(sFrom: String): Unit = {
      val i = sFrom.toLowerCase(java.util.Locale.ROOT).indexOf("boundary=")
      if (i >= 0)
        boundaries = boundaries :+ removeMatching(sFrom.substring(i + 9), '"', '"')
    }
    def isBoundaryLine(s: String): Boolean =
      s.nonEmpty && s.charAt(0) == '-' && boundaries.exists(b =>
        s.length >= b.length + 2 && s.regionMatches(2, b, 0, b.length))
    def hitBoundary(): Unit = {
      // emit the previous base64 part's digests (smtp.c:700-716)
      if (base64Part) {
        partMd5 += Hex.hex(md.digest())
        partSha += Hex.hex(sh.digest())
      }
      firstInContent = true
      base64Part = false
      b64acc = 0; b64bits = 0
      md = java.security.MessageDigest.getInstance("MD5")
      sh = java.security.MessageDigest.getInstance("SHA-256")
      state = Mime
    }
    def decodeStep(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        val v = b64val(s.charAt(i))
        if (v >= 0) {
          b64acc = (b64acc << 6) | v; b64bits += 6
          if (b64bits >= 8) {
            b64bits -= 8
            out.write((b64acc >> b64bits) & 0xff)
          }
        }
        i += 1
      }
      out.toByteArray
    }

    def cmdReturn(): Unit = {
      val s = line.toString
      val u = s.toUpperCase(java.util.Locale.ROOT)
      if (u.startsWith("MAIL FROM:")) {
        state = Cmd
        src += removeMatching(s.substring(10), '<', '>')
          .toLowerCase(java.util.Locale.ROOT)
      } else if (u.startsWith("RCPT TO:")) {
        state = Cmd
        dst += removeMatching(s.substring(8), '<', '>')
          .toLowerCase(java.util.Locale.ROOT)
      } else if (u.startsWith("DATA")) {
        state = DataHeader
        seenHeaders = true
      } else if (u.startsWith("BDAT")) {
        inBDAT = true
        // guint bdatRemaining = atoi(arg) + 1 (smtp.c:471): the +1 wraps
        // in int, then converts to unsigned 32-bit — "2147483647"
        // declares a 2^31-byte chunk, strtol-overflow inputs declare 0
        bdatRemaining =
          (atoiC(if (s.length > 5) s.substring(5) else "") + 1).toLong &
            0xFFFFFFFFL
        if (seenHeaders) state = Data
        else { seenHeaders = true; state = DataHeader }
      } else if (u.startsWith("AUTH LOGIN")) {
        sessionTags += "smtp:authlogin"
        if (line.length > 11) { addAuthUser(11, plain = false); state = Cmd }
        else state = AuthLogin
      } else if (u.startsWith("AUTH PLAIN")) {
        sessionTags += "smtp:authplain"
        if (line.length > 11) { addAuthUser(11, plain = true); state = Cmd }
        else state = AuthPlain
      } else if (u.startsWith("STARTTLS")) {
        sessionTags += "smtp:starttls"
        state = Ignore
        stopped = true // rest of the direction re-classifies (TLS)
      } else if (u.startsWith("HELO ") || u.startsWith("EHLO ")) {
        hello += s.substring(5).toLowerCase(java.util.Locale.ROOT)
        state = Cmd
      } else state = Cmd
    }

    // EMAIL_DATA_HEADER_DONE (smtp.c:581-670): one complete unfolded
    // header line
    def headerDone(): Unit = {
      val s = line.toString
      val colon = s.indexOf(':')
      if (colon < 0) return
      val lower = s.substring(0, colon).toLowerCase(java.util.Locale.ROOT)
      headerNames += lower
      val value = s.substring(colon + 1)
      lower match {
        case "subject" =>
          // after "Subject:", exactly one leading space is consumed;
          // its absence tags the session (smtp.c:606-611)
          if (s.length <= 8 || s.charAt(8) != ' ') {
            sessionTags += "smtp:missing-subject-space"
            subject += decodeEncodedWords(s.substring(8)).take(4095)
          } else subject += decodeEncodedWords(s.substring(9)).take(4095)
        case "to" | "cc" => dst ++= parseAddresses(value)
        case "from"      => src ++= parseAddresses(value)
        case "message-id" => msgId += removeMatching(value, '<', '>')
        case "received"  => parseReceived(value, relayHosts, relayIps)
        case "content-type" =>
          // value read from str+13 with isspace skip (smtp.c:615-626)
          val v = s.substring(13).dropWhile(isspaceC)
          contentType += v
          addBoundary(v)
        case "mime-version" => mimeVersion += value.dropWhile(isspaceC)
        case "x-mailer" | "user-agent" => mailUa += value.dropWhile(isspaceC)
        // config.test.ini smtpIpHeaders (colon stripped by
        // config.c:453-463; smtp.c:639-648 reads past name+colon)
        case "x-originating-ip" | "x-barracuda-apparent-source-ip" =>
          relayIps += removeMatching(value, '[', ']')
        // [headers-email]: x-elnk-trace keeps its value (lotermfield →
        // lowered), x-priority is consumed into an int field no golden
        // exercises — both are excluded from headerField/Value
        case "x-elnk-trace" =>
          hdrTrace += value.dropWhile(isspaceC)
            .toLowerCase(java.util.Locale.ROOT)
        case "x-priority" =>
        case other =>
          // parseSMTPHeaderAll (smtp.c:651-655): name + raw value, only
          // leading whitespace stripped (value may be empty)
          hdrField += other
          hdrValue += value.dropWhile(isspaceC)
      }
    }

    // EMAIL_MIME_DONE (smtp.c:801-840)
    def mimeDone(): Unit = {
      val s = line.toString
      val lower = s.toLowerCase(java.util.Locale.ROOT)
      if (lower.startsWith("content-type:")) {
        addBoundary(s.substring(13).dropWhile(isspaceC))
      } else if (lower.startsWith("content-disposition:")) {
        // the reference reads from +13 here too (a copy of the
        // content-type offset, smtp.c:822) — memcasestr still finds
        // filename= in the remainder
        val v = s.substring(13).dropWhile(isspaceC)
        val i = v.toLowerCase(java.util.Locale.ROOT).indexOf("filename=")
        if (i >= 0)
          // smtp_email_add_encoded's output buffer is char[0xfff]:
          // decoded values cap at 4095 bytes (smtp.c:220)
          partFilename += decodeEncodedWords(
            removeMatching(v.substring(i + 9), '"', '"')).take(4095)
      } else if (lower.startsWith("content-transfer-encoding:")) {
        if (lower.substring(26).contains("base64")) base64Part = true
      }
    }

    val data = srcStream
    var i = 0
    while (i < data.length && !stopped) {
      val ch = (data(i) & 0xff).toChar
      var redo = true
      while (redo && !stopped) {
        redo = false
        state match {
          case 0 /*Cmd*/ | 2 /*AuthLogin*/ | 4 /*AuthPlain*/ =>
            if (ch == '\r') state += 1
            else line.append(ch)
          case 1 /*CmdReturn*/ =>
            cmdReturn()
            line.setLength(0)
            if (ch != '\n' && !stopped) redo = true
          case 3 /*AuthLoginReturn*/ =>
            addAuthUser(0, plain = false)
            state = Cmd // NO truncate (smtp.c:529-537): garbage stays
          case 5 /*AuthPlainReturn*/ =>
            addAuthUser(0, plain = true)
            state = Cmd // NO truncate
          case 6 /*DataHeader*/ =>
            if (ch == '\r') state = DataHeaderReturn
            else line.append(ch)
          case 7 /*DataHeaderReturn*/ =>
            if (line.length == 1 && line.charAt(0) == '.') state = Cmd
            else if (line.isEmpty) state = Data
            else state = DataHeaderDone
            if (ch != '\n') redo = true
          case 8 /*DataHeaderDone*/ =>
            state = DataHeader
            if (ch == ' ' || ch == '\t') line.append(' ') // fold: always ' '
            else {
              headerDone()
              line.setLength(0)
              if (ch != '\n') redo = true
            }
          case 9 /*Data*/ | 18 /*MimeData*/ =>
            if (ch == '\r') state += 1
            else line.append(ch)
          case 10 /*DataReturn*/ | 19 /*MimeDataReturn*/ =>
            val isMime = state == MimeDataReturn
            val s = line.toString
            if (!inBDAT && s == ".") state = Cmd
            else if (isBoundaryLine(s)) hitBoundary()
            else if (isMime) {
              // buf[20000] guard: oversized lines skip the decode but
              // keep the stream state (smtp.c:721-723)
              if (base64Part && s.length < 20000) {
                val b = decodeStep(s)
                md.update(b)
                sh.update(b)
                if (firstInContent) {
                  firstInContent = false
                  partMagic ++= Magic.detect(b)
                }
              }
              state = MimeData
            } else state = Data
            line.setLength(0)
            if (ch != '\n') redo = true
          case 15 /*Mime*/ =>
            if (ch == '\r') state = MimeReturn
            else line.append(ch)
          case 16 /*MimeReturn*/ =>
            if (line.isEmpty) state = MimeData
            else if (line.length == 1 && line.charAt(0) == '.') state = Cmd
            else state = MimeDone
            if (ch != '\n') redo = true
          case 17 /*MimeDone*/ =>
            state = Mime
            if (ch == ' ' || ch == '\t') line.append(ch) // fold: RAW char
            else {
              mimeDone()
              line.setLength(0)
              if (ch != '\n') redo = true
            }
          case _ => stopped = true
        }
      }
      i += 1
      // BDAT byte countdown (smtp.c:845-852): once per consumed byte;
      // guint arithmetic — a 0 count wraps to 2^32-1 and never resets
      // within a real stream
      if (inBDAT) {
        bdatRemaining = (bdatRemaining - 1) & 0xFFFFFFFFL
        if (bdatRemaining == 0) { state = Cmd; inBDAT = false }
      }
    }

    val info = SmtpInfo(
      hello = hello.toSeq.distinct,
      src = src.toSeq.distinct,
      dst = dst.toSeq.distinct,
      subject = subject.toSeq.distinct,
      contentType = contentType.toSeq.distinct,
      mimeVersion = mimeVersion.toSeq.distinct,
      headers = headerNames.toSeq.distinct.sorted,
      user = user.toSeq.distinct,
      id = msgId.toSeq.distinct,
      host = relayHosts.result().distinct,
      ip = relayIps.result().flatMap(normalizeMailIp).distinct,
      useragent = mailUa.toSeq.distinct,
      headerField = hdrField.toSeq.distinct,
      // STR_ARRAY with FLAG_CNT - duplicates survive (smtp.c:1038-1041)
      headerValue = hdrValue.toSeq,
      headerTrace = hdrTrace.toSeq.distinct,
      md5 = partMd5.toSeq.distinct,
      sha256 = partSha.toSeq.distinct,
      filename = partFilename.toSeq.distinct,
      bodyMagic = partMagic.toSeq.distinct,
      tags = sessionTags.toSeq.distinct)
    // None only when NOTHING was extracted: the reference records any
    // parsed field on a classified session (e.g. an AUTH user + tag on
    // a stream whose classification came from the server's 220 banner —
    // mutation-fuzz pinned); the gate only suppresses the all-empty case
    if (info.hello.isEmpty && info.src.isEmpty && info.subject.isEmpty &&
      info.dst.isEmpty && info.user.isEmpty && info.tags.isEmpty &&
      info.headers.isEmpty && info.contentType.isEmpty &&
      info.id.isEmpty && info.host.isEmpty && info.ip.isEmpty &&
      info.md5.isEmpty && info.filename.isEmpty &&
      info.headerField.isEmpty && info.useragent.isEmpty &&
      info.mimeVersion.isEmpty && info.headerTrace.isEmpty) None
    else Some(info)
  }
}
