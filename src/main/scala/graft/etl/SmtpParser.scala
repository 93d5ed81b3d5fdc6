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

  // empty <> allowed: the null reverse-path "MAIL FROM:<>" records an
  // empty src, as smtp_remove_matching does (wireshark-bdat golden)
  private val addrRe = "<([^>]*)>".r

  private def addr(line: String): Option[String] =
    addrRe.findFirstMatchIn(line).map(_.group(1))
      .orElse(line.split(":", 2).lift(1).map(_.trim).filter(_.contains("@")))
      .map(_.toLowerCase) // envelope adds are _add_lower (smtp.c:462-465)

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

  def parse(srcStream: Array[Byte]): Option[SmtpInfo] = {
    val text = new String(srcStream, StandardCharsets.ISO_8859_1)
    val lines = text.split("\r?\n")
    val hello = Seq.newBuilder[String]
    val src = Seq.newBuilder[String]
    val dst = Seq.newBuilder[String]
    var inData = false
    var authState = 0 // 1 = next client line is the AUTH LOGIN username
    val user = Seq.newBuilder[String]
    def b64user(v: String, plain: Boolean): Unit =
      try {
        val d = new String(java.util.Base64.getDecoder.decode(v.trim),
          StandardCharsets.ISO_8859_1)
        // PLAIN = authzid \0 authcid \0 password; the user is the
        // AUTHCID — the field after the first NUL — even when an
        // authzid is present (smtp.c:536-548)
        val u = if (plain) {
          val i = d.indexOf(0)
          if (i < 0) None
          else {
            val rest = d.substring(i + 1)
            val j = rest.indexOf(0)
            Some(if (j >= 0) rest.substring(0, j) else rest)
          }
        } else Some(d)
        u.filter(_.nonEmpty).foreach(x => user += x.toLowerCase)
      } catch { case _: IllegalArgumentException => }
    val headerNames = Seq.newBuilder[String]
    val hdrField = Seq.newBuilder[String]
    val hdrValue = Seq.newBuilder[String]
    val hdrTrace = Seq.newBuilder[String]
    val sessionTags = Seq.newBuilder[String]
    val subject = Seq.newBuilder[String]
    val contentType = Seq.newBuilder[String]
    val mimeVersion = Seq.newBuilder[String]
    val msgId = Seq.newBuilder[String]
    val relayHosts = Seq.newBuilder[String]
    val relayIps = Seq.newBuilder[String]
    val mailUa = Seq.newBuilder[String]
    def stripMatching(v0: String, open: Char, close: Char): String = {
      val v = v0.dropWhile(_.isWhitespace)
      if (v.startsWith(open.toString) && v.endsWith(close.toString) && v.length >= 2)
        v.substring(1, v.length - 1)
      else v
    }
    var headerSection = false
    var pendingHeader: String = null
    // ---- MIME part machinery (smtp.c EMAIL_MIME* states) -------------
    var boundaryList: List[String] = Nil
    def addBoundary(v: String): Unit = {
      val i = v.toLowerCase.indexOf("boundary=")
      if (i >= 0) {
        // a quoted boundary may be followed by further parameters
        // (boundary="b"; charset=...): cut the parameter FIRST, then
        // strip the quotes — the reverse order kept the quotes and the
        // boundary never matched any part line
        val raw = v.substring(i + 9)
        val b =
          if (raw.startsWith("\"")) {
            val close = raw.indexOf('"', 1)
            if (close > 0) raw.substring(1, close)
            else stripMatching(raw, '"', '"').takeWhile(_ != ';')
          } else raw.takeWhile(_ != ';')
        boundaryList = boundaryList :+ b
      }
    }
    val partMd5 = Seq.newBuilder[String]
    val partSha = Seq.newBuilder[String]
    val partFilename = Seq.newBuilder[String]
    val partMagic = Seq.newBuilder[String]
    var inPartHeaders = false
    var base64Part = false
    var firstInContent = false
    var md: java.security.MessageDigest = null
    var sh: java.security.MessageDigest = null
    // glib g_base64_decode_step equivalent: 6-bit accumulator surviving
    // across lines, non-alphabet bytes skipped
    var b64acc = 0
    var b64bits = 0
    def b64val(c: Char): Int = c match {
      case c if c >= 'A' && c <= 'Z' => c - 'A'
      case c if c >= 'a' && c <= 'z' => c - 'a' + 26
      case c if c >= '0' && c <= '9' => c - '0' + 52
      case '+' => 62
      case '/' => 63
      case _ => -1
    }
    def decodeLine(line: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      line.foreach { c =>
        val v = b64val(c)
        if (v >= 0) {
          b64acc = (b64acc << 6) | v
          b64bits += 6
          if (b64bits >= 8) {
            b64bits -= 8
            out.write((b64acc >> b64bits) & 0xff)
          }
        }
      }
      out.toByteArray
    }
    def isBoundaryLine(line: String): Boolean =
      line.nonEmpty && line.charAt(0) == '-' &&
        boundaryList.exists(b => line.length >= b.length + 2 &&
          line.substring(2).startsWith(b))
    def closePart(): Unit = {
      if (base64Part && md != null) {
        partMd5 += Hex.hex(md.digest())
        partSha += Hex.hex(sh.digest())
      }
      base64Part = false
      firstInContent = true
      md = null; sh = null
      b64acc = 0; b64bits = 0
    }
    var pendingPartHeader: String = null
    def processPartHeader(h: String): Unit = {
      val lower = h.toLowerCase
      if (lower.startsWith("content-type:")) addBoundary(h)
      else if (lower.startsWith("content-disposition:")) {
        val i = lower.indexOf("filename=")
        if (i >= 0)
          // smtp_email_add_encoded's output buffer is char[0xfff]:
          // decoded values cap at 4095 bytes (smtp.c:220)
          partFilename += decodeEncodedWords(
            stripMatching(h.substring(i + 9), '"', '"')).take(4095)
      } else if (lower.startsWith("content-transfer-encoding:")) {
        if (lower.substring(26).contains("base64")) base64Part = true
      }
    }
    // unfold first (smtp.c:585-587 joins continuation lines with one
    // ' ', consuming the continuation's first whitespace char), THEN
    // process the complete logical header line
    def processHeader(h: String): Unit = if (h.contains(":")) {
      val name = h.takeWhile(_ != ':')
      val value = h.substring(name.length + 1)
      headerNames += name.toLowerCase
      name.toLowerCase match {
        case "subject" =>
          // after "Subject:", exactly one leading space is consumed
          // (smtp.c:606-611); the rest goes through RFC 2047 decode
          subject += decodeEncodedWords(
            if (value.startsWith(" ")) value.substring(1) else value)
            .take(4095)
        case "from"         => src ++= parseAddresses(value)
        case "to" | "cc"    => dst ++= parseAddresses(value)
        case "content-type" =>
          contentType += value.trim
          addBoundary(value)
        case "mime-version" => mimeVersion += value.trim
        case "message-id"   => msgId += stripMatching(value, '<', '>')
        case "received"     => parseReceived(value, relayHosts, relayIps)
        case "x-mailer" | "user-agent" => mailUa += value.trim
        // config.test.ini smtpIpHeaders (smtp.c:639-648)
        case "x-originating-ip" | "x-barracuda-apparent-source-ip" =>
          relayIps += stripMatching(value, '[', ']')
        // [headers-email]: x-elnk-trace keeps its value (lotermfield →
        // lowered), x-priority is consumed into an int field no golden
        // exercises — both are excluded from headerField/Value
        case "x-elnk-trace" => hdrTrace += value.trim.toLowerCase
        case "x-priority"   =>
        case other          =>
          // parseSMTPHeaderAll (smtp.c:651-655): name + raw value, only
          // leading whitespace stripped (value may be empty)
          hdrField += other
          hdrValue += value.dropWhile(c => c == ' ' || c == '\t')
      }
    }
    lines.foreach { line =>
      val u = line.toUpperCase
      if (!inData) {
        if (authState == 1) { b64user(line, plain = false); authState = 0 }
        else if (authState == 2) { b64user(line, plain = true); authState = 0 }
        else if (u.startsWith("AUTH LOGIN")) {
          sessionTags += "smtp:authlogin"
          // inline initial-response or username on the next line
          val arg = line.substring(10).trim
          if (arg.nonEmpty) b64user(arg, plain = false) else authState = 1
        } else if (u.startsWith("AUTH PLAIN")) {
          sessionTags += "smtp:authplain"
          val arg = line.substring(10).trim
          if (arg.nonEmpty) b64user(arg, plain = true) else authState = 2
        } else if (u.startsWith("STARTTLS")) {
          sessionTags += "smtp:starttls"
        } else if (u.startsWith("HELO ") || u.startsWith("EHLO "))
          hello += line.substring(5).trim.toLowerCase
        else if (u.startsWith("MAIL FROM")) addr(line).foreach(src += _)
        else if (u.startsWith("RCPT TO")) addr(line).foreach(dst += _)
        // BDAT (CHUNKING, RFC 3030) carries the message just like DATA
        else if (u == "DATA" || u.startsWith("BDAT ")) {
          inData = true; headerSection = true
        }
      } else if (headerSection) {
        if (line.isEmpty) { // blank line ends headers
          Option(pendingHeader).foreach(processHeader)
          pendingHeader = null
          headerSection = false
        } else if (line.startsWith(" ") || line.startsWith("\t")) {
          if (pendingHeader != null)
            pendingHeader = pendingHeader + " " + line.substring(1)
        } else {
          Option(pendingHeader).foreach(processHeader)
          pendingHeader = line
        }
      } else if (inPartHeaders) {
        if (line == ".") {
          Option(pendingPartHeader).foreach(processPartHeader)
          pendingPartHeader = null
          inPartHeaders = false; inData = false
        } else if (line.isEmpty) {
          Option(pendingPartHeader).foreach(processPartHeader)
          pendingPartHeader = null
          inPartHeaders = false
          if (base64Part) {
            md = java.security.MessageDigest.getInstance("MD5")
            sh = java.security.MessageDigest.getInstance("SHA-256")
          }
        } else if (line.startsWith(" ") || line.startsWith("	")) {
          if (pendingPartHeader != null)
            pendingPartHeader = pendingPartHeader + line
        } else {
          Option(pendingPartHeader).foreach(processPartHeader)
          pendingPartHeader = line
        }
      } else if (line == ".") { // end of DATA; another message may follow
        closePart()
        inData = false
      } else if (isBoundaryLine(line)) {
        closePart()
        inPartHeaders = true
      } else if (base64Part && md != null) {
        val decoded = decodeLine(line)
        if (decoded.nonEmpty) {
          md.update(decoded)
          sh.update(decoded)
          if (firstInContent) {
            firstInContent = false
            partMagic ++= Magic.detect(decoded)
          }
        }
      }
    }
    Option(pendingHeader).foreach(processHeader)
    val info = SmtpInfo(
      hello = hello.result().distinct,
      src = src.result().distinct,
      dst = dst.result().distinct,
      subject = subject.result().distinct,
      contentType = contentType.result().distinct,
      mimeVersion = mimeVersion.result().distinct,
      headers = headerNames.result().distinct.sorted,
      user = user.result().distinct,
      id = msgId.result().distinct,
      host = relayHosts.result().distinct,
      ip = relayIps.result().flatMap(normalizeMailIp).distinct,
      useragent = mailUa.result().distinct,
      headerField = hdrField.result().distinct,
      // STR_ARRAY with FLAG_CNT - duplicates survive (smtp.c:1038-1041)
      headerValue = hdrValue.result(),
      headerTrace = hdrTrace.result().distinct,
      md5 = partMd5.result().distinct,
      sha256 = partSha.result().distinct,
      filename = partFilename.result().distinct,
      bodyMagic = partMagic.result().distinct,
      tags = sessionTags.result().distinct)
    if (info.hello.isEmpty && info.src.isEmpty && info.subject.isEmpty) None
    else Some(info)
  }
}
