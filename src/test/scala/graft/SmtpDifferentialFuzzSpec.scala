package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SmtpParser

/** Differential fuzz of the SMTP/email extractor against an independent
  * BYTE-exact transcription of the reference's state machine
  * (capture/parsers/smtp.c smtp_parser, the EMAIL_* states at
  * smtp.c:430-860). Our production parser is line-oriented; the
  * reference is a per-byte machine with '\r'-driven transitions and
  * `if (*data != '\n') continue` reprocessing — this spec walks crafted
  * transcripts through both and compares the extracted field surface.
  *
  * Reference quirks the model transcribes (and the generator aims at):
  *  - lines split ONLY on '\r' (a bare '\n' is appended to the line
  *    buffer — LF-only transcripts never split), and a final line
  *    without '\r' is never processed;
  *  - MIME boundary lines match `--` loosely: first char '-', second
  *    char IGNORED, compare at offset 2, trailing junk allowed
  *    (smtp.c:691-697);
  *  - remove_matching cuts at the closing char OR line end — an
  *    unquoted `boundary=b; charset=x` keeps `b; charset=x` whole
  *    (smtp.c:93-108);
  *  - BDAT counts raw BYTES (atoi(arg)+1, decremented once per byte
  *    after state processing — smtp.c:845-852), and "." does not end
  *    BDAT data;
  *  - AUTH LOGIN/PLAIN credential lines base64-decode IN PLACE without
  *    truncating the line buffer (smtp.c:529-555): the next command
  *    line appends to the decoded garbage and is effectively swallowed;
  *  - base64 content decodes with g_base64_decode_step per line (6-bit
  *    state across lines, invalid bytes skipped), digests emit only at
  *    the part's CLOSING boundary, and lines ≥ 20000 chars skip the
  *    decode but keep the state (smtp.c:721-737).
  *
  * Scope: single direction (the client stream), like
  * SmtpParser.parse — the cross-direction smtp:statuscode tagging lives
  * in SessionBuilder and needs packet interleaving. CONNECT-style
  * STARTTLS stops the walk on both sides. x-priority (int field) and
  * sha256/bodyMagic (derived from the same bytes as md5/magic) are not
  * compared. Value-level helpers with their own golden/roundtrip
  * pinning (RFC 2047 decode, address/Received walks, inet_aton) are
  * REUSED by the model — this fuzz targets the state machine.
  */
class SmtpDifferentialFuzzSpec extends AnyFunSuite {

  private def isspaceC(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' ||
      c == '\r'

  /** smtp_remove_matching (smtp.c:93-108): leading isspace skip, one
    * optional opening char, cut at the closing char or string end.
    */
  private def removeMatchingC(s: String, open: Char, close: Char): String = {
    var i = 0
    while (i < s.length && isspaceC(s.charAt(i))) i += 1
    if (i < s.length && s.charAt(i) == open) i += 1
    val start = i
    while (i < s.length && s.charAt(i) != close) i += 1
    s.substring(start, i)
  }

  /** glibc atoi = (int)strtol: strtol clamps to LONG_MAX/LONG_MIN on
    * overflow, then the int cast truncates to the low 32 bits —
    * "9999999999" reads 1410065407, >LONG_MAX digits read -1.
    */
  private def atoiC(s: String): Int = {
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
    (if (over) { if (neg) Long.MinValue else Long.MaxValue }
    else if (neg) -v
    else v).toInt
  }

  // EMAIL_* states (smtp.c:68-90, order matters for the (*state)++ trick)
  private object E {
    val Cmd = 0; val CmdReturn = 1
    val AuthLogin = 2; val AuthLoginReturn = 3
    val AuthPlain = 4; val AuthPlainReturn = 5
    val DataHeader = 6; val DataHeaderReturn = 7; val DataHeaderDone = 8
    val Data = 9; val DataReturn = 10
    val Ignore = 11
    val TlsOk = 12; val TlsOkReturn = 13; val Tls = 14
    val Mime = 15; val MimeReturn = 16; val MimeDone = 17
    val MimeData = 18; val MimeDataReturn = 19
  }

  /** The model: one direction of smtp_parser + the field adds. */
  private final class RefSmtp {
    import scala.collection.mutable.ArrayBuffer
    val hello = ArrayBuffer[String]()
    val src = ArrayBuffer[String]()
    val dst = ArrayBuffer[String]()
    val subject = ArrayBuffer[String]()
    val contentType = ArrayBuffer[String]()
    val mimeVersion = ArrayBuffer[String]()
    val headerNames = ArrayBuffer[String]()
    val user = ArrayBuffer[String]()
    val id = ArrayBuffer[String]()
    val hostsB = Seq.newBuilder[String]
    val ipsB = Seq.newBuilder[String]
    val ua = ArrayBuffer[String]()
    val hdrField = ArrayBuffer[String]()
    val hdrValue = ArrayBuffer[String]()
    val hdrTrace = ArrayBuffer[String]()
    val md5s = ArrayBuffer[String]()
    val filenames = ArrayBuffer[String]()
    val tags = ArrayBuffer[String]()

    private var state = E.Cmd
    // GString line — decode-in-place needs a mutable char buffer
    private val line = new StringBuilder
    private var seenHeaders = false
    private var inBDAT = false
    private var bdatRemaining = 0L
    private var base64 = false
    private var firstInContent = false
    private var b64acc = 0
    private var b64bits = 0
    private var md: java.security.MessageDigest = null
    private val boundaries = ArrayBuffer[String]()
    private var stopped = false

    private def b64val(c: Char): Int = c match {
      case c if c >= 'A' && c <= 'Z' => c - 'A'
      case c if c >= 'a' && c <= 'z' => c - 'a' + 26
      case c if c >= '0' && c <= '9' => c - '0' + 52
      case '+' => 62
      case '/' => 63
      case _ => -1
    }

    /** g_base64_decode_inplace: rewrite the line's PREFIX with the
      * decoded bytes, length unchanged; returns decoded count.
      */
    private def decodeInplace(from: Int): Int = {
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

    /** strlen over the line buffer from `from` (NUL-terminated reads). */
    private def strlenAt(from: Int, limit: Int): Int = {
      var i = from
      while (i < limit && line.charAt(i) != 0) i += 1
      i - from
    }

    private def addAuthUser(from: Int, plain: Boolean): Unit = {
      val outLen = if (line.length - from > 1) decodeInplace(from) else 0
      if (!plain) {
        if (outLen > 0)
          user += line.substring(from, from + outLen)
            .toLowerCase(java.util.Locale.ROOT)
      } else {
        // authzid NUL authcid NUL password; gates transcribed from
        // smtp.c:536-548 (strlen-based, strict `<` comparisons)
        val zation = strlenAt(from, from + outLen)
        if (zation < outLen) {
          val cation = strlenAt(from + zation + 1, from + outLen)
          if (cation + zation + 1 < outLen)
            user += line.substring(from + zation + 1,
              from + zation + 1 + cation).toLowerCase(java.util.Locale.ROOT)
        }
      }
    }

    private def cmdReturn(): Unit = {
      val s = line.toString
      val u = s.toUpperCase(java.util.Locale.ROOT)
      if (u.startsWith("MAIL FROM:")) {
        state = E.Cmd
        src += removeMatchingC(s.substring(10), '<', '>')
          .toLowerCase(java.util.Locale.ROOT)
      } else if (u.startsWith("RCPT TO:")) {
        state = E.Cmd
        dst += removeMatchingC(s.substring(8), '<', '>')
          .toLowerCase(java.util.Locale.ROOT)
      } else if (u.startsWith("DATA")) {
        state = E.DataHeader
        seenHeaders = true
      } else if (u.startsWith("BDAT")) {
        inBDAT = true
        // guint bdatRemaining = atoi(arg) + 1 (smtp.c:471): int wrap on
        // +1, then the unsigned 32-bit conversion
        bdatRemaining =
          (atoiC(if (s.length > 5) s.substring(5) else "") + 1).toLong &
            0xFFFFFFFFL
        if (seenHeaders) state = E.Data
        else { seenHeaders = true; state = E.DataHeader }
      } else if (u.startsWith("AUTH LOGIN")) {
        tags += "smtp:authlogin"
        if (line.length > 11) { addAuthUser(11, plain = false); state = E.Cmd }
        else state = E.AuthLogin
      } else if (u.startsWith("AUTH PLAIN")) {
        tags += "smtp:authplain"
        if (line.length > 11) { addAuthUser(11, plain = true); state = E.Cmd }
        else state = E.AuthPlain
      } else if (u.startsWith("STARTTLS")) {
        tags += "smtp:starttls"
        state = E.Ignore
        stopped = true
      } else if (u.startsWith("HELO ") || u.startsWith("EHLO ")) {
        hello += s.substring(5).toLowerCase(java.util.Locale.ROOT)
        state = E.Cmd
      } else state = E.Cmd
    }

    private def addBoundaryC(sFrom: String): Unit = {
      val i = sFrom.toLowerCase(java.util.Locale.ROOT).indexOf("boundary=")
      if (i >= 0)
        boundaries += removeMatchingC(sFrom.substring(i + 9), '"', '"')
    }

    /** EMAIL_DATA_HEADER_DONE (smtp.c:581-670). */
    private def headerDone(): Unit = {
      val s = line.toString
      val colon = s.indexOf(':')
      if (colon < 0) return
      val lower = s.substring(0, colon).toLowerCase(java.util.Locale.ROOT)
      headerNames += lower
      val cpos = colon + 1
      val value = s.substring(cpos)
      lower match {
        case "subject" =>
          if (s.length <= 8 || s.charAt(8) != ' ') {
            tags += "smtp:missing-subject-space" // smtp.c:607
            subject += SmtpParser.decodeEncodedWords(s.substring(8)).take(4095)
          } else
            subject += SmtpParser.decodeEncodedWords(s.substring(9)).take(4095)
        case "to" | "cc" => dst ++= SmtpParser.parseAddresses(value)
        case "from"      => src ++= SmtpParser.parseAddresses(value)
        case "message-id" => id += removeMatchingC(value, '<', '>')
        case "received"  => SmtpParser.parseReceived(value, hostsB, ipsB)
        case "content-type" =>
          val v = s.substring(13).dropWhile(isspaceC)
          contentType += v
          addBoundaryC(v)
        case "mime-version" => mimeVersion += value.dropWhile(isspaceC)
        case "x-mailer" | "user-agent" => ua += value.dropWhile(isspaceC)
        case "x-originating-ip" | "x-barracuda-apparent-source-ip" =>
          // smtpIpHeaders (config.c:453-463 strips the trailing colon;
          // smtp.c:639-648 then reads line->str + strlen(name) + 1)
          ipsB += removeMatchingC(value, '[', ']')
        case "x-elnk-trace" =>
          hdrTrace += value.dropWhile(isspaceC)
            .toLowerCase(java.util.Locale.ROOT)
        case "x-priority" => // int field, not compared
        case other =>
          hdrField += other
          hdrValue += value.dropWhile(isspaceC)
      }
    }

    /** EMAIL_MIME_DONE (smtp.c:801-840). */
    private def mimeDone(): Unit = {
      val s = line.toString
      val lower = s.toLowerCase(java.util.Locale.ROOT)
      if (lower.startsWith("content-type:")) {
        addBoundaryC(s.substring(13).dropWhile(isspaceC))
      } else if (lower.startsWith("content-disposition:")) {
        // the reference reads from +13 here too (smtp.c:822: a copy of
        // the content-type offset) — harmless, memcasestr still finds
        // filename= in the remainder
        val v = s.substring(13).dropWhile(isspaceC)
        val i = v.toLowerCase(java.util.Locale.ROOT).indexOf("filename=")
        if (i >= 0)
          filenames += SmtpParser.decodeEncodedWords(
            removeMatchingC(v.substring(i + 9), '"', '"')).take(4095)
      } else if (lower.startsWith("content-transfer-encoding:")) {
        if (lower.substring(26).contains("base64")) base64 = true
      }
    }

    private def isBoundaryLine(s: String): Boolean =
      s.nonEmpty && s.charAt(0) == '-' && boundaries.exists(b =>
        s.length >= b.length + 2 && s.regionMatches(2, b, 0, b.length))

    private def hitBoundary(): Unit = {
      if (base64 && md != null) {
        md5s += graft.etl.Hex.hex(md.digest())
      }
      firstInContent = true
      base64 = false
      b64acc = 0; b64bits = 0
      md = java.security.MessageDigest.getInstance("MD5")
      state = E.Mime
    }

    /** g_base64_decode_step over one line (state across lines). */
    private def decodeStep(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      s.foreach { c =>
        val v = b64val(c)
        if (v >= 0) {
          b64acc = (b64acc << 6) | v; b64bits += 6
          if (b64bits >= 8) {
            b64bits -= 8
            out.write((b64acc >> b64bits) & 0xff)
          }
        }
      }
      out.toByteArray
    }

    def feed(data: Array[Byte]): Unit = {
      var i = 0
      while (i < data.length && !stopped) {
        val ch = (data(i) & 0xff).toChar
        var redo = true
        while (redo && !stopped) {
          redo = false
          state match {
            case E.Cmd | E.AuthLogin | E.AuthPlain =>
              if (ch == '\r') state += 1
              else line.append(ch)
            case E.CmdReturn =>
              cmdReturn()
              line.setLength(0)
              if (ch != '\n' && !stopped) redo = true
            case E.AuthLoginReturn =>
              addAuthUser(0, plain = false)
              state = E.Cmd // NO truncate (smtp.c:529-537): garbage stays
            case E.AuthPlainReturn =>
              addAuthUser(0, plain = true)
              state = E.Cmd // NO truncate
            case E.DataHeader =>
              if (ch == '\r') state = E.DataHeaderReturn
              else line.append(ch)
            case E.DataHeaderReturn =>
              if (line.toString == ".") state = E.Cmd
              else if (line.isEmpty) state = E.Data
              else state = E.DataHeaderDone
              if (ch != '\n') redo = true
            case E.DataHeaderDone =>
              state = E.DataHeader
              if (ch == ' ' || ch == '\t') line.append(' ') // fold: always ' '
              else {
                headerDone()
                line.setLength(0)
                if (ch != '\n') redo = true
              }
            case E.Data | E.MimeData =>
              if (ch == '\r') state += 1
              else line.append(ch)
            case E.DataReturn | E.MimeDataReturn =>
              val isMime = state == E.MimeDataReturn
              val s = line.toString
              if (!inBDAT && s == ".") state = E.Cmd
              else {
                if (isBoundaryLine(s)) hitBoundary()
                else if (isMime) {
                  if (base64 && md != null && s.length < 20000) {
                    val b = decodeStep(s)
                    md.update(b)
                    if (firstInContent) {
                      firstInContent = false
                      // magic of the first decoded chunk — not compared
                    }
                  }
                  state = E.MimeData
                } else state = E.Data
              }
              line.setLength(0)
              if (ch != '\n') redo = true
            case E.Mime =>
              if (ch == '\r') state = E.MimeReturn
              else line.append(ch)
            case E.MimeReturn =>
              if (line.isEmpty) state = E.MimeData
              else if (line.toString == ".") state = E.Cmd
              else state = E.MimeDone
              if (ch != '\n') redo = true
            case E.MimeDone =>
              state = E.Mime
              if (ch == ' ' || ch == '\t') line.append(ch) // fold: RAW char
              else {
                mimeDone()
                line.setLength(0)
                if (ch != '\n') redo = true
              }
            case E.Ignore => stopped = true
            case _ => stopped = true
          }
        }
        i += 1
        if (inBDAT) {
          bdatRemaining = (bdatRemaining - 1) & 0xFFFFFFFFL // guint wrap
          if (bdatRemaining == 0) { state = E.Cmd; inBDAT = false }
        }
      }
    }

    def info(): SmtpParser.SmtpInfo = SmtpParser.SmtpInfo(
      hello = hello.toSeq.distinct,
      src = src.toSeq.distinct,
      dst = dst.toSeq.distinct,
      subject = subject.toSeq.distinct,
      contentType = contentType.toSeq.distinct,
      mimeVersion = mimeVersion.toSeq.distinct,
      headers = headerNames.toSeq.distinct.sorted,
      user = user.toSeq.distinct,
      id = id.toSeq.distinct,
      host = hostsB.result().distinct,
      ip = ipsB.result().flatMap(SmtpParser.normalizeMailIp).distinct,
      useragent = ua.toSeq.distinct,
      headerField = hdrField.toSeq.distinct,
      headerValue = hdrValue.toSeq,
      headerTrace = hdrTrace.toSeq.distinct,
      md5 = md5s.toSeq.distinct,
      filename = filenames.toSeq.distinct,
      tags = tags.toSeq.distinct)
  }

  // ---------------------------------------------------------------------

  private def compare(stream: Array[Byte], label: String): Unit = {
    val m = new RefSmtp
    m.feed(stream)
    val model = m.info()
    val ours = SmtpParser.parse(stream).getOrElse(
      SmtpParser.SmtpInfo(Nil, Nil, Nil, Nil, Nil, Nil, Nil))
    val checks: Seq[(String, Seq[String], Seq[String])] = Seq(
      ("hello", model.hello, ours.hello),
      ("src", model.src, ours.src),
      ("dst", model.dst, ours.dst),
      ("subject", model.subject, ours.subject),
      ("contentType", model.contentType, ours.contentType),
      ("mimeVersion", model.mimeVersion, ours.mimeVersion),
      ("headers", model.headers, ours.headers),
      ("user", model.user, ours.user),
      ("id", model.id, ours.id),
      ("host", model.host, ours.host),
      ("ip", model.ip, ours.ip),
      ("useragent", model.useragent, ours.useragent),
      ("headerField", model.headerField.sorted, ours.headerField.sorted),
      ("headerValue", model.headerValue.sorted, ours.headerValue.sorted),
      ("headerTrace", model.headerTrace, ours.headerTrace),
      ("md5", model.md5.sorted, ours.md5.sorted),
      ("filename", model.filename, ours.filename),
      ("tags", model.tags.sorted, ours.tags.sorted))
    val diffs = checks.filter { case (_, a, b) => a != b }
    assert(diffs.isEmpty,
      s"\n[$label]\n" + diffs.map { case (f, a, b) =>
        s"  $f: model=$a ours=$b"
      }.mkString("\n") + "\nstream:\n" +
        new String(stream, StandardCharsets.ISO_8859_1)
          .replace("\r", "\\r").replace("\n", "\\n\n"))
  }

  private final class Rng(var seed: Long) {
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("ISO-8859-1"))

  private def genTranscript(rng: Rng): (Array[Byte], String) = {
    val recipe = new StringBuilder
    val sb = new StringBuilder
    def crlf(): String = "\r\n"
    sb.append(s"EHLO client${rng.nextInt(40)}.example${crlf()}")
    if (rng.chance(25)) {
      rng.nextInt(3) match {
        case 0 =>
          sb.append(s"AUTH LOGIN ${b64("user" + rng.nextInt(20))}${crlf()}")
          recipe.append("authlogin-inline ")
        case 1 =>
          sb.append(s"AUTH LOGIN${crlf()}${b64("u" + rng.nextInt(20))}${crlf()}")
          recipe.append("authlogin-2step ")
        case 2 =>
          sb.append(s"AUTH PLAIN ${b64("az\u0000user" + rng.nextInt(9) + "\u0000pw")}${crlf()}")
          recipe.append("authplain ")
      }
    }
    val nMsgs = 1 + rng.nextInt(2)
    for (m <- 0 until nMsgs) {
      sb.append(s"MAIL FROM:<alice$m@a.example>${
        if (rng.chance(25)) " SIZE=1024" else ""}${crlf()}")
      sb.append(s"RCPT TO:${rng.pick(Seq("<bob@b.example>", "bob@b.example",
        " <spaced@c.example>"))}${crlf()}")
      val useBdat = rng.chance(20)
      val bodyLines = Seq.newBuilder[String]
      // headers
      bodyLines += s"From: Alice <alice$m@a.example>"
      bodyLines += rng.pick(Seq("To: bob@b.example",
        "To: \"Bob X\" <bob@b.example>, carol@c.example"))
      rng.nextInt(4) match {
        case 0 => bodyLines += s"Subject: Hello ${rng.nextInt(100)}"
        case 1 => bodyLines += s"Subject:NoSpace${rng.nextInt(10)}"
        case 2 => bodyLines += "Subject: =?utf-8?B?" + b64("Grüße") + "?="
        case 3 =>
          bodyLines += s"Subject: folded ${rng.nextInt(9)}"
          bodyLines += rng.pick(Seq(" more", "\tmore tab"))
          recipe.append("foldsubj ")
      }
      if (rng.chance(40)) bodyLines += s"Message-ID: <id$m@x>"
      if (rng.chance(40))
        bodyLines += "Received: from relay1.example ([10.0.0.9]) by mx.example"
      if (rng.chance(30)) bodyLines += s"X-Mailer: mailer/${rng.nextInt(9)}"
      if (rng.chance(30)) bodyLines += "X-Originating-IP: [10.1.2.3]"
      if (rng.chance(30)) bodyLines += s"X-Elnk-Trace: TRACE${rng.nextInt(99)}"
      if (rng.chance(40)) bodyLines += s"X-Custom-$m: val ${rng.nextInt(99)} "
      if (rng.chance(25)) { bodyLines += "X-NoValue:"; recipe.append("emptyval ") }
      bodyLines += "MIME-Version: 1.0"
      val multipart = rng.chance(55)
      val boundary = s"b${rng.nextInt(1000)}x"
      if (multipart) {
        val bSpec = rng.nextInt(3) match {
          case 0 => "boundary=\"" + boundary + "\""
          case 1 => "boundary=" + boundary
          case 2 => "boundary=\"" + boundary + "\"; charset=us-ascii"
        }
        bodyLines += s"Content-Type: multipart/mixed; $bSpec"
        recipe.append("mp ")
      } else bodyLines += "Content-Type: text/plain"
      // body
      val content = Seq.newBuilder[String]
      content += ""
      if (multipart) {
        content += "preamble text"
        // part 1: base64 attachment
        val marker = rng.nextInt(3) match {
          case 0 => s"--$boundary"
          case 1 => s"-X$boundary"   // 2nd char ignored by the reference
          case 2 => s"--${boundary}junk" // trailing junk allowed
        }
        content += marker
        content += "Content-Type: application/octet-stream"
        content += "Content-Disposition: attachment; " + rng.pick(Seq(
          s"filename=\"file$m.bin\"", s"filename=file$m.bin"))
        content += "Content-Transfer-Encoding: base64"
        content += ""
        val payload = s"payload-$m-" + ("z" * rng.nextInt(50))
        val enc = b64(payload)
        // split the base64 across 1-3 lines (decode_step state carries)
        val cut = if (enc.length > 4 && rng.chance(60)) 2 + rng.nextInt(enc.length - 3) else enc.length
        content += enc.substring(0, cut)
        if (cut < enc.length) content += enc.substring(cut)
        content += s"--$boundary--"
        recipe.append("b64part ")
        if (rng.chance(30)) {
          // part without closing boundary: md5 must NOT emit
          content += "Content-Transfer-Encoding: base64"
          content += ""
          content += b64("orphan")
          recipe.append("orphan ")
        }
      } else {
        content += s"plain body line ${rng.nextInt(9)}"
        content += "another line"
      }
      val allLines = bodyLines.result() ++ content.result()
      if (useBdat) {
        val payload = allLines.map(_ + "\r\n").mkString + ".\r\n"
        // BDAT counts BYTES; "." inside BDAT is data, the terminator is
        // the byte count itself — emit the exact count so the model and
        // parser agree on where DATA ends
        val body = allLines.map(_ + "\r\n").mkString
        if (rng.chance(8)) {
          // atoi truncation region: (int)strtol — "9999999999" declares
          // 1410065408 bytes (consumes the rest), huge digits declare 0
          // (count wraps as guint, also consumes the rest)
          sb.append("BDAT " + rng.pick(Seq("9999999999", "2147483647",
            "99999999999999999999", "-3")) + crlf())
          recipe.append("hugebdat ")
        } else sb.append(s"BDAT ${body.length}${crlf()}")
        sb.append(body)
        recipe.append("bdat ")
      } else {
        sb.append(s"DATA${crlf()}")
        allLines.foreach(l => sb.append(l + "\r\n"))
        sb.append(".\r\n")
      }
    }
    if (rng.chance(15)) { sb.append(s"STARTTLS${crlf()}ignored after${crlf()}"); recipe.append("starttls ") }
    sb.append(s"QUIT${crlf()}")
    var out = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    if (rng.chance(12) && out.length > 4) {
      out = out.take(1 + rng.nextInt(out.length - 1))
      recipe.append("trunc ")
    }
    // byte-level mutations (see HttpDifferentialFuzzSpec): both sides
    // are byte-exact machines — arbitrary bytes stay comparable
    if (rng.chance(15) && out.length >= 8) {
      recipe.append("mut ")
      val buf = scala.collection.mutable.ArrayBuffer(out: _*)
      for (_ <- 0 to rng.nextInt(3)) {
        val i = rng.nextInt(buf.length)
        rng.nextInt(3) match {
          case 0 => buf(i) = rng.nextInt(256).toByte
          case 1 => buf.remove(i)
          case 2 => buf.insert(i, buf(i))
        }
      }
      out = buf.toArray
    }
    (out, recipe.toString)
  }

  test("crafted transcripts: extractor matches the smtp.c state-machine model") {
    // soak knobs: GRAFT_FUZZ_TRIALS=30000 GRAFT_FUZZ_SEED=0x... sbt test
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(500)
    val rng = new Rng(sys.env.get("GRAFT_FUZZ_SEED")
      .map(java.lang.Long.decode(_).longValue).getOrElse(0x5317a9L))
    for (trial <- 0 until nTrials) {
      val (stream, recipe) = genTranscript(rng)
      compare(stream, s"trial $trial: $recipe")
    }
  }

  test("pinned smtp.c quirks") {
    def t(s: String, label: String): Unit =
      compare(s.getBytes(StandardCharsets.ISO_8859_1), label)
    // boundary: 2nd char ignored, trailing junk allowed
    t("EHLO h\r\nMAIL FROM:<a@b>\r\nDATA\r\n" +
      "Content-Type: multipart/mixed; boundary=\"bb\"\r\n\r\n" +
      "-Xbb\r\nContent-Transfer-Encoding: base64\r\n\r\n" +
      "cGF5bG9hZA==\r\n--bbJUNK--\r\n.\r\nQUIT\r\n",
      "loose boundary match")
    // unquoted boundary keeps params to line end (never matches)
    t("EHLO h\r\nMAIL FROM:<a@b>\r\nDATA\r\n" +
      "Content-Type: multipart/mixed; boundary=bb; charset=x\r\n\r\n" +
      "--bb\r\nContent-Transfer-Encoding: base64\r\n\r\n" +
      "cGF5bG9hZA==\r\n--bb--\r\n.\r\nQUIT\r\n",
      "unquoted boundary keeps params")
    // BDAT: '.' inside the chunk is data, byte count ends it
    t("EHLO h\r\nBDAT 26\r\nFrom: x@y\r\n\r\n.\r\nbody text\r\n" +
      "MAIL FROM:<after@bdat>\r\nQUIT\r\n",
      "bdat byte counting")
    // AUTH LOGIN two-step: the line after the cred line appends to the
    // decoded-in-place garbage and is swallowed
    t("EHLO h\r\nAUTH LOGIN\r\ndXNlcjE=\r\nMAIL FROM:<lost@x>\r\n" +
      "MAIL FROM:<kept@x>\r\nQUIT\r\n",
      "auth login swallows next command")
    // LF-only transcripts never split lines ('\r'-driven machine)
    t("EHLO h\nMAIL FROM:<a@b>\nQUIT\n", "lf-only never splits")
    // final line without CR is never processed
    t("EHLO h\r\nMAIL FROM:<tail@x>", "tail line without CR dropped")
    // header fold uses a single ' ' even for tab continuations
    t("EHLO h\r\nDATA\r\nSubject: one\r\n\ttwo\r\n\r\n.\r\nQUIT\r\n",
      "tab fold becomes space")
  }
}
