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
      user: Seq[String] = Nil)

  private val addrRe = "<([^>]+)>".r

  private def addr(line: String): Option[String] =
    addrRe.findFirstMatchIn(line).map(_.group(1))
      .orElse(line.split(":", 2).lift(1).map(_.trim).filter(_.contains("@")))

  def isSmtp(srcStream: Array[Byte], dstStream: Array[Byte]): Boolean = {
    // the reference classifies on the HELO/EHLO command alone (parsers/
    // smtp.c classify) — one-sided captures still tag smtp
    def head(b: Array[Byte]) =
      new String(b.take(64), StandardCharsets.ISO_8859_1).toUpperCase
    head(srcStream).startsWith("HELO") || head(srcStream).startsWith("EHLO")
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
    val subject = Seq.newBuilder[String]
    val contentType = Seq.newBuilder[String]
    val mimeVersion = Seq.newBuilder[String]
    var headerSection = false
    lines.foreach { line =>
      val u = line.toUpperCase
      if (!inData) {
        if (authState == 1) { b64user(line, plain = false); authState = 0 }
        else if (authState == 2) { b64user(line, plain = true); authState = 0 }
        else if (u.startsWith("AUTH LOGIN")) {
          // inline initial-response or username on the next line
          val arg = line.substring(10).trim
          if (arg.nonEmpty) b64user(arg, plain = false) else authState = 1
        } else if (u.startsWith("AUTH PLAIN")) {
          val arg = line.substring(10).trim
          if (arg.nonEmpty) b64user(arg, plain = true) else authState = 2
        } else if (u.startsWith("HELO ") || u.startsWith("EHLO "))
          hello += line.substring(5).trim.toLowerCase
        else if (u.startsWith("MAIL FROM")) addr(line).foreach(src += _)
        else if (u.startsWith("RCPT TO")) addr(line).foreach(dst += _)
        else if (u == "DATA") { inData = true; headerSection = true }
      } else if (headerSection) {
        if (line.isEmpty) headerSection = false // blank line ends headers
        else if (!line.startsWith(" ") && !line.startsWith("\t") && line.contains(":")) {
          val name = line.takeWhile(_ != ':')
          val value = line.substring(name.length + 1).trim
          headerNames += name.toLowerCase
          name.toLowerCase match {
            case "subject"      => subject += value
            case "content-type" => contentType += value
            case "mime-version" => mimeVersion += value
            case _              =>
          }
        }
      } else if (line == ".") { // end of DATA; another message may follow
        inData = false
      }
    }
    val info = SmtpInfo(
      hello = hello.result().distinct,
      src = src.result().distinct,
      dst = dst.result().distinct,
      subject = subject.result().distinct,
      contentType = contentType.result().distinct,
      mimeVersion = mimeVersion.result().distinct,
      headers = headerNames.result().distinct.sorted,
      user = user.result().distinct)
    if (info.hello.isEmpty && info.src.isEmpty && info.subject.isEmpty) None
    else Some(info)
  }
}
