package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SmtpParser

/** Round-trip fuzz for the SMTP transcript parser: a structured
  * generator writes client sessions (envelope, AUTH, RFC 2047 subjects,
  * Received chains, MIME multiparts with base64 attachments) and
  * predicts every SmtpInfo field from its own model of the documented
  * smtp.c semantics — envelope adds lowered, one subject space
  * consumed, encoded-word joins, inet_aton octal relay ips, per-part
  * digests at the closing boundary, header promotion vs headerField/
  * Value. Expectations never consult the parser.
  */
class SmtpRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x50f7baaL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(StandardCharsets.UTF_8))
  private def digest(alg: String, b: Array[Byte]): String =
    java.security.MessageDigest.getInstance(alg).digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  test("generated transcripts round-trip every SmtpInfo field") {
    for (trial <- 0 until 150) {
      val w = new StringBuilder
      def line(s: String): Unit = { w.append(s); w.append("\r\n") }
      val eHello = Seq.newBuilder[String]
      val eSrc = Seq.newBuilder[String]
      val eDst = Seq.newBuilder[String]
      val eSubj = Seq.newBuilder[String]
      val eCt = Seq.newBuilder[String]
      val eMime = Seq.newBuilder[String]
      val eHdrNames = Seq.newBuilder[String]
      val eUser = Seq.newBuilder[String]
      val eId = Seq.newBuilder[String]
      val eHost = Seq.newBuilder[String]
      val eIp = Seq.newBuilder[String]
      val eUa = Seq.newBuilder[String]
      val eHF = Seq.newBuilder[String]
      val eHV = Seq.newBuilder[String]
      val eTrace = Seq.newBuilder[String]
      val eMd5 = Seq.newBuilder[String]
      val eSha = Seq.newBuilder[String]
      val eFn = Seq.newBuilder[String]
      val eTags = Seq.newBuilder[String]

      val helo = s"Client${nextInt(40)}.Example.COM"
      line(s"EHLO $helo"); eHello += helo.toLowerCase
      // ---- AUTH ----
      if (chance(40)) {
        if (chance(50)) {
          val u = s"Alice${nextInt(30)}"
          eTags += "smtp:authplain"; eUser += u.toLowerCase
          val tok = java.util.Base64.getEncoder.encodeToString(
            s"\u0000$u\u0000pw".getBytes(StandardCharsets.ISO_8859_1))
          if (chance(50)) line(s"AUTH PLAIN $tok")
          else {
            line("AUTH PLAIN"); line(tok)
            // the reference decodes the credential line IN PLACE without
            // truncating the line buffer (smtp.c:529-555), so the NEXT
            // command appends to decoded garbage and is swallowed —
            // sacrifice a NOOP (differential-fuzz-pinned quirk)
            line("NOOP")
          }
        } else {
          val u = s"Bob${nextInt(30)}"
          eTags += "smtp:authlogin"; eUser += u.toLowerCase
          if (chance(50)) line(s"AUTH LOGIN ${b64(u)}")
          else { line("AUTH LOGIN"); line(b64(u)); line("NOOP") } // see above
        }
      }
      // (STARTTLS moved to the end of the transcript: the reference
      // stops parsing the direction there — the rest of the stream is
      // TLS; differential-fuzz-pinned)
      // ---- envelope ----
      val envFrom = s"Sender${nextInt(40)}@Mail.Example"
      line(s"MAIL FROM:<$envFrom>"); eSrc += envFrom.toLowerCase
      val rcpts = (0 until 1 + nextInt(3)).map(i => s"rcpt$i@ex$trial.org")
      rcpts.foreach { r => line(s"RCPT TO:<$r>"); eDst += r }
      line("DATA")
      // ---- message headers ----
      val hdrFrom = s"disp${nextInt(9)}@hdr.example"
      line(s"""From: "Display Name" <$hdrFrom>""")
      eSrc += hdrFrom; eHdrNames += "from"
      val hdrTo = s"to${nextInt(9)}@hdr.example"
      line(s"To: $hdrTo"); eDst += hdrTo; eHdrNames += "to"
      // subject: plain / B / Q / adjacent encoded words
      val (subjRaw, subjDecoded) = nextInt(4) match {
        case 0 =>
          val s = s"Order ${nextInt(1000)} zwx"
          (s, s)
        case 1 =>
          val mid = s"Bericht ${nextInt(99)}"
          (s"pre =?UTF-8?B?${b64(mid)}?= post", s"pre $mid post")
        case 2 => // adjacent words: the single joining space is dropped
          val (a, b) = (s"Aa${nextInt(9)}", s"Bb${nextInt(9)}")
          (s"=?utf-8?B?${b64(a)}?= =?utf-8?B?${b64(b)}?=", a + b)
        case _ => // Q encoding: '_' is space, =41 is 'A'
          (s"=?utf-8?Q?q_w=41x?=", "q wAx")
      }
      line(s"Subject: $subjRaw"); eSubj += subjDecoded
      eHdrNames += "subject"
      val msgId = s"m${nextInt(9999)}@id.example"
      line(s"Message-ID: <$msgId>"); eId += msgId; eHdrNames += "message-id"
      line("MIME-Version: 1.0"); eMime += "1.0"; eHdrNames += "mime-version"
      if (chance(60)) {
        val relayHost = s"mx${nextInt(9)}.Relay.Example"
        val hubHost = s"hub${nextInt(9)}.example"
        // inet_aton semantics: leading-zero octets are octal
        val relayIp = oneOf(Seq("10.0.000.7", "192.168.07.010", "10.1.2.3"))
        val normalized = relayIp.split("\\.").map(p =>
          if (p.length > 1 && p.startsWith("0")) Integer.parseInt(p, 8)
          else p.toInt).mkString(".")
        line(s"Received: from $relayHost (local [$relayIp]) by " +
          s"$hubHost with ESMTP")
        eHost += relayHost.toLowerCase
        eHost += hubHost
        eIp += normalized
        eHdrNames += "received"
      }
      if (chance(50)) {
        val ua = s"Mailer/${nextInt(9)}.0"
        line(s"X-Mailer: $ua"); eUa += ua; eHdrNames += "x-mailer"
      }
      if (chance(40)) {
        val tv = s"TraceVal${nextInt(99)}"
        line(s"X-Elnk-Trace: $tv"); eTrace += tv.toLowerCase
        eHdrNames += "x-elnk-trace"
      }
      if (chance(50)) {
        val hv = s"CustomVal ${nextInt(99)}"
        line(s"X-Unknown-${trial % 5}: $hv")
        eHdrNames += s"x-unknown-${trial % 5}"
        eHF += s"x-unknown-${trial % 5}"; eHV += hv
      }
      // ---- body: plain or MIME multipart with base64 attachment ----
      val multipart = chance(60)
      if (multipart) {
        val boundary = s"b${trial}x"
        val ctRaw = s"""multipart/mixed; boundary="$boundary""""
        line(s"Content-Type: $ctRaw")
        eCt += ctRaw; eHdrNames += "content-type"
        line("")
        line(s"--$boundary")
        val payload = Array.tabulate(10 + nextInt(500))(k =>
          ((k * 17 + trial * 3 + 120) & 0xff).toByte)
        val fn = s"file${nextInt(99)}.bin"
        line("Content-Type: application/octet-stream")
        line(s"""Content-Disposition: attachment; filename="$fn"""")
        line("Content-Transfer-Encoding: base64")
        line("")
        java.util.Base64.getEncoder.encodeToString(payload)
          .grouped(60).foreach(line)
        line(s"--$boundary--")
        eMd5 += digest("MD5", payload)
        eSha += digest("SHA-256", payload)
        eFn += fn
      } else {
        line("Content-Type: text/plain")
        eCt += "text/plain"; eHdrNames += "content-type"
        line("")
        line("plain body zz")
      }
      line(".")
      // a "." that ends the message through EMAIL_MIME_RETURN (the
      // multipart path) is NOT truncated from the line buffer
      // (smtp.c:784-800 has no g_string_truncate, unlike
      // EMAIL_DATA_RETURN) — the next command line appends to "." and
      // is swallowed; sacrifice a NOOP (differential-fuzz-pinned)
      if (multipart) line("NOOP")
      if (chance(25)) {
        line("STARTTLS"); eTags += "smtp:starttls"
        line("tls bytes follow, never parsed")
      }
      val text = w.toString.getBytes(StandardCharsets.ISO_8859_1)
      val info = SmtpParser.parse(text)
        .getOrElse(fail(s"trial $trial: no SmtpInfo"))
      def ds(xs: Seq[String]) = xs.distinct
      assert(info.hello == ds(eHello.result()), s"trial $trial hello")
      assert(info.src == ds(eSrc.result()), s"trial $trial src")
      assert(info.dst == ds(eDst.result()), s"trial $trial dst")
      assert(info.subject == ds(eSubj.result()), s"trial $trial subject")
      assert(info.contentType == ds(eCt.result()), s"trial $trial ct")
      assert(info.mimeVersion == ds(eMime.result()), s"trial $trial mime")
      assert(info.user == ds(eUser.result()), s"trial $trial user")
      assert(info.id == ds(eId.result()), s"trial $trial id")
      assert(info.ip == ds(eIp.result()), s"trial $trial ip")
      assert(info.useragent == ds(eUa.result()), s"trial $trial ua")
      assert(info.headerTrace == ds(eTrace.result()), s"trial $trial trace")
      assert(info.headerField == ds(eHF.result()), s"trial $trial hf")
      assert(info.headerValue == eHV.result(), s"trial $trial hv")
      assert(info.md5 == ds(eMd5.result()), s"trial $trial md5")
      assert(info.sha256 == ds(eSha.result()), s"trial $trial sha")
      assert(info.filename == ds(eFn.result()), s"trial $trial fn")
      assert(info.tags == ds(eTags.result()), s"trial $trial tags")
      assert(info.headers == ds(eHdrNames.result()).sorted,
        s"trial $trial headers")
      assert(info.host == ds(eHost.result()), s"trial $trial host")
    }
  }
}
