package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.HttpParser

/** Round-trip property fuzz for the HTTP/1.x message walker — the
  * hottest extractor in the ingest profile (and the site of the r10
  * SWAR rewrite). A structured generator emits pipelined request/
  * response exchanges and predicts every HttpInfo field from its own
  * model of the documented reference semantics (http.c framing: CL /
  * chunked / HEAD-no-body / close-delimited; urlString assembly;
  * parse_url's &/= query walk; own-header promotion) — the serializer
  * and the expectations never consult the parser.
  */
class HttpRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x177f0bbL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  test("pipelined exchanges round-trip every HttpInfo field") {
    for (trial <- 0 until 250) {
      val nEx = 1 + nextInt(4)
      val req = new java.io.ByteArrayOutputStream()
      val resp = new java.io.ByteArrayOutputStream()
      // expectation accumulators (insertion order, dedup at the end)
      val eMethod = Seq.newBuilder[String]
      val eUri = Seq.newBuilder[String]
      val eHost = Seq.newBuilder[String]
      val ePath = Seq.newBuilder[String]
      val eKey = Seq.newBuilder[String]
      val eVal = Seq.newBuilder[String]
      val eStatus = Seq.newBuilder[Int]
      val eUa = Seq.newBuilder[String]
      val eCliV = Seq.newBuilder[String]
      val eSrvV = Seq.newBuilder[String]
      val eReqHdr = Seq.newBuilder[String]
      val eRespHdr = Seq.newBuilder[String]
      val eReferer = Seq.newBuilder[String]
      val eLocation = Seq.newBuilder[String]
      val eCk = Seq.newBuilder[String]
      val eCv = Seq.newBuilder[String]
      val eMd5 = Seq.newBuilder[String]
      val eReqBody = Seq.newBuilder[String]
      val eAuthUser = Seq.newBuilder[String]
      val eAuthType = Seq.newBuilder[String]
      val eAuthRaw = Seq.newBuilder[String]
      val eXff = Seq.newBuilder[String]
      val eReqHF = Seq.newBuilder[String]
      val eReqHV = Seq.newBuilder[String]
      val eRespHF = Seq.newBuilder[String]
      val eRespHV = Seq.newBuilder[String]
      var ePwd = false
      val reqOwn = Set("x-forwarded-for", "user-agent", "host",
        "referer", "authorization")
      val respOwn = Set("location")

      for (ex <- 0 until nEx) {
        val lastEx = ex == nEx - 1
        val method = oneOf(Seq("GET", "POST", "PUT", "HEAD", "GET"))
        eMethod += method
        // ---- target: path + controlled query shapes ----
        val path = s"/p$trial/q$ex" + (if (chance(30)) s"/r${nextInt(9)}" else "")
        val qsegs = (0 until nextInt(4)).map { i =>
          nextInt(4) match {
            case 0 => (s"k$i", Seq(s"v$i"))           // k=v
            case 1 => (s"flag$i", Nil)                 // bare key
            case 2 => (s"k$i", Seq(s"a$i", s"b$i"))    // k=a=b → two values
            case _ => (s"k$i", Seq(s"e%41$i"))         // escaped value
          }
        }
        val qtext = qsegs.map { case (k, vs) =>
          (k +: vs).mkString("=")
        }.mkString("&")
        val target = if (qsegs.isEmpty) path else s"$path?$qtext"
        // ---- headers ----
        val hasHost = chance(85)
        val hostBase = s"h${nextInt(40)}.example.com"
        val hostVal = if (chance(25)) s"$hostBase:8080" else hostBase
        val hdrs = Seq.newBuilder[(String, String)]
        if (hasHost) {
          hdrs += (("Host", hostVal))
          eHost += hostVal.toLowerCase
          if (hostVal != hostBase) eHost += hostBase
          eUri += hostVal.toLowerCase + target
          ePath += path
          // parse_url model: '&' flushes (key state), '=' flushes and
          // switches to value; the TAIL is flushed only in value state —
          // so a trailing bare key ("...&flag") is dropped; empty
          // segments skipped; %XX unescaped
          qsegs.zipWithIndex.foreach { case ((k, vs), i) =>
            val isLast = i == qsegs.length - 1
            if (!(isLast && vs.isEmpty)) eKey += k
            vs.foreach(v => eVal += v.replace("%41", "A"))
          }
        } else eUri += target // no Host: raw target, never path-parsed
        val ua = s"ua-${nextInt(20)}"
        hdrs += (("User-Agent", ua)); eUa += ua
        if (chance(35)) {
          val r = s"http://r${nextInt(9)}.example.org/"
          hdrs += (("Referer", r)); eReferer += r
        }
        if (chance(35)) {
          val (ck1, cv1) = (s"sid", s"S${nextInt(99)}")
          val (ck2, cv2) = (s"pref", s"P${nextInt(9)}")
          val raw = s"$ck1=$cv1; $ck2=$cv2"
          hdrs += (("Cookie", raw))
          eCk += ck1; eCk += ck2; eCv += cv1; eCv += cv2
          // cookie has no configured own field: besides the promoted
          // key/value pairs it lands in requestHeaderField/Value like
          // any other header (only the ReqOwnHeaders five don't)
          eReqHF += "cookie"; eReqHV += raw.toLowerCase
        }
        if (chance(30)) {
          val user = s"user${nextInt(50)}"
          val raw = "Basic " + java.util.Base64.getEncoder
            .encodeToString(s"$user:pw".getBytes("ISO-8859-1"))
          hdrs += (("Authorization", raw))
          eAuthUser += user; eAuthType += "basic"; eAuthRaw += raw
        }
        if (chance(25)) {
          val a = s"10.1.2.${1 + nextInt(250)}"
          val b = s"10.3.4.${1 + nextInt(250)}"
          hdrs += (("X-Forwarded-For", s"$a, $b"))
          eXff += a; eXff += b
        }
        if (chance(40)) {
          val hn = s"X-Custom-${nextInt(5)}"
          val hv = s"CVal${nextInt(30)}"
          hdrs += ((hn, hv))
          eReqHF += hn.toLowerCase; eReqHV += hv.toLowerCase
        }
        // ---- request body ----
        val body: Array[Byte] =
          if ((method == "POST" || method == "PUT") && chance(70)) {
            val withPwd = chance(25)
            val text = s"zzfield$trial-$ex=" + ("z" * nextInt(40)) +
              (if (withPwd) "&password=hunter2" else "")
            if (withPwd) ePwd = true
            text.getBytes(StandardCharsets.ISO_8859_1)
          } else Array.emptyByteArray
        if (body.nonEmpty) {
          eMd5 += md5hex(body)
          eReqBody += new String(body, StandardCharsets.ISO_8859_1)
        }
        val crlf = if (chance(85)) "\r\n" else "\n" // LF-only accepted
        val httpV = oneOf(Seq("1.1", "1.1", "1.0"))
        eCliV += httpV
        val headerLines = hdrs.result()
        headerLines.map(_._1.toLowerCase).foreach(eReqHdr += _)
        val reqMsg = new StringBuilder
        reqMsg.append(s"$method $target HTTP/$httpV$crlf")
        headerLines.foreach { case (k, v) => reqMsg.append(s"$k: $v$crlf") }
        if (body.nonEmpty)
          reqMsg.append(s"Content-Length: ${body.length}$crlf")
        if (body.nonEmpty) eReqHdr += "content-length"
        // content-length is not an own header → headerField/Value too
        if (body.nonEmpty) {
          eReqHF += "content-length"; eReqHV += body.length.toString
        }
        reqMsg.append(crlf)
        req.write(reqMsg.toString.getBytes(StandardCharsets.ISO_8859_1))
        req.write(body)

        // ---- response ----
        val status = oneOf(Seq(200, 200, 301, 404, 204))
        eStatus += status
        val srvV = oneOf(Seq("1.1", "1.0"))
        eSrvV += srvV
        val rHdrs = Seq.newBuilder[(String, String)]
        val srv = s"srv-${nextInt(9)}"
        rHdrs += (("Server", srv))
        eRespHF += "server"; eRespHV += srv.toLowerCase
        if (status == 301) {
          val loc = s"https://l${nextInt(9)}.example.com/"
          rHdrs += (("Location", loc)); eLocation += loc
        }
        val noBody = status == 204 || method == "HEAD"
        val rBody: Array[Byte] =
          if (noBody) Array.emptyByteArray
          else ("zzresp" + ex + "-" + ("y" * (1 + nextInt(60))))
            .getBytes(StandardCharsets.ISO_8859_1)
        val rMsg = new StringBuilder
        rMsg.append(s"HTTP/$srvV $status X\r\n")
        rHdrs.result().foreach { case (k, v) => rMsg.append(s"$k: $v\r\n") }
        rHdrs.result().map(_._1.toLowerCase).foreach(eRespHdr += _)
        if (method == "HEAD") {
          // HEAD with Content-Length: 0 — the reference never skips a
          // body for HEAD (moloch's on_headers_complete returns 0, no
          // F_SKIPBODY), so a HEAD response advertising a NON-zero
          // length swallows the next responses' bytes as its body;
          // that quirk is pinned by HttpDifferentialFuzzSpec, while
          // this round-trip generator keeps its stream well-formed
          rMsg.append(s"Content-Length: 0\r\n\r\n")
          eRespHdr += "content-length"
          eRespHF += "content-length"
        } else if (rBody.isEmpty) {
          rMsg.append("\r\n")
        } else if (chance(35)) {
          // chunked framing, 1-3 chunks + zero chunk
          rMsg.append("Transfer-Encoding: chunked\r\n\r\n")
          eRespHdr += "transfer-encoding"
          eRespHF += "transfer-encoding"; eRespHV += "chunked"
          eMd5 += md5hex(rBody)
          val cuts = (Seq(0, rBody.length) ++
            (0 until nextInt(3)).map(_ => nextInt(rBody.length + 1)))
            .distinct.sorted
          resp.write(rMsg.toString.getBytes(StandardCharsets.ISO_8859_1))
          cuts.sliding(2).foreach {
            case Seq(a, b) if b > a =>
              resp.write(s"${(b - a).toHexString}\r\n"
                .getBytes(StandardCharsets.ISO_8859_1))
              resp.write(rBody, a, b - a)
              resp.write("\r\n".getBytes(StandardCharsets.ISO_8859_1))
            case _ =>
          }
          resp.write("0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
        } else if (lastEx && chance(30)) {
          // close-delimited: no framing header, body runs to stream end
          rMsg.append("\r\n")
          eMd5 += md5hex(rBody)
          resp.write(rMsg.toString.getBytes(StandardCharsets.ISO_8859_1))
          resp.write(rBody)
        } else {
          rMsg.append(s"Content-Length: ${rBody.length}\r\n\r\n")
          eRespHdr += "content-length"
          eRespHF += "content-length"; eRespHV += rBody.length.toString
          eMd5 += md5hex(rBody)
          resp.write(rMsg.toString.getBytes(StandardCharsets.ISO_8859_1))
          resp.write(rBody)
        }
        if (method == "HEAD") {
          eRespHV += "0"
          resp.write(rMsg.toString.getBytes(StandardCharsets.ISO_8859_1))
        } else if (rBody.isEmpty && status == 204) {
          resp.write(rMsg.toString.getBytes(StandardCharsets.ISO_8859_1))
        }
      }

      val info = HttpParser.parse(req.toByteArray, resp.toByteArray)
        .getOrElse(fail(s"trial $trial: no HttpInfo"))
      def ds(xs: Seq[String]): Seq[String] = xs.distinct
      assert(info.method == ds(eMethod.result()), s"trial $trial method")
      assert(info.uri == ds(eUri.result()), s"trial $trial uri")
      assert(info.host == ds(eHost.result()), s"trial $trial host")
      assert(info.path == ds(ePath.result()), s"trial $trial path")
      assert(info.key == ds(eKey.result()), s"trial $trial key")
      assert(info.value == ds(eVal.result()), s"trial $trial value")
      assert(info.statuscode == eStatus.result().distinct,
        s"trial $trial status")
      assert(info.useragent == ds(eUa.result()), s"trial $trial ua")
      assert(info.clientVersion == ds(eCliV.result()), s"trial $trial cliV")
      assert(info.serverVersion == ds(eSrvV.result()), s"trial $trial srvV")
      assert(info.requestHeader == ds(eReqHdr.result()).sorted,
        s"trial $trial reqHdr")
      assert(info.responseHeader == ds(eRespHdr.result()).sorted,
        s"trial $trial respHdr")
      assert(info.referer == ds(eReferer.result()), s"trial $trial referer")
      assert(info.location == ds(eLocation.result()), s"trial $trial location")
      assert(info.cookieKey == ds(eCk.result()), s"trial $trial ck")
      assert(info.cookieValue == ds(eCv.result()), s"trial $trial cv")
      assert(info.md5.toSet == eMd5.result().toSet, s"trial $trial md5")
      assert(info.requestBody == ds(eReqBody.result()), s"trial $trial body")
      assert(info.authUser == ds(eAuthUser.result()), s"trial $trial auth")
      assert(info.authType == ds(eAuthType.result()), s"trial $trial authT")
      assert(info.authorization == ds(eAuthRaw.result()), s"trial $trial authR")
      assert(info.xffIp == ds(eXff.result()), s"trial $trial xff")
      assert(info.requestHeaderField == ds(eReqHF.result()).sorted,
        s"trial $trial reqHF")
      assert(info.requestHeaderValue.sorted == eReqHV.result().sorted,
        s"trial $trial reqHV (STR_ARRAY keeps duplicates)")
      assert(info.responseHeaderField == ds(eRespHF.result()).sorted,
        s"trial $trial respHF")
      assert(info.responseHeaderValue.sorted == eRespHV.result().sorted,
        s"trial $trial respHV")
      assert(info.passwordInBody == ePwd, s"trial $trial pwd")
    }
  }
}
