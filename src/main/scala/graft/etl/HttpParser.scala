package graft.etl

import java.nio.charset.StandardCharsets

/** Full HTTP/1.x message walker over the per-direction reassembled
  * streams (reference: capture/parsers/http.c on http-parser callbacks).
  *
  * Extracts the reference's http.* field surface: request line pieces
  * (method, path, query keys/values, versions), the url field (host +
  * origin-form target, as moloch builds urlString), header NAME lists
  * per direction plus the promoted Referer/Location/Cookie/Authorization
  * headers, and the MD5 of each message body exactly as delivered —
  * de-chunked but NOT content-decoded (a gzip body hashes its gzip
  * bytes, http.c:287-320 feeds on_body to the checksum).
  */
object HttpParser {

  final case class HttpInfo(
      method: Seq[String], uri: Seq[String], host: Seq[String],
      path: Seq[String], key: Seq[String], value: Seq[String],
      statuscode: Seq[Int], useragent: Seq[String],
      clientVersion: Seq[String], serverVersion: Seq[String],
      requestHeader: Seq[String], responseHeader: Seq[String],
      referer: Seq[String], location: Seq[String],
      cookieKey: Seq[String], cookieValue: Seq[String],
      md5: Seq[String], authUser: Seq[String],
      bodyMagic: Seq[String] = Nil,
      sha256: Seq[String] = Nil,
      // http.requestBody (http.c:307-311): small UTF-8 request bodies
      requestBody: Seq[String] = Nil,
      // parseHTTPHeader{Request,Response}All (http.c:478-492): headers
      // with no field of their own get name → *HeaderField and
      // lowercased value (≤1024) → *HeaderValue
      requestHeaderField: Seq[String] = Nil,
      requestHeaderValue: Seq[String] = Nil,
      responseHeaderField: Seq[String] = Nil,
      responseHeaderValue: Seq[String] = Nil,
      authType: Seq[String] = Nil,
      // configured header field [headers-http-request] authorization →
      // http.request-authorization, raw value
      authorization: Seq[String] = Nil,
      // http:password — a body's first chunk contains password=/passwd=/
      // pass= (http.c:296-302)
      passwordInBody: Boolean = false,
      // X-Forwarded-For, comma-split and parsed as addresses
      // (http.c:131-139 g_strsplit + moloch_field_ip_add_str)
      xffIp: Seq[String] = Nil)

  /** Field-wise union of two parses (an HTTP/1 upgrade that continues
    * as cleartext http2 can yield both).
    */
  def merge(a: HttpInfo, b: HttpInfo): HttpInfo = HttpInfo(
    method = (a.method ++ b.method).distinct,
    uri = (a.uri ++ b.uri).distinct,
    host = (a.host ++ b.host).distinct,
    path = (a.path ++ b.path).distinct,
    key = (a.key ++ b.key).distinct,
    value = (a.value ++ b.value).distinct,
    statuscode = (a.statuscode ++ b.statuscode).distinct,
    useragent = (a.useragent ++ b.useragent).distinct,
    clientVersion = (a.clientVersion ++ b.clientVersion).distinct,
    serverVersion = (a.serverVersion ++ b.serverVersion).distinct,
    requestHeader = (a.requestHeader ++ b.requestHeader).distinct.sorted,
    responseHeader = (a.responseHeader ++ b.responseHeader).distinct.sorted,
    referer = (a.referer ++ b.referer).distinct,
    location = (a.location ++ b.location).distinct,
    cookieKey = (a.cookieKey ++ b.cookieKey).distinct,
    cookieValue = (a.cookieValue ++ b.cookieValue).distinct,
    md5 = (a.md5 ++ b.md5).distinct,
    sha256 = (a.sha256 ++ b.sha256).distinct,
    requestBody = (a.requestBody ++ b.requestBody).distinct,
    authUser = (a.authUser ++ b.authUser).distinct,
    bodyMagic = (a.bodyMagic ++ b.bodyMagic).distinct,
    requestHeaderField = (a.requestHeaderField ++ b.requestHeaderField).distinct.sorted,
    requestHeaderValue = a.requestHeaderValue ++ b.requestHeaderValue,
    responseHeaderField = (a.responseHeaderField ++ b.responseHeaderField).distinct.sorted,
    responseHeaderValue = a.responseHeaderValue ++ b.responseHeaderValue,
    authType = (a.authType ++ b.authType).distinct,
    authorization = (a.authorization ++ b.authorization).distinct,
    passwordInBody = a.passwordInBody || b.passwordInBody,
    xffIp = (a.xffIp ++ b.xffIp).distinct)

  private final case class Message(
      firstLine: String, headers: Seq[(String, String)], body: Array[Byte],
      // message-complete fired (http_parser semantics): body fully framed
      // by Content-Length / a 0-chunk, or EOF-terminated. A truncated
      // capture leaves complete=false and suppresses body md5 (http.c
      // only emits md5 at on_message_complete).
      complete: Boolean = true,
      // stream offsets of the message start / framed-body start, for
      // the display split (PacketsView maps them to run timestamps)
      start: Int = 0, bodyOff: Int = 0)

  private val methods = Set("GET", "POST", "HEAD", "PUT", "DELETE",
    "OPTIONS", "PATCH", "CONNECT", "TRACE")

  // precompiled "\r?\n" — String.split(regex) recompiles per call, and
  // this runs once per HTTP message
  private val LineSplit = java.util.regex.Pattern.compile("\r?\n")

  /** First '\n' in `a[from, to)`, or -1 — long-at-a-time memchr: the
    * classic SWAR zero-byte test `(x^pat)-0x01.. & ~(x^pat) & 0x80..`
    * over little-endian 8-byte loads (ByteBuffer.getLong is JIT-
    * intrinsified to a single load), ~8× fewer iterations than a
    * per-byte scan on header-dense streams.
    */
  private def indexOfNl(a: Array[Byte], from: Int, to: Int): Int = {
    val bb = java.nio.ByteBuffer.wrap(a).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = from
    while (i + 8 <= to) {
      val x = bb.getLong(i) ^ 0x0a0a0a0a0a0a0a0aL
      val z = (x - 0x0101010101010101L) & ~x & 0x8080808080808080L
      if (z != 0L)
        return i + (java.lang.Long.numberOfTrailingZeros(z) >> 3)
      i += 8
    }
    while (i < to) {
      if (a(i) == '\n') return i
      i += 1
    }
    -1
  }

  /** Walk one direction's stream into messages (header block + body).
    * `reqMethods`: the client direction's request-method sequence — a
    * response to HEAD carries a Content-Length but NO body (RFC 7230
    * 3.3.3), so framing it by the header would swallow the next
    * response's bytes.
    */
  private def messages(stream: Array[Byte], isResponse: Boolean,
      reqMethods: Seq[String] = Nil): Seq[Message] = {
    val out = Seq.newBuilder[Message]
    var off = 0
    var guard = 0
    var respIdx = 0
    while (off < stream.length && guard < 200) {
      guard += 1
      // header terminator: CRLFCRLF or bare LFLF — http_parser (and so
      // the reference) accepts LF-only messages (http-empty-useragent).
      // Byte scan (first match wins; the two patterns can't start at the
      // same index) instead of materializing a 64 KiB string per message
      val limit = math.min(stream.length - off, 64 * 1024)
      var hEnd = -1
      var sepLen = 0
      // anchored on '\n' (every terminator contains one), located 8
      // bytes at a time with the SWAR zero-byte test over a
      // little-endian long view — this scan is the hottest loop of the
      // whole ingest profile (it visits every header byte of every HTTP
      // message). First-match-wins order is preserved: '\n's are
      // visited ascending, and for an '\n' at j the CRLFCRLF candidate
      // (hEnd = j-1) precedes the LFLF candidate (hEnd = j).
      var si = 0
      while (hEnd < 0 && si < limit) {
        val abs = indexOfNl(stream, off + si, off + limit)
        if (abs < 0) si = limit
        else {
          val j = abs - off
          if (j >= 1 && j + 2 < limit && stream(off + j - 1) == '\r' &&
            stream(off + j + 1) == '\r' && stream(off + j + 2) == '\n') {
            hEnd = j - 1; sepLen = 4
          } else if (j + 1 < limit && stream(off + j + 1) == '\n') {
            hEnd = j; sepLen = 2
          }
          si = j + 1
        }
      }
      if (hEnd < 0) { off = stream.length }
      else {
        val headerBlock = new String(stream, off, hEnd,
          StandardCharsets.ISO_8859_1)
        val lines = LineSplit.split(headerBlock)
        val firstLine = lines.headOption.getOrElse("")
        val headers = lines.drop(1).toSeq.flatMap { l =>
          val i = l.indexOf(':')
          if (i <= 0) None else Some((l.substring(0, i).trim, l.substring(i + 1).trim))
        }
        def h(name: String): Option[String] =
          headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
        val bodyStart = off + hEnd + sepLen
        var bodyEnd = bodyStart
        var body = Array.emptyByteArray
        var complete = true
        val status = if (isResponse)
          firstLine.split(" ").lift(1).flatMap(_.toIntOption).getOrElse(0)
        else 0
        val isHeadResp = isResponse && firstLine.startsWith("HTTP/") &&
          reqMethods.lift(respIdx).contains("HEAD")
        // interim 1xx responses are not final answers to a request: bumping
        // respIdx for them shifts response-to-request alignment off by one
        // and breaks HEAD framing for the rest of the stream
        if (isResponse && firstLine.startsWith("HTTP/") && status / 100 != 1)
          respIdx += 1
        val noBody = isResponse &&
          (status / 100 == 1 || status == 204 || status == 304 || isHeadResp)
        if (!noBody) {
          if (h("Transfer-Encoding").exists(_.toLowerCase.contains("chunked"))) {
            // de-chunk: hex-size CRLF data CRLF ... 0 CRLF [trailers] CRLF
            val buf = new java.io.ByteArrayOutputStream()
            var p = bodyStart
            var ok = true
            var sawZeroChunk = false
            // default when the stream drains mid-chunk (truncated capture):
            // without this, bodyEnd stays at bodyStart and the outer walker
            // re-parses the same message until its iteration guard
            bodyEnd = stream.length
            while (ok && p < stream.length) {
              val lineEnd = indexOfCrlf(stream, p)
              if (lineEnd < 0) { ok = false; bodyEnd = stream.length }
              else {
                val sizeStr = new String(stream, p, lineEnd - p,
                  StandardCharsets.ISO_8859_1).trim.takeWhile(c =>
                  Character.digit(c, 16) >= 0)
                val size = try java.lang.Long.parseLong(
                  if (sizeStr.isEmpty) "-1" else sizeStr, 16).toInt
                catch { case _: Exception => -1 }
                if (size < 0) { ok = false; bodyEnd = stream.length }
                else if (size == 0) {
                  ok = false
                  sawZeroChunk = true
                  // trailers may follow the 0-chunk: the message ends at
                  // the next blank line, not a fixed 4 bytes — otherwise
                  // trailer headers re-parse as a bogus next message that
                  // swallows the rest of the stream
                  var q = lineEnd + 2
                  var end = -1
                  while (end < 0 && q + 1 < stream.length) {
                    if (stream(q) == '\r' && stream(q + 1) == '\n') {
                      end = q + 2 // blank line right here (no trailers)
                    } else {
                      val nl = indexOfCrlf(stream, q)
                      if (nl < 0) q = stream.length else q = nl + 2
                    }
                  }
                  bodyEnd = if (end >= 0) end else stream.length
                } else {
                  val dStart = lineEnd + 2
                  val dEnd = math.min(dStart + size, stream.length)
                  buf.write(stream, dStart, math.max(0, dEnd - dStart))
                  p = dEnd + 2 // skip trailing CRLF
                  if (dEnd >= stream.length) { ok = false; bodyEnd = stream.length }
                }
              }
            }
            body = buf.toByteArray
            complete = sawZeroChunk
          } else h("Content-Length").flatMap(_.trim.toIntOption) match {
            case Some(cl) =>
              bodyEnd = math.min(bodyStart + math.max(0, cl), stream.length)
              body = java.util.Arrays.copyOfRange(stream, bodyStart, bodyEnd)
              complete = bodyStart + math.max(0, cl) <= stream.length
            case None if isResponse =>
              // no framing on a response: body runs to connection close
              bodyEnd = stream.length
              body = java.util.Arrays.copyOfRange(stream, bodyStart, bodyEnd)
            case None => // request without length: no body
          }
        }
        out += Message(firstLine, headers, body, complete, off, bodyStart)
        off = math.max(bodyEnd, bodyStart)
      }
    }
    out.result()
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def md5hex(b: Array[Byte]): String =
    Hex.hex(java.security.MessageDigest.getInstance("MD5").digest(b))

  private def sha256hex(b: Array[Byte]): String =
    Hex.hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))

  /** Strictly-valid UTF-8 text or None (g_utf8_validate gate). */
  private def utf8OrNone(b: Array[Byte]): Option[String] =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  /** Complete message bodies with display names, for the body-download
    * endpoints (viewer/decode.js:319-601 naming): a `filename=` /
    * `name=` on the message's content-disposition/content-type wins,
    * else the owning request URI's last `/?=`-separated component
    * (decode.js:547), else `http<n>`. Bodies are de-chunked but NOT
    * content-decoded — exactly the bytes ITEM-HASH digests
    * (decode.js:766-773). The nth non-interim response pairs with the
    * nth request for URI naming.
    */
  def namedBodies(clientStream: Array[Byte],
      serverStream: Array[Byte]): Seq[(String, Array[Byte])] = {
    val reqs = messages(clientStream, isResponse = false)
      .filter(m => methods.contains(m.firstLine.takeWhile(_ != ' ')))
    val resps0 = messages(serverStream, isResponse = true,
      reqMethods = reqs.map(_.firstLine.takeWhile(_ != ' ')))
      .filter(_.firstLine.startsWith("HTTP/"))
    // response-only captures: responses on the CLIENT stream (the same
    // srcResps path parse() digests into httpMd5 — a stored hash must
    // resolve here too)
    val resps =
      if (reqs.nonEmpty) resps0
      else resps0 ++ messages(clientStream, isResponse = true)
        .filter(_.firstLine.startsWith("HTTP/"))
    def hdr(m: Message, name: String): Option[String] =
      m.headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    val nameRe = "(?i)(?:filename|name)\\s*=\\s*\"?([^\";]+)".r
    def headerName(m: Message): Option[String] =
      Seq("Content-Disposition", "Content-Type").flatMap(hdr(m, _))
        .flatMap(v => nameRe.findFirstMatchIn(v).map(_.group(1).trim))
        .find(_.nonEmpty)
    def uriName(i: Int): Option[String] =
      reqs.lift(i).flatMap(_.firstLine.split(" ").lift(1))
        .flatMap(_.split("[/?=]").lastOption).filter(_.nonEmpty)
    val finalResps = resps.filter(r =>
      r.firstLine.split(" ").lift(1).flatMap(_.toIntOption)
        .forall(_ / 100 != 1))
    var n = 0
    val out = Seq.newBuilder[(String, Array[Byte])]
    def add(m: Message, reqIdx: Int): Unit =
      if (m.complete && m.body.nonEmpty) {
        n += 1
        out += ((headerName(m).orElse(uriName(reqIdx)).getOrElse(s"http$n"),
          m.body))
      }
    reqs.zipWithIndex.foreach { case (m, i) => add(m, i) }
    finalResps.zipWithIndex.foreach { case (m, i) => add(m, i) }
    out.result()
  }

  /** ITEM-HTTP's display split (viewer/decode.js ItemHTTPStream): per
    * message, the raw header block (incl. separator bytes) at its
    * stream offset, then — when a framed body exists — the de-chunked
    * body at the body's offset. The Boolean flags body items.
    */
  def displayItems(stream: Array[Byte],
      isResponse: Boolean): Seq[(Long, Array[Byte], Boolean)] =
    messages(stream, isResponse).flatMap { m =>
      val header = (m.start.toLong,
        java.util.Arrays.copyOfRange(stream, m.start,
          math.min(m.bodyOff, stream.length)), false)
      if (m.body.nonEmpty) Seq(header, (m.bodyOff.toLong, m.body, true))
      else Seq(header)
    }

  /** Request-target of each client-direction message, in order (names
    * the HTTP body items, decode.js onHeadersComplete).
    */
  def requestUris(stream: Array[Byte]): Seq[String] =
    messages(stream, isResponse = false)
      .filter(m => methods.contains(m.firstLine.takeWhile(_ != ' ')))
      .flatMap(m => m.firstLine.split(" ").lift(1))

  /** Hex digests of a body as ITEM-HASH computes them. */
  def bodyDigests(b: Array[Byte]): (String, String) = (md5hex(b), sha256hex(b))

  def parse(clientStream: Array[Byte], serverStream: Array[Byte]): Option[HttpInfo] = {
    val reqs = messages(clientStream, isResponse = false)
      .filter(m => methods.contains(m.firstLine.takeWhile(_ != ' ')))
    val resps = messages(serverStream, isResponse = true,
      reqMethods = reqs.map(_.firstLine.takeWhile(_ != ' ')))
      .filter(_.firstLine.startsWith("HTTP/"))
    // single-packet / response-only captures: the responder IS the
    // session src; the reference still records status + headers, with
    // header attribution by DIRECTION (src → requestHeader) — see the
    // single-packets golden
    val srcResps =
      if (reqs.nonEmpty) Seq.empty
      else messages(clientStream, isResponse = true)
        .filter(_.firstLine.startsWith("HTTP/"))
    if (reqs.isEmpty && resps.isEmpty && srcResps.isEmpty) return None

    def d[T](xs: Seq[T]): Seq[T] = xs.distinct
    def hs(ms: Seq[Message], name: String): Seq[String] =
      ms.flatMap(_.headers.collect {
        case (k, v) if k.equalsIgnoreCase(name) => v
      })

    val reqLine = reqs.map(_.firstLine.split(" "))
    // the Host header lands in http.host TWICE when it carries a port:
    // raw via the configured-header add (http.c:1033), port-stripped at
    // message complete (http.c:605-609)
    val hosts = hs(reqs, "Host").map(_.toLowerCase)
      .flatMap { h =>
        // bracketed v6 literals keep their colons: [::1]:8080 strips to
        // [::1], never to the '[' a first-colon cut would produce
        val portless =
          if (h.startsWith("[")) {
            val i = h.indexOf(']')
            if (i >= 0) h.substring(0, i + 1) else h
          } else h.takeWhile(_ != ':')
        if (portless != h) Seq(h, portless) else Seq(h)
      }
    // moloch urlString assembly (http.c:604-667): with a Host header,
    // origin-form targets get host prepended; an absolute/authority
    // target keeps the url alone when the host appears in its first 8
    // bytes, else host ";" url marks the mismatch. WITHOUT a Host header
    // the raw url is the uri and — reference quirk — the url is never
    // path-parsed (parse_url runs only in the host+url branch).
    val reqHostTarget = reqs.map { m =>
      val t = m.firstLine.split(" ").lift(1).getOrElse("")
      val host = m.headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Host") => v.toLowerCase
      }
      (host, t)
    }
    val uris = reqHostTarget.map {
      case (Some(h), t) if t.startsWith("/") => h + t
      case (Some(h), t) =>
        val idx = t.indexOf(h)
        if (idx >= 0 && idx <= 8) t else h + ";" + t
      case (None, t) => t
    }
    val parsedTargets = reqHostTarget.collect { case (Some(_), t) => t }
    val paths = parsedTargets.map(_.takeWhile(_ != '?'))
    // query segments are %XX-decoded before storing (parse_url's
    // g_uri_unescape_segment; '+' is NOT a space there), invalid
    // escapes keep the raw text, and empty segments are skipped
    def unescape(s: String): String = {
      // indexOf(char), not contains(char): Scala routes a Char contains
      // through boxed SeqOps elem search — this fast path runs per URI
      // path segment and query key/value and was visible in the profile
      if (s.indexOf('%') < 0) return s
      val out = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%') {
          if (i + 2 >= s.length) return s
          val hi = Character.digit(s.charAt(i + 1), 16)
          val lo = Character.digit(s.charAt(i + 2), 16)
          if (hi < 0 || lo < 0 || (hi == 0 && lo == 0)) return s // %00 fails g_uri_unescape
          out.append(((hi << 4) | lo).toChar)
          i += 3
        } else { out.append(c); i += 1 }
      }
      out.toString
    }
    // exact parse_url walk (http.c:204-243): '&' flushes the segment and
    // resets to key, '=' flushes and switches to value — so "a=b=c"
    // yields key a with values b AND c; empty segments are skipped
    val queryPairs = parsedTargets.flatMap { t =>
      val q = t.dropWhile(_ != '?').drop(1)
      if (q.isEmpty) Nil
      else {
        val out = Seq.newBuilder[(String, String)]
        var isKey = true
        var start = 0
        def flush(endEx: Int): Unit = {
          if (endEx > start) {
            val seg = unescape(q.substring(start, endEx))
            out += (if (isKey) (seg, "") else ("", seg))
          }
        }
        var i = 0
        while (i < q.length) {
          q.charAt(i) match {
            case '&' => flush(i); start = i + 1; isKey = true
            case '=' => flush(i); start = i + 1; isKey = false
            case _   =>
          }
          i += 1
        }
        if (!isKey) flush(q.length) // C flushes the tail only in value state
        out.result()
      }
    }
    val cookiePairs = hs(reqs, "Cookie").flatMap(_.split(";").toSeq).flatMap { c =>
      val i = c.indexOf('=')
      if (i <= 0) None
      else Some((c.substring(0, i).trim, c.substring(i + 1).trim))
    }
    val auth = hs(reqs, "Authorization").flatMap { v =>
      val parts = v.trim.split(" ", 2)
      if (parts.length < 2) None
      else parts(0).toLowerCase match {
        case "basic" =>
          try {
            val dec = new String(java.util.Base64.getDecoder.decode(parts(1).trim),
              StandardCharsets.ISO_8859_1)
            Some(dec.takeWhile(_ != ':'))
          } catch { case _: IllegalArgumentException => None }
        case "digest" =>
          "username=\"([^\"]*)\"".r.findFirstMatchIn(parts(1)).map(_.group(1))
        case _ => None
      }
    }.filter(_.nonEmpty)
    val bodies = (reqs ++ resps ++ srcResps).filter(_.complete).map(_.body)
      .filter(_.nonEmpty)

    Some(HttpInfo(
      method = d(reqLine.flatMap(_.headOption)),
      uri = d(uris.filter(_.nonEmpty)),
      host = d(hosts),
      path = d(paths.filter(_.nonEmpty)),
      key = d(queryPairs.map(_._1).filter(_.nonEmpty)),
      value = d(queryPairs.map(_._2).filter(_.nonEmpty)),
      statuscode = d((resps ++ srcResps).flatMap(_.firstLine.split(" ").lift(1))
        .flatMap(_.toIntOption)),
      useragent = d(hs(reqs, "User-Agent")),
      clientVersion = d(reqLine.flatMap(_.lift(2))
        .filter(_.startsWith("HTTP/")).map(_.stripPrefix("HTTP/"))),
      serverVersion = d((resps ++ srcResps).map(_.firstLine.split(" ").head)
        .filter(_.startsWith("HTTP/")).map(_.stripPrefix("HTTP/"))),
      requestHeader = d((reqs ++ srcResps)
        .flatMap(_.headers.map(_._1.toLowerCase))).sorted,
      responseHeader = d(resps.flatMap(_.headers.map(_._1.toLowerCase))).sorted,
      referer = d(hs(reqs, "Referer")),
      location = d(hs(resps, "Location")),
      cookieKey = d(cookiePairs.map(_._1)),
      cookieValue = d(cookiePairs.map(_._2).filter(_.nonEmpty)),
      md5 = d(bodies.map(md5hex)),
      sha256 = d(bodies.map(sha256hex)),
      // small request bodies (first chunk, <= maxReqBody, valid UTF-8;
      // http.c:307-311 with the test config's maxReqBody=2000)
      // urlWhich defaults to the src direction, so a response-only
      // session's body (srcResps) lands in requestBody too
      requestBody = d((reqs ++ srcResps).map(_.body)
        .filter(b => b.length > 0 && b.length <= 2000)
        .flatMap(utf8OrNone)),
      authUser = d(auth),
      // magic runs on every body's head bytes at on_body time - not
      // gated on message completeness (http.c:304)
      bodyMagic = d((reqs ++ resps ++ srcResps).map(_.body)
        .filter(_.nonEmpty).flatMap(Magic.detect)),
      // parseHTTPHeaderRequestAll/ResponseAll (config.test.ini both on):
      // any header WITHOUT its own field — the built-in request trio
      // (x-forwarded-for, user-agent, host; http.c:1031-1033) and the
      // configured headers-http-request/-response entries — lands as
      // lowercased name in *HeaderField and lowercased ≤1024-byte value
      // in *HeaderValue (http.c:126-127 add_lower). Cookie/authorization
      // still ALSO promote to their own fields separately.
      requestHeaderField = d((reqs ++ srcResps).flatMap(
        _.headers.map(_._1.toLowerCase).filterNot(ReqOwnHeaders))).sorted,
      // header VALUES are STR_ARRAY (not a set): every occurrence is
      // appended, so duplicates survive and <field>Cnt counts them
      // (http.c:896-910 MOLOCH_FIELD_TYPE_STR_ARRAY + FLAG_CNT)
      requestHeaderValue = (reqs ++ srcResps).flatMap(
        _.headers.filterNot(h => ReqOwnHeaders(h._1.toLowerCase))
          .map(h => h._2.take(1024).toLowerCase)).filter(_.nonEmpty),
      responseHeaderField = d(resps.flatMap(
        _.headers.map(_._1.toLowerCase).filterNot(RespOwnHeaders))).sorted,
      responseHeaderValue = resps.flatMap(
        _.headers.filterNot(h => RespOwnHeaders(h._1.toLowerCase))
          .map(h => h._2.take(1024).toLowerCase)).filter(_.nonEmpty),
      // authType = the scheme token, lowered, only when a space follows
      // (moloch_http_parse_authorization early-returns without one)
      authType = d(hs(reqs, "Authorization").map(_.trim)
        .filter(_.contains(" ")).map(_.split(" ", 2).head.toLowerCase)),
      authorization = d(hs(reqs, "Authorization")),
      xffIp = d(hs(reqs ++ srcResps, "X-Forwarded-For")
        .flatMap(_.split(","))
        .flatMap(v => parseXffAddr(v.trim))),
      passwordInBody = (reqs ++ resps ++ srcResps).exists { m =>
        // the reference checks only the FIRST on_body chunk — bound the
        // scan to the body head so a large download can't false-tag
        val head = new String(m.body.take(1460), StandardCharsets.ISO_8859_1)
          .toLowerCase
        head.contains("password=") || head.contains("passwd=") ||
          head.contains("pass=")
      }))
  }

  /** One XFF list member → canonical address text. The reference parses
    * dotted members with inet_aton (field.c:832-847), which accepts
    * octal/hex octets and partial forms — "10.000.000.03" is 10.0.0.3 —
    * then renders back through the usual v4 writer.
    */
  private def parseXffAddr(s: String): Option[String] = {
    if (s.isEmpty) return None
    if (s.contains(".")) {
      val parts = s.split("\\.", -1)
      if (parts.isEmpty || parts.length > 4 || parts.exists(_.isEmpty))
        return None
      val nums = parts.map { t =>
        try {
          val v =
            if (t.length > 1 && (t.startsWith("0x") || t.startsWith("0X")))
              java.lang.Long.parseLong(t.substring(2), 16)
            else if (t.length > 1 && t.charAt(0) == '0')
              java.lang.Long.parseLong(t, 8)
            else java.lang.Long.parseLong(t)
          if (v < 0) return None else v
        } catch { case _: NumberFormatException => return None }
      }
      // inet_aton: the final part fills the remaining bytes
      val tailBytes = 4 - (nums.length - 1)
      if (nums.init.exists(_ > 255) ||
        nums.last >= (1L << (8 * tailBytes))) return None
      val all = nums.init ++ (tailBytes - 1 to 0 by -1)
        .map(i => (nums.last >> (8 * i)) & 0xff)
      Some(all.mkString("."))
    } else {
      try Option(graft.functions.IpUtil.toBytes(s))
        .map(graft.functions.IpUtil.canonical)
      catch { case _: Exception => None }
    }
  }

  /** Request headers with fields of their own: the three built-ins
    * http.c registers (1031-1033) plus the reference test config's
    * [headers-http-request] referer/authorization.
    */
  private[etl] val ReqOwnHeaders =
    Set("x-forwarded-for", "user-agent", "host", "referer", "authorization")

  /** [headers-http-response] in the test config: location only. */
  private[etl] val RespOwnHeaders = Set("location")
}
