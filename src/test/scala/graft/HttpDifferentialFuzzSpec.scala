package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.HttpParser

/** Differential fuzz of the HTTP walker against an independent
  * transcription of the reference stack: thirdparty/http_parser.c (the
  * joyent fork, compiled NON-STRICT — Makefile.in:88 passes
  * -DHTTP_PARSER_STRICT=0, so every STRICT_CHECK is a no-op and
  * NEW_MESSAGE() never enters s_dead) driving parsers/http.c's callback
  * layer. The model walks crafted per-direction streams byte-by-byte
  * exactly like http_parser_execute and feeds transcriptions of the
  * moloch_hp_cb_* callbacks; the spec then compares the field surface
  * both sides emit.
  *
  * Scope notes (deliberate):
  *  - one execute() call per direction (the batch pipeline parses fully
  *    reassembled streams, so per-packet callback chunking — which the
  *    reference's requestBody/password/magic first-chunk gates can see —
  *    is out of reach by construction; the generator frames sessions
  *    accordingly).
  *  - CONNECT and Upgrade messages ARE generated: both machines
  *    complete the message at headers-done and re-enter the start state
  *    with the remaining bytes, exactly like moloch's driver loop
  *    (http.c:726-740 has no upgrade gate). The session-level
  *    reclassify/unregister of LATER packets is SessionBuilder's job,
  *    pinned by goldens.
  *  - Content-Length/chunk-size generators reach the u64-overflow
  *    branches (2^63 parses and clamps, ULLONG_MAX/wrap errors), and a
  *    rare 90 KiB header exercises HTTP_MAX_HEADER_SIZE.
  */
class HttpDifferentialFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------------
  // Reference model: http_parser.c states (non-strict) + http.c callbacks
  // ---------------------------------------------------------------------

  /** method_strings, http_parser.h:79-107 (index = enum http_method). */
  private val MethodStrings = Array(
    "DELETE", "GET", "HEAD", "POST", "PUT", "CONNECT", "OPTIONS", "TRACE",
    "COPY", "LOCK", "MKCOL", "MOVE", "PROPFIND", "PROPPATCH", "SEARCH",
    "UNLOCK", "REPORT", "MKACTIVITY", "CHECKOUT", "MERGE", "M-SEARCH",
    "NOTIFY", "SUBSCRIBE", "UNSUBSCRIBE", "PATCH", "PURGE")

  /** tokens[256] (http_parser.c:145-178) — 0 means not a token char;
    * non-strict TOKEN() additionally maps ' ' to itself
    * (http_parser.c:375).
    */
  private def tokenChar(ch: Int): Char = {
    if (ch == ' ') return ' ' // non-strict TOKEN()
    val c = ch.toChar
    if (c >= 'A' && c <= 'Z') (c + 32).toChar
    else if (c >= 'a' && c <= 'z') c
    else if (c >= '0' && c <= '9') c
    else c match {
      case '!' | '#' | '$' | '%' | '&' | '\'' | '*' | '+' | '-' | '.' |
           '^' | '_' | '`' | '|' | '~' => c
      case _ => 0.toChar
    }
  }

  /** normal_url_char bitmap + non-strict extensions (http_parser.c:198,
    * 376): printable except space/del, minus '#' and '?', PLUS ht/np
    * (the T() entries) and any byte with the high bit set.
    */
  private def isUrlChar(ch: Int): Boolean = {
    if ((ch & 0x80) != 0) return true
    if (ch == '\t' || ch == 12) return true // T(2)/T(16) non-strict
    if (ch <= 32 || ch == 127) return false
    ch != '#' && ch != '?'
  }

  private def isMark(c: Int): Boolean =
    c == '-' || c == '_' || c == '.' || c == '!' || c == '~' || c == '*' ||
      c == '\'' || c == '(' || c == ')'
  private def isAlphaNum(c: Int): Boolean =
    Character.isLetterOrDigit(c.toChar) && c < 128
  private def isUserinfoChar(c: Int): Boolean =
    isAlphaNum(c) || isMark(c) || c == '%' || c == ';' || c == ':' ||
      c == '&' || c == '=' || c == '+' || c == '$' || c == ','

  private def unhex(c: Int): Int = Character.digit(c.toChar, 16)

  // http_parser states (the subset reachable by the generator)
  private object S {
    val Dead = 0
    val StartReqOrRes = 1; val ResOrRespH = 2
    val ResH = 3; val ResHT = 4; val ResHTT = 5; val ResHTTP = 6
    val ResFirstMajor = 7; val ResMajor = 8; val ResFirstMinor = 9
    val ResMinor = 10; val ResFirstStatus = 11; val ResStatus = 12
    val ResStatusText = 13; val ResLineAlmostDone = 14
    val StartReq = 15; val ReqMethod = 16; val ReqSpacesBeforeUrl = 17
    val ReqSchema = 18; val ReqSchemaSlash = 19; val ReqSchemaSlashSlash = 20
    val ReqServerStart = 21; val ReqServer = 22; val ReqServerWithAt = 23
    val ReqPath = 24; val ReqQueryStringStart = 25; val ReqQueryString = 26
    val ReqFragmentStart = 27; val ReqFragment = 28
    val ReqHttpStart = 29; val ReqHttpH = 30; val ReqHttpHT = 31
    val ReqHttpHTT = 32; val ReqHttpHTTP = 33
    val ReqFirstMajor = 34; val ReqMajor = 35; val ReqFirstMinor = 36
    val ReqMinor = 37; val ReqLineAlmostDone = 38
    val HeaderFieldStart = 39; val HeaderField = 40
    val HeaderValueStart = 41; val HeaderValue = 42
    val HeaderAlmostDone = 43; val HeaderValueLws = 44
    val HeadersAlmostDone = 45; val HeadersDone = 46
    val BodyIdentity = 47; val BodyIdentityEof = 48; val MessageDone = 49
    val ChunkSizeStart = 50; val ChunkSize = 51; val ChunkParameters = 52
    val ChunkSizeAlmostDone = 53; val ChunkData = 54
    val ChunkDataAlmostDone = 55; val ChunkDataDone = 56
  }
  // header_state values
  private object H {
    val General = 0; val C = 1; val CO = 2; val CON = 3
    val MatchingConnection = 4; val MatchingProxyConnection = 5
    val MatchingContentLength = 6; val MatchingTransferEncoding = 7
    val MatchingUpgrade = 8
    val Connection = 9; val ContentLength = 10; val TransferEncoding = 11
    val Upgrade = 12
    val MatchingTEChunked = 13; val MatchingKeepAlive = 14
    val MatchingClose = 15
    val TEChunked = 16; val KeepAlive = 17; val Close = 18
  }
  private val FChunked = 1; private val FTrailing = 2; private val FUpgrade = 4

  /** Session-level callback state (HTTPInfo_t + the field adds we
    * compare). Directions share urlString/hostString/etc exactly like
    * the C struct.
    */
  private final class Sess {
    import scala.collection.mutable.{ArrayBuffer, LinkedHashSet}
    val method = LinkedHashSet[String]()
    val statuscode = LinkedHashSet[Int]()
    val verReq = LinkedHashSet[String]()
    val verRes = LinkedHashSet[String]()
    val reqHdr = LinkedHashSet[String]()
    val respHdr = LinkedHashSet[String]()
    val ua = LinkedHashSet[String]()
    val referer = LinkedHashSet[String]()
    val location = LinkedHashSet[String]()
    val host = LinkedHashSet[String]()
    val uris = LinkedHashSet[String]()
    val paths = LinkedHashSet[String]()
    val keys = LinkedHashSet[String]()
    val vals = LinkedHashSet[String]()
    val md5s = LinkedHashSet[String]()
    val reqBody = LinkedHashSet[String]()

    // HTTPInfo_t: char header[2][40]; per-direction flags; shared GStrings
    val headerBuf = Array(new StringBuilder, new StringBuilder)
    val inHeader = Array(false, false)
    val inValue = Array(false, false)
    val inBody = Array(false, false)
    val pos = Array(0, 0) // 0 none; 1 ua; 2 host; 3 referer; 4 xff; 5 auth; 6 reqAll; 7 location; 8 respAll
    val valueString = Array(new StringBuilder, new StringBuilder)
    val digest = Array.fill(2)(java.security.MessageDigest.getInstance("MD5"))
    var urlString: StringBuilder = null
    var urlWhich = 0
    var hostString: StringBuilder = null

    def messageBegin(which: Int): Unit = {
      inHeader(which) = false; inValue(which) = false; inBody(which) = false
      digest(which).reset()
    }

    /** moloch_hp_cb_on_url — appends; urlWhich set on first. */
    def onUrl(which: Int, s: String): Unit = {
      if (urlString == null) { urlString = new StringBuilder(s); urlWhich = which }
      else urlString.append(s)
    }

    /** http.c:438-455 — reset value state, flush pending captured value,
      * append RAW name bytes into the 40-byte buffer.
      */
    def onHeaderField(which: Int, s: String): Unit = {
      if (inValue(which)) {
        inValue(which) = false
        headerBuf(which).setLength(0)
        if (pos(which) != 0) addValue(which)
      }
      if (!inHeader(which)) inHeader(which) = true
      val len = headerBuf(which).length
      val remaining = 40 - len
      if (remaining > 1) headerBuf(which).append(s.take(remaining - 1))
    }

    private val ReqOwn = Map("user-agent" -> 1, "host" -> 2,
      "referer" -> 3, "x-forwarded-for" -> 4, "authorization" -> 5)

    /** http.c:459-545 — first value byte classifies the header (name so
      * far, lowered), records the name, then appends value bytes into
      * the promoted GStrings and (pos != 0) valueString.
      */
    def onHeaderValue(which: Int, s: String, dirMethodNonzero: Boolean): Unit = {
      if (!inValue(which)) {
        inValue(which) = true
        val lower = headerBuf(which).toString.toLowerCase(java.util.Locale.ROOT)
        // own-header lookup + name tags key on urlWhich (http.c:475-499);
        // the catch-all adds key on the RAW direction (http.c:484-492)
        pos(which) =
          if (which == urlWhich) ReqOwn.getOrElse(lower, 0)
          else if (lower == "location") 7
          else 0
        if (pos(which) == 0) pos(which) = if (which == 0) 6 else 8
        if (which == urlWhich) reqHdr += lower else respHdr += lower
      }
      // request side (parser->method != 0 — note DELETE == 0!)
      if (dirMethodNonzero) {
        val name = headerBuf(which).toString
        if (name.equalsIgnoreCase("host")) {
          if (hostString == null) hostString = new StringBuilder(s)
          else hostString.append(s)
        }
        // cookie/authorization/proxy-authorization accumulate the same
        // way; their derived fields aren't in the compared surface
      }
      if (pos(which) != 0) valueString(which).append(s)
    }

    /** http_add_value (http.c:407-416) via http_common_add_header_value
      * (isspace skip; *HeaderValue lowers+truncates — not compared).
      */
    private def addValue(which: Int): Unit = {
      val raw = valueString(which).toString
      val v = raw.dropWhile(c => c == ' ' || c == '\t' || c == '\n' ||
        c == '\r' || c == 11.toChar || c == 12.toChar)
      // moloch_field_string_add has no emptiness gate: valueless headers
      // record empty strings (socks5-reverse golden)
      pos(which) match {
        case 1 => ua += v
        case 3 => referer += v
        case 2 => host += v.toLowerCase(java.util.Locale.ROOT) // lotermfield
        case 7 => location += v
        case _ => // xff/auth/catch-all values not compared
      }
      valueString(which).setLength(0)
      pos(which) = 0
    }

    def onBody(which: Int, bytes: Array[Byte]): Unit = {
      if (!inBody(which)) {
        inBody(which) = true
        if (which == urlWhich && bytes.length <= 2000 && bytes.nonEmpty) {
          utf8(bytes).foreach(reqBody += _)
        }
      }
      digest(which).update(bytes)
    }

    private def utf8(b: Array[Byte]): Option[String] =
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
      } catch { case _: java.nio.charset.CharacterCodingException => None }

    /** moloch_hp_cb_on_headers_complete (http.c:541-700). */
    def headersComplete(which: Int, statusCode: Int, methodIdx: Int,
        major: Int, minor: Int): Unit = {
      val version = s"$major.$minor"
      if (statusCode == 0) {
        method += MethodStrings(methodIdx)
        verReq += version
      } else {
        statuscode += statusCode
        verRes += version
      }
      if (inValue(which) && pos(which) != 0) addValue(which)
      headerBuf(0).setLength(0); headerBuf(1).setLength(0)
      if (hostString != null)
        hostString = new StringBuilder(
          hostString.toString.toLowerCase(java.util.Locale.ROOT))
      if (urlString != null && hostString != null) {
        val url = urlString.toString
        val hostS = hostString.toString
        val colon = hostS.indexOf(':')
        host += (if (colon >= 0) hostS.substring(0, colon) else hostS)
        // http_common_parse_url (http.c:198-245), run ONLY in the
        // host+url branch: path before '?', then the '&'/'=' walk with
        // g_uri_unescape_segment per non-empty segment (tail flushed
        // only in value state)
        locally {
          val path = url.takeWhile(_ != '?')
          if (path.nonEmpty) paths += path
          val qi = url.indexOf('?')
          if (qi >= 0) {
            val q = url.substring(qi + 1)
            var isKey = true
            var start = 0
            def unesc(seg: String): String = {
              if (seg.indexOf('%') < 0) return seg
              val out = new java.lang.StringBuilder(seg.length)
              var j = 0
              while (j < seg.length) {
                val c = seg.charAt(j)
                if (c == '%') {
                  if (j + 2 >= seg.length) return seg
                  val hi = Character.digit(seg.charAt(j + 1), 16)
                  val lo = Character.digit(seg.charAt(j + 2), 16)
                  if (hi < 0 || lo < 0 || (hi == 0 && lo == 0)) return seg
                  out.append(((hi << 4) | lo).toChar)
                  j += 3
                } else { out.append(c); j += 1 }
              }
              out.toString
            }
            def flush(endEx: Int): Unit =
              if (endEx > start) {
                val seg = unesc(q.substring(start, endEx))
                if (seg.nonEmpty) { if (isKey) keys += seg else vals += seg }
              }
            var j = 0
            while (j < q.length) {
              q.charAt(j) match {
                case '&' => flush(j); start = j + 1; isKey = true
                case '=' => flush(j); start = j + 1; isKey = false
                case _   =>
              }
              j += 1
            }
            if (!isKey) flush(q.length)
          }
        }
        if (url.nonEmpty && url.charAt(0) != '/') {
          val idx = url.indexOf(hostS)
          if (hostS.nonEmpty && idx >= 0 && idx <= 8) uris += url
          else uris += hostS + ";" + url
        } else uris += hostS + url
        urlString = null; hostString = null
      } else if (urlString != null) {
        uris += urlString.toString
        urlString = null
      } else if (hostString != null) {
        val hostS = hostString.toString
        val colon = hostS.indexOf(':')
        host += (if (colon >= 0) hostS.substring(0, colon) else hostS)
        hostString = null
      }
    }

    /** moloch_hp_cb_on_message_complete — md5 only when a body byte ran
      * through on_body (http.c:394-400).
      */
    def messageComplete(which: Int): Unit = {
      if (inBody(which))
        md5s += graft.etl.Hex.hex(digest(which).digest())
    }
  }

  /** One direction's http_parser transcription (HTTP_BOTH init). */
  private final class DirParser(sess: Sess, which: Int) {
    import S._
    var state = StartReqOrRes
    var headerState = H.General
    var index = 0
    var flags = 0
    var contentLength = -1L // ULLONG_MAX sentinel
    var httpMajor = 0; var httpMinor = 0
    var statusCode = 0
    var method = 0
    var isResponseMsg = false
    var dead = false
    var nread = 0

    private def err(): Unit = { dead = true }

    def execute(data: Array[Byte]): Unit = {
      var p = 0
      // marks (indices into data, -1 = unset)
      var fieldMark, valueMark, urlMark, bodyMark = -1
      def cbField(endEx: Int): Unit =
        if (fieldMark >= 0) {
          sess.onHeaderField(which, new String(data, fieldMark,
            endEx - fieldMark, StandardCharsets.ISO_8859_1))
          fieldMark = -1
        }
      def cbValue(endEx: Int): Unit =
        if (valueMark >= 0) {
          sess.onHeaderValue(which, new String(data, valueMark,
            endEx - valueMark, StandardCharsets.ISO_8859_1), method != 0)
          valueMark = -1
        }
      def cbUrl(endEx: Int): Unit =
        if (urlMark >= 0) {
          sess.onUrl(which, new String(data, urlMark, endEx - urlMark,
            StandardCharsets.ISO_8859_1))
          urlMark = -1
        }
      def cbBody(endEx: Int): Unit =
        if (bodyMark >= 0) {
          sess.onBody(which,
            java.util.Arrays.copyOfRange(data, bodyMark, endEx))
          bodyMark = -1
        }
      def headersDone(): Unit =
        sess.headersComplete(which, statusCode, method, httpMajor, httpMinor)
      def msgDone(): Unit = sess.messageComplete(which)
      // NEW_MESSAGE() non-strict = start state (HTTP_BOTH). Nothing else
      // resets: status_code/method/http_major persist across messages
      // (the http.c:557-564 keying quirk reads the stale values).
      def newMessage(): Int = {
        isResponseMsg = false
        StartReqOrRes
      }

      while (p < data.length && !dead) {
        val ch = data(p) & 0xff
        // nread budget (http_parser.c:637-643): every state up to and
        // including s_headers_done — the enum places the chunk-size-line
        // states BEFORE it — counts toward HTTP_MAX_HEADER_SIZE (80 KiB)
        if (state <= S.HeadersDone ||
          (state >= S.ChunkSizeStart && state <= S.ChunkSizeAlmostDone)) {
          nread += 1
          if (nread > 80 * 1024) err()
        }
        var redo = true
        while (redo && !dead) {
          redo = false
          state match {
            case StartReqOrRes =>
              if (ch != '\r' && ch != '\n') {
                flags = 0; contentLength = -1L
                if (ch == 'H') {
                  state = ResOrRespH
                  sess.messageBegin(which)
                } else { state = StartReq; redo = true }
              }
            case ResOrRespH =>
              if (ch == 'T') { isResponseMsg = true; state = ResHT }
              else if (ch == 'E') { method = 2 /* HEAD */; index = 2; state = ReqMethod }
              else err()
            // non-strict: s_res_H..s_res_HTTP STRICT_CHECKs are no-ops
            case ResH => state = ResHT
            case ResHT => state = ResHTT
            case ResHTT => state = ResHTTP
            case ResHTTP => state = ResFirstMajor
            case ResFirstMajor =>
              if (ch >= '0' && ch <= '9') { httpMajor = ch - '0'; state = ResMajor }
              else err()
            case ResMajor =>
              if (ch == '.') state = ResFirstMinor
              else if (ch >= '0' && ch <= '9') httpMajor = httpMajor * 10 + (ch - '0')
              else err()
            case ResFirstMinor =>
              if (ch >= '0' && ch <= '9') { httpMinor = ch - '0'; state = ResMinor }
              else err()
            case ResMinor =>
              if (ch == ' ') state = ResFirstStatus
              else if (ch >= '0' && ch <= '9') httpMinor = httpMinor * 10 + (ch - '0')
              else err()
            case ResFirstStatus =>
              if (ch >= '0' && ch <= '9') { statusCode = ch - '0'; state = ResStatus }
              else if (ch != ' ') err()
            case ResStatus =>
              if (ch >= '0' && ch <= '9') {
                statusCode = statusCode * 10 + (ch - '0')
                if (statusCode > 999) err()
              }
              else if (ch == ' ') state = ResStatusText
              else if (ch == '\r') state = ResLineAlmostDone
              else if (ch == '\n') state = HeaderFieldStart
              else err()
            case ResStatusText =>
              if (ch == '\r') state = ResLineAlmostDone
              else if (ch == '\n') state = HeaderFieldStart
            case ResLineAlmostDone =>
              // non-strict: any byte accepted as the LF
              state = HeaderFieldStart
            case StartReq =>
              if (ch != '\r' && ch != '\n') {
                flags = 0; contentLength = -1L
                val c = ch.toChar
                val m = c match {
                  case 'C' => 5 /* CONNECT */
                  case 'D' => 0; case 'G' => 1; case 'H' => 2; case 'L' => 9
                  case 'M' => 10; case 'N' => 21; case 'O' => 6
                  case 'P' => 3; case 'R' => 16; case 'S' => 22
                  case 'T' => 7; case 'U' => 15
                  case _ => -1
                }
                if (m < 0) err()
                else {
                  method = m; index = 1; state = ReqMethod
                  sess.messageBegin(which)
                }
              }
            case ReqMethod =>
              if (ch == 0) err()
              else {
                val matcher = MethodStrings(method)
                if (ch == ' ' && index == matcher.length) state = ReqSpacesBeforeUrl
                else if (index < matcher.length && ch.toChar == matcher.charAt(index)) ()
                else if (method == 5 /* CONNECT */ ) {
                  if (index == 1 && ch == 'H') method = 18 // CHECKOUT
                  else if (index == 2 && ch == 'P') method = 8 // COPY
                  else err()
                } else if (method == 10 /* MKCOL */ ) {
                  if (index == 1 && ch == 'O') method = 11 // MOVE
                  else if (index == 1 && ch == 'E') method = 19 // MERGE
                  else if (index == 1 && ch == '-') method = 20 // M-SEARCH
                  else if (index == 2 && ch == 'A') method = 17 // MKACTIVITY
                  else err()
                } else if (method == 22 /* SUBSCRIBE */ ) {
                  if (index == 1 && ch == 'E') method = 14 // SEARCH
                  else err()
                } else if (index == 1 && method == 3 /* POST */ ) {
                  if (ch == 'R') method = 12      // PROPFIND (or PROPPATCH)
                  else if (ch == 'U') method = 4  // PUT (or PURGE)
                  else if (ch == 'A') method = 24 // PATCH
                  else err()
                } else if (index == 2) {
                  // no error path at index 2 (http_parser.c:964-969):
                  // only the PUT→PURGE / UNLOCK→UNSUBSCRIBE remaps
                  if (method == 4 && ch == 'R') method = 25 // PURGE
                  else if (method == 15 && ch == 'S') method = 23 // UNSUBSCRIBE
                } else if (index == 4 && method == 12 && ch == 'P')
                  method = 13 // PROPPATCH
                else err()
                if (!dead) index += 1
              }
            case ReqSpacesBeforeUrl =>
              if (ch != ' ') {
                urlMark = p
                // CONNECT pre-seeds the authority-form server state
                // (http_parser.c:985-987)
                state = parseUrlChar(
                  if (method == 5) ReqServerStart else ReqSpacesBeforeUrl, ch)
                if (state == Dead) err()
              }
            case ReqSchema | ReqSchemaSlash | ReqSchemaSlashSlash |
                ReqServerStart =>
              if (ch == ' ' || ch == '\r' || ch == '\n') err()
              else {
                state = parseUrlChar(state, ch)
                if (state == Dead) err()
              }
            case ReqServer | ReqServerWithAt | ReqPath |
                ReqQueryStringStart | ReqQueryString | ReqFragmentStart |
                ReqFragment =>
              if (ch == ' ') { state = ReqHttpStart; cbUrl(p) }
              else if (ch == '\r' || ch == '\n') {
                httpMajor = 0; httpMinor = 9
                state = if (ch == '\r') ReqLineAlmostDone else HeaderFieldStart
                cbUrl(p)
              } else {
                state = parseUrlChar(state, ch)
                if (state == Dead) err()
              }
            case ReqHttpStart =>
              if (ch == 'H') state = ReqHttpH
              else if (ch != ' ') err()
            case ReqHttpH => state = ReqHttpHT // non-strict
            case ReqHttpHT => state = ReqHttpHTT
            case ReqHttpHTT => state = ReqHttpHTTP
            case ReqHttpHTTP => state = ReqFirstMajor
            case ReqFirstMajor =>
              if (ch >= '1' && ch <= '9') { httpMajor = ch - '0'; state = ReqMajor }
              else err()
            case ReqMajor =>
              if (ch == '.') state = ReqFirstMinor
              else if (ch >= '0' && ch <= '9') httpMajor = httpMajor * 10 + (ch - '0')
              else err()
            case ReqFirstMinor =>
              if (ch >= '0' && ch <= '9') { httpMinor = ch - '0'; state = ReqMinor }
              else err()
            case ReqMinor =>
              if (ch == '\r') state = ReqLineAlmostDone
              else if (ch == '\n') state = HeaderFieldStart
              else if (ch >= '0' && ch <= '9') httpMinor = httpMinor * 10 + (ch - '0')
              else err()
            case ReqLineAlmostDone =>
              if (ch != '\n') err()
              else state = HeaderFieldStart
            case HeaderFieldStart =>
              if (ch == '\r') state = HeadersAlmostDone
              else if (ch == '\n') { state = HeadersAlmostDone; redo = true }
              else {
                val c = tokenChar(ch)
                if (c == 0) err()
                else {
                  fieldMark = p
                  index = 0
                  state = HeaderField
                  headerState = c match {
                    case 'c' => H.C
                    case 'p' => H.MatchingProxyConnection
                    case 't' => H.MatchingTransferEncoding
                    case 'u' => H.MatchingUpgrade
                    case _   => H.General
                  }
                }
              }
            case HeaderField =>
              val c = tokenChar(ch)
              if (c != 0) {
                headerState match {
                  case H.General => ()
                  case H.C => index += 1
                    headerState = if (c == 'o') H.CO else H.General
                  case H.CO => index += 1
                    headerState = if (c == 'n') H.CON else H.General
                  case H.CON => index += 1
                    headerState = c match {
                      case 'n' => H.MatchingConnection
                      case 't' => H.MatchingContentLength
                      case _   => H.General
                    }
                  case H.MatchingConnection => index += 1
                    val t = "connection"
                    headerState =
                      if (index >= t.length || c != t.charAt(index)) H.General
                      else if (index == t.length - 1) H.Connection
                      else headerState
                  case H.MatchingProxyConnection => index += 1
                    val t = "proxy-connection"
                    headerState =
                      if (index >= t.length || c != t.charAt(index)) H.General
                      else if (index == t.length - 1) H.Connection
                      else headerState
                  case H.MatchingContentLength => index += 1
                    val t = "content-length"
                    headerState =
                      if (index >= t.length || c != t.charAt(index)) H.General
                      else if (index == t.length - 1) H.ContentLength
                      else headerState
                  case H.MatchingTransferEncoding => index += 1
                    val t = "transfer-encoding"
                    headerState =
                      if (index >= t.length || c != t.charAt(index)) H.General
                      else if (index == t.length - 1) H.TransferEncoding
                      else headerState
                  case H.MatchingUpgrade => index += 1
                    val t = "upgrade"
                    headerState =
                      if (index >= t.length || c != t.charAt(index)) H.General
                      else if (index == t.length - 1) H.Upgrade
                      else headerState
                  case H.Connection | H.ContentLength | H.TransferEncoding |
                      H.Upgrade =>
                    if (ch != ' ') headerState = H.General
                  case _ => ()
                }
              } else if (ch == ':') { state = HeaderValueStart; cbField(p) }
              else if (ch == '\r') { state = HeaderAlmostDone; cbField(p) }
              else if (ch == '\n') { state = HeaderFieldStart; cbField(p) }
              else {
                // ALW MOLOCH patch: missing colon (http_parser.c:1352-1355)
                state = HeaderValueStart; cbField(p)
              }
            case HeaderValueStart =>
              if (ch != ' ' && ch != '\t') {
                valueMark = p
                state = HeaderValue
                index = 0
                if (ch == '\r') {
                  headerState = H.General; state = HeaderAlmostDone; cbValue(p)
                } else if (ch == '\n') { state = HeaderFieldStart; cbValue(p) }
                else {
                  val c = (ch | 0x20).toChar
                  headerState match {
                    case H.Upgrade =>
                      flags |= FUpgrade; headerState = H.General
                    case H.TransferEncoding =>
                      headerState =
                        if (c == 'c') H.MatchingTEChunked else H.General
                    case H.ContentLength =>
                      if (ch < '0' || ch > '9') err()
                      else contentLength = ch - '0'
                    case H.Connection =>
                      headerState =
                        if (c == 'k') H.MatchingKeepAlive
                        else if (c == 'c') H.MatchingClose
                        else H.General
                    case _ => headerState = H.General
                  }
                }
              }
            case HeaderValue =>
              if (ch == '\r') { state = HeaderAlmostDone; cbValue(p) }
              else if (ch == '\n') { state = HeaderAlmostDone; cbValue(p); redo = true }
              else {
                val c = (ch | 0x20).toChar
                headerState match {
                  case H.General => ()
                  case H.ContentLength =>
                    if (ch == ' ') ()
                    else if (ch < '0' || ch > '9') err()
                    else {
                      // t = cl*10+d; err on uint64 wrap or ULLONG_MAX
                      // (http_parser.c:1460-1469)
                      val t = contentLength * 10 + (ch - '0')
                      if (java.lang.Long.compareUnsigned(t, contentLength) < 0
                        || t == -1L) err()
                      else contentLength = t
                    }
                  case H.MatchingTEChunked => index += 1
                    val t = "chunked"
                    headerState =
                      if (index >= t.length || c != t.charAt(index)) H.General
                      else if (index == t.length - 1) H.TEChunked
                      else headerState
                  case H.MatchingKeepAlive => index += 1
                    val t = "keep-alive"
                    headerState =
                      if (index >= t.length || c != t.charAt(index)) H.General
                      else if (index == t.length - 1) H.KeepAlive
                      else headerState
                  case H.MatchingClose => index += 1
                    val t = "close"
                    headerState =
                      if (index >= t.length || c != t.charAt(index)) H.General
                      else if (index == t.length - 1) H.Close
                      else headerState
                  case H.TEChunked | H.KeepAlive | H.Close =>
                    if (ch != ' ') headerState = H.General
                  case _ => headerState = H.General
                }
              }
            case HeaderAlmostDone =>
              // non-strict: the LF check is a no-op — ANY byte advances
              state = HeaderValueLws
              if (headerState == H.TEChunked) flags |= FChunked
            case HeaderValueLws =>
              if (ch == ' ' || ch == '\t') state = HeaderValueStart
              else { state = HeaderFieldStart; redo = true }
            case HeadersAlmostDone =>
              // non-strict LF check no-op
              if ((flags & FTrailing) != 0) {
                state = newMessage()
                msgDone()
              } else {
                state = HeadersDone
                // moloch's on_headers_complete always returns 0 — no
                // F_SKIPBODY ever (the HEAD-response case, VERDICT note)
                headersDone()
                redo = true
              }
            case HeadersDone =>
              nread = 0 // http_parser.c:1609
              // upgrade = F_UPGRADE || method == HTTP_CONNECT
              // (http_parser.c:1571-1572, 1610-1615): message completes,
              // the driver loop re-enters execute at the start state
              // with the remaining bytes (http.c:726-740)
              if ((flags & FUpgrade) != 0 || method == 5) {
                state = newMessage(); msgDone()
              }
              else if ((flags & FChunked) != 0) state = ChunkSizeStart
              else if (contentLength == 0) { state = newMessage(); msgDone() }
              else if (contentLength != -1L) state = BodyIdentity
              else if (!isResponseMsg || !needsEof()) {
                state = newMessage(); msgDone()
              } else state = BodyIdentityEof
            case BodyIdentity =>
              // uint64 MIN (a ≥2^63 Content-Length parses legally)
              val rem = (data.length - p).toLong
              val toRead = (if (java.lang.Long.compareUnsigned(
                contentLength, rem) < 0) contentLength else rem).toInt
              bodyMark = p
              contentLength -= toRead
              p += toRead - 1
              if (contentLength == 0) {
                cbBody(p + 1)
                state = MessageDone
                redo = true
              }
            case BodyIdentityEof =>
              bodyMark = p
              p = data.length - 1
            case MessageDone =>
              state = newMessage()
              msgDone()
            case ChunkSizeStart =>
              val v = unhex(ch)
              if (v == -1) err()
              else { contentLength = v; state = ChunkSize }
            case ChunkSize =>
              if (ch == '\r') state = ChunkSizeAlmostDone
              else {
                val v = unhex(ch)
                if (v == -1) {
                  if (ch == ';' || ch == ' ') state = ChunkParameters
                  else err()
                } else {
                  // err on uint64 wrap/ULLONG_MAX (http_parser.c:1733-1744)
                  val t = contentLength * 16 + v
                  if (java.lang.Long.compareUnsigned(t, contentLength) < 0 ||
                    t == -1L) err()
                  else contentLength = t
                }
              }
            case ChunkParameters =>
              if (ch == '\r') state = ChunkSizeAlmostDone
            case ChunkSizeAlmostDone =>
              // non-strict LF no-op
              nread = 0 // http_parser.c:1765
              if (contentLength == 0) { flags |= FTrailing; state = HeaderFieldStart }
              else state = ChunkData
            case ChunkData =>
              // uint64 MIN, as in BodyIdentity
              val rem = (data.length - p).toLong
              val toRead = (if (java.lang.Long.compareUnsigned(
                contentLength, rem) < 0) contentLength else rem).toInt
              bodyMark = p
              contentLength -= toRead
              p += toRead - 1
              if (contentLength == 0) state = ChunkDataAlmostDone
            case ChunkDataAlmostDone =>
              // non-strict CR no-op
              state = ChunkDataDone
              cbBody(p)
            case ChunkDataDone =>
              // non-strict LF no-op
              nread = 0 // http_parser.c:1810
              state = ChunkSizeStart
            case Dead => err()
            case _ => err()
          }
        }
        if (state == HeaderField && fieldMark < 0) fieldMark = p
        if (state == HeaderValue && valueMark < 0) valueMark = p
        p += 1
      }
      // leftover marks fire NOADVANCE callbacks (no error path reached)
      if (!dead) {
        cbField(data.length)
        cbValue(data.length)
        cbUrl(data.length)
        cbBody(data.length)
        // EOF (http_save → http_parser_execute(parser, 0, 0)): only
        // s_body_identity_eof completes a message
        if (state == BodyIdentityEof) sess.messageComplete(which)
      }
    }

    /** parse_url_char, non-strict (http_parser.c:420-530). */
    private def parseUrlChar(s: Int, ch: Int): Int = {
      import S._
      if (ch == ' ' || ch == '\r' || ch == '\n') return Dead
      s match {
        case ReqSpacesBeforeUrl =>
          if (ch == '/' || ch == '*') ReqPath
          else if (isAlphaNum(ch) && Character.isLetter(ch.toChar)) ReqSchema
          else Dead
        case ReqSchema =>
          if (isAlphaNum(ch) && Character.isLetter(ch.toChar)) s
          else if (ch == ':') ReqSchemaSlash
          else ReqPath // ALW MOLOCH: assume a bad-client path
        case ReqSchemaSlash => if (ch == '/') ReqSchemaSlashSlash else Dead
        case ReqSchemaSlashSlash => if (ch == '/') ReqServerStart else Dead
        case ReqServerWithAt if ch == '@' => Dead
        case ReqServerWithAt | ReqServerStart | ReqServer =>
          if (ch == '/') ReqPath
          else if (ch == '?') ReqQueryStringStart
          else if (ch == '@') ReqServerWithAt
          else if (isUserinfoChar(ch) || ch == '[' || ch == ']') ReqServer
          else Dead
        case ReqPath =>
          if (isUrlChar(ch)) s
          else if (ch == '?') ReqQueryStringStart
          else if (ch == '#') ReqFragmentStart
          else Dead
        case ReqQueryStringStart | ReqQueryString =>
          if (isUrlChar(ch)) ReqQueryString
          else if (ch == '?') ReqQueryString
          else if (ch == '#') ReqFragmentStart
          else Dead
        case ReqFragmentStart =>
          if (isUrlChar(ch)) ReqFragment
          else if (ch == '?') ReqFragment
          else if (ch == '#') s
          else Dead
        case ReqFragment =>
          if (isUrlChar(ch) || ch == '?' || ch == '#') s
          else Dead
        case _ => Dead
      }
    }

    private def needsEof(): Boolean = {
      if (statusCode / 100 == 1 || statusCode == 204 || statusCode == 304)
        return false
      if ((flags & FChunked) != 0 || contentLength != -1L) return false
      true
    }
  }

  private def runModel(client: Array[Byte], server: Array[Byte]): Sess = {
    val sess = new Sess
    new DirParser(sess, 0).execute(client)
    new DirParser(sess, 1).execute(server)
    sess
  }

  // ---------------------------------------------------------------------
  // Comparison
  // ---------------------------------------------------------------------

  private def compare(client: Array[Byte], server: Array[Byte],
      label: String): Unit = {
    val m = runModel(client, server)
    val oursOpt = HttpParser.parse(client, server)
    def srt(xs: Iterable[String]): Seq[String] = xs.toSeq.distinct.sorted
    val ours = oursOpt.getOrElse(HttpParser.HttpInfo(Nil, Nil, Nil, Nil,
      Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil))
    val checks: Seq[(String, Seq[String], Seq[String])] = Seq(
      ("method", srt(m.method), srt(ours.method)),
      ("statuscode", m.statuscode.toSeq.map(_.toString).sorted,
        ours.statuscode.map(_.toString).sorted),
      ("verReq", srt(m.verReq), srt(ours.clientVersion)),
      ("verRes", srt(m.verRes), srt(ours.serverVersion)),
      ("reqHdr", srt(m.reqHdr), srt(ours.requestHeader)),
      ("respHdr", srt(m.respHdr), srt(ours.responseHeader)),
      ("ua", srt(m.ua), srt(ours.useragent)),
      ("referer", srt(m.referer), srt(ours.referer)),
      ("location", srt(m.location), srt(ours.location)),
      ("host", srt(m.host), srt(ours.host)),
      ("uri", srt(m.uris), srt(ours.uri)),
      ("path", srt(m.paths), srt(ours.path)),
      ("key", srt(m.keys), srt(ours.key)),
      ("value", srt(m.vals), srt(ours.value)),
      ("md5", srt(m.md5s), srt(ours.md5)),
      ("reqBody", srt(m.reqBody), srt(ours.requestBody)))
    val diffs = checks.filter { case (_, a, b) => a != b }
    assert(diffs.isEmpty,
      s"\n[$label]\n" + diffs.map { case (f, a, b) =>
        s"  $f: model=$a ours=$b"
      }.mkString("\n") +
        "\nclient:\n" + render(client) + "\nserver:\n" + render(server))
  }

  private def render(b: Array[Byte]): String =
    new String(b, StandardCharsets.ISO_8859_1)
      .replace("\r", "\\r").replace("\n", "\\n\n")

  // ---------------------------------------------------------------------
  // Generator
  // ---------------------------------------------------------------------

  private final class Rng(var seed: Long) {
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  private def genSession(rng: Rng): (Array[Byte], Array[Byte], String) = {
    val recipe = new StringBuilder
    val crlf = if (rng.chance(85)) "\r\n" else "\n"
    if (crlf == "\n") recipe.append("bare-lf ")

    def headerName(): String = rng.nextInt(6) match {
      case 0 => "X-Custom-" + ("Aa" * rng.nextInt(4))
      case 1 => "X-" + ("LongName" * (3 + rng.nextInt(5))) // > 39 chars
      case 2 => rng.pick(Seq("Accept", "X-Test", "Via", "Warning", "Date"))
      case 3 => "X-Tok" + rng.pick(Seq("!", "#", "$", "%", "^", "_"))
      case 4 => "X Space Name" // spaces ARE token chars non-strict
      case 5 => "X-Num-" + rng.nextInt(10)
    }
    def headerValue(): String = rng.nextInt(6) match {
      case 0 => "plain-value"
      case 1 => "trail-space-value " + (" " * rng.nextInt(3))
      case 2 => "" // empty value
      case 3 => "multi word value " + rng.nextInt(100)
      case 4 => "UPPER-Case-Value"
      case 5 => "v" * (1 + rng.nextInt(40))
    }

    def emitHeaders(sb: StringBuilder, hs: Seq[(String, String)]): Unit =
      hs.foreach { case (k, v) =>
        rng.nextInt(14) match {
          case 0 => // folded value (obs-fold): continuation line
            sb.append(s"$k: $v$crlf ${rng.pick(Seq("folded", "more  x"))}$crlf")
            recipe.append("fold ")
          case 1 => // missing colon after a non-token char
            sb.append(s"$k,oops $v$crlf"); recipe.append("nocolon ")
          case 2 => // valueless line, then a normal header (name concat)
            sb.append(s"Valueless$crlf$k: $v$crlf"); recipe.append("valueless ")
          case _ => sb.append(s"$k: $v$crlf")
        }
      }

    def chunkedBody(sb: StringBuilder, pieces: Seq[String],
        trailers: Boolean, badSize: Boolean): Unit = {
      pieces.foreach { piece =>
        val ext = rng.nextInt(4) match {
          case 0 => ";name=val"
          case 1 => " ignored"
          case _ => ""
        }
        sb.append(f"${piece.length}%x$ext$crlf$piece$crlf")
      }
      if (rng.chance(6)) {
        // u64-overflow region: 8000000000000000 = 2^63 (parses, clamps
        // the read), ffffffffffffffff = ULLONG_MAX (errors), 17 digits
        // wrap (errors)
        sb.append(rng.pick(Seq("8000000000000000", "ffffffffffffffff",
          "fffffffffffffff0", "10000000000000000")) + crlf)
        recipe.append("hugechunk ")
      }
      if (badSize) { sb.append(s"zz$crlf"); recipe.append("badchunk ") }
      else {
        val zext = if (rng.chance(25)) ";last" else ""
        sb.append(s"0$zext$crlf")
        if (trailers) {
          sb.append(s"X-Trailer: tv$crlf")
          recipe.append("trailer ")
        }
        sb.append(crlf)
      }
    }

    // --- client stream ---
    val cb = new StringBuilder
    val responseOnly = rng.chance(6)
    val nReq = if (responseOnly) 0 else 1 + rng.nextInt(3)
    val methodsUsed = Seq.newBuilder[String]
    for (i <- 0 until nReq) {
      if (rng.chance(5)) {
        // index-2 silent-advance region (no error path in the C):
        // these all parse as the 2-char-prefix method
        val broken = rng.pick(Seq("GEX", "PUTX", "HEAX", "POSX", "GETT"))
        cb.append(s"$broken /x HTTP/1.1$crlf$crlf")
        recipe.append(s"broken=$broken ")
      }
      if (rng.chance(5)) {
        // CONNECT upgrades at headers-done; the rest of the buffer
        // re-enters at the start state (http.c:726-740)
        cb.append(s"CONNECT site.example:443 HTTP/1.1${crlf}Host: site.example$crlf$crlf")
        if (rng.chance(40)) { cb.append("tls-ish junk"); recipe.append("tunnel ") }
        recipe.append("connect ")
      }
      val method = rng.pick(Seq("GET", "POST", "HEAD", "PUT", "DELETE",
        "OPTIONS", "PROPFIND", "M-SEARCH", "NOTIFY", "SUBSCRIBE", "REPORT",
        "PATCH", "PURGE", "MKCOL", "SEARCH", "UNSUBSCRIBE"))
      methodsUsed += method
      recipe.append(method).append(' ')
      val target = rng.nextInt(8) match {
        case 0 => "/index.html"
        case 1 => s"/p/${rng.nextInt(100)}?a=1&b=${rng.nextInt(10)}"
        case 2 => "http://site.example/abs/path"
        case 3 => "/with%20escape?k%31=v%32"
        case 4 => "/semi;colon/page#frag"
        case 5 => "*"
        case 6 => s"/Search?Q=Mixed%20Case${rng.nextInt(9)}&lower=x" // case preserved end to end
        case 7 => "/q?a=1&&=&b=2=3&tail" // parse_url &/= walk edges
      }
      val ver = rng.pick(Seq(" HTTP/1.1", " HTTP/1.0", "")) // "" → 0.9
      cb.append(s"$method $target$ver$crlf")
      val hs = Seq.newBuilder[(String, String)]
      if (rng.chance(85)) hs += (("Host", rng.nextInt(4) match {
        case 0 => "site.example"
        case 1 => "site.example:8080"
        case 2 => "other.example"
        case 3 => "site.example"
      }))
      if (rng.chance(25)) { hs += (("Host", "second.example")); recipe.append("2host ") }
      if (rng.chance(50)) hs += (("User-Agent", headerValue() match {
        case "" => "ua/1.0"; case v => "ua-" + v.trim.take(10)
      }))
      if (rng.chance(25)) hs += (("Referer", "http://ref.example/x"))
      if (rng.chance(6)) {
        // F_UPGRADE: the message completes at headers-done and the rest
        // of the direction re-enters at the start state — pipelined
        // requests after a refused upgrade keep parsing
        hs += (("Upgrade", rng.pick(Seq("websocket", "h2c"))))
        recipe.append("upgrade ")
      }
      for (_ <- 0 until rng.nextInt(3)) hs += ((headerName(), headerValue()))
      if (rng.chance(2)) {
        // HTTP_MAX_HEADER_SIZE: one ~90 KiB value blows the 80 KiB nread
        // budget mid-value (fields before it keep, direction dies)
        hs += (("X-Big", "B" * (90 * 1024)))
        recipe.append("hdrcap ")
      }
      val bodyKind = rng.nextInt(4)
      val sb2 = new StringBuilder
      emitHeaders(sb2, hs.result())
      bodyKind match {
        case 0 => cb.append(sb2).append(crlf) // no body
        case 1 =>
          val body = "k=v&password=zz" + ("x" * rng.nextInt(30))
          cb.append(sb2)
          if (rng.chance(20)) {
            cb.append(s"Content-Length: 999$crlf")
            recipe.append("2cl ")
          }
          val hugeCl =
            if (rng.chance(10)) {
              // u64-overflow region: 2^63 parses (clamps the read to the
              // remaining bytes via the uint64 MIN), 2^64-1 and 20-digit
              // wraps error the direction
              recipe.append("hugecl ")
              Some("Content-Length: " + rng.pick(Seq(
                "9223372036854775808", "18446744073709551615",
                "92233720368547758080", "18446744073709551614")) + crlf)
            } else None
          // last-wins: before the real CL it only exercises parsing;
          // after it, the huge value frames the body
          if (rng.chance(50)) {
            hugeCl.foreach(cb.append)
            cb.append(s"Content-Length: ${body.length}$crlf$crlf$body")
          } else {
            cb.append(s"Content-Length: ${body.length}$crlf")
            hugeCl.foreach(cb.append)
            cb.append(s"$crlf$body")
          }
        case 2 =>
          cb.append(sb2).append(s"Transfer-Encoding: chunked$crlf$crlf")
          chunkedBody(cb, Seq("part one ", "and two"),
            trailers = rng.chance(30), badSize = rng.chance(8))
          recipe.append("chunkreq ")
        case 3 =>
          cb.append(sb2)
          val teVal = rng.pick(Seq("chunked", "identity, chunked",
            "chunkedX", "chunked "))
          cb.append(s"Transfer-Encoding: $teVal$crlf$crlf")
          recipe.append(s"te=[$teVal] ")
          if (teVal.trim.startsWith("chunked") && teVal != "chunkedX")
            chunkedBody(cb, Seq("abc"), trailers = false,
              badSize = false)
          else cb.append(s"3$crlf") // junk that parses as a next message or not
      }
    }

    // --- server stream ---
    val sb = new StringBuilder
    val nResp = if (responseOnly) 1 + rng.nextInt(2) else nReq
    for (i <- 0 until nResp) {
      if (rng.chance(20)) {
        sb.append(s"HTTP/1.1 100 Continue$crlf$crlf")
        recipe.append("100 ")
      }
      val status = rng.pick(Seq(200, 200, 200, 301, 404, 204, 304, 500))
      recipe.append(status).append(' ')
      val ver = rng.pick(Seq("HTTP/1.1", "HTTP/1.0"))
      sb.append(s"$ver $status Some Text$crlf")
      val hs = Seq.newBuilder[(String, String)]
      if (rng.chance(40)) hs += (("Location", "http://moved.example/y"))
      if (rng.chance(30)) hs += (("Server", "srv/2"))
      for (_ <- 0 until rng.nextInt(3)) hs += ((headerName(), headerValue()))
      val sb2 = new StringBuilder
      emitHeaders(sb2, hs.result())
      val isHead = methodsUsed.result().lift(i).contains("HEAD")
      rng.nextInt(4) match {
        case 0 => // Content-Length body (also on 204/304/HEAD sometimes!)
          val body = "response body " + ("y" * rng.nextInt(40))
          sb.append(sb2).append(s"Content-Length: ${body.length}$crlf$crlf")
          sb.append(body)
          if (isHead) recipe.append("headcl ")
        case 1 => // chunked
          sb.append(sb2).append(s"Transfer-Encoding: chunked$crlf$crlf")
          chunkedBody(sb, Seq("sr ", "vv"), trailers = rng.chance(30),
            badSize = rng.chance(8))
          recipe.append("chunkresp ")
        case 2 => // no framing: EOF body (ends the direction)
          sb.append(sb2).append(crlf)
          if (status != 204 && status != 304) {
            sb.append("eof body bytes")
            recipe.append("eofbody ")
          }
        case 3 => sb.append(sb2).append(s"Content-Length: 0$crlf$crlf")
      }
    }

    var client = cb.toString.getBytes(StandardCharsets.ISO_8859_1)
    var server = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    if (rng.chance(12) && client.length > 4) {
      client = client.take(1 + rng.nextInt(client.length - 1))
      recipe.append("truncC ")
    }
    if (rng.chance(12) && server.length > 4) {
      server = server.take(1 + rng.nextInt(server.length - 1))
      recipe.append("truncS ")
    }
    // byte-level mutations: both sides are byte-exact machines, so the
    // differential property holds for ARBITRARY bytes — flip/delete/
    // duplicate a few to reach states no well-formed generator visits
    def mutate(b: Array[Byte], tag: String): Array[Byte] =
      if (!rng.chance(15) || b.length < 8) b
      else {
        recipe.append(tag)
        val out = scala.collection.mutable.ArrayBuffer(b: _*)
        for (_ <- 0 to rng.nextInt(3)) {
          val i = rng.nextInt(out.length)
          rng.nextInt(3) match {
            case 0 => out(i) = rng.nextInt(256).toByte // flip
            case 1 => out.remove(i)                    // delete
            case 2 => out.insert(i, out(i))            // duplicate
          }
        }
        out.toArray
      }
    client = mutate(client, "mutC ")
    server = mutate(server, "mutS ")
    (client, server, recipe.toString)
  }

  test("crafted sessions: walker fields match the http_parser/http.c model") {
    // soak knobs: GRAFT_FUZZ_TRIALS=30000 GRAFT_FUZZ_SEED=0x... sbt test
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(600)
    val rng = new Rng(sys.env.get("GRAFT_FUZZ_SEED")
      .map(java.lang.Long.decode(_).longValue).getOrElse(0x7a11ce5L))
    for (trial <- 0 until nTrials) {
      val (client, server, recipe) = genSession(rng)
      compare(client, server, s"trial $trial: $recipe")
    }
  }

  test("pinned http_parser/http.c quirks") {
    // 39-char header-name buffer (http.c HTTPInfo_t header[2][40])
    val longName = "X-" + "A" * 60
    compare(
      s"GET / HTTP/1.1\r\nHost: h.example\r\n$longName: v\r\n\r\n".getBytes,
      "HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n".getBytes,
      "39-char name truncation")
    // folded value: continuation concatenates with the lws stripped
    compare(
      "GET / HTTP/1.1\r\nHost: h.example\r\nUser-Agent: one\r\n two\r\n\r\n".getBytes,
      "HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n".getBytes,
      "folded header value")
    // two Host headers concatenate in hostString
    compare(
      "GET / HTTP/1.1\r\nHost: aa.example\r\nHost: bb.example\r\n\r\n".getBytes,
      "HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n".getBytes,
      "multi-host concat")
    // TE value must START with chunked (strict prefix walk)
    compare(
      ("POST /u HTTP/1.1\r\nHost: h.example\r\n" +
        "Transfer-Encoding: identity, chunked\r\n\r\n3\r\nabc\r\n0\r\n\r\n").getBytes,
      "HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n".getBytes,
      "TE prefix match")
    // 304 with a Content-Length: the parser consumes the bytes as body
    compare(
      "GET /c HTTP/1.1\r\nHost: h.example\r\n\r\n".getBytes,
      ("HTTP/1.1 304 Not Modified\r\nContent-Length: 10\r\n\r\n" +
        "HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n").getBytes,
      "304 + CL swallows")
    // HEAD response with Content-Length: no F_SKIPBODY — bytes consumed
    compare(
      "HEAD /h HTTP/1.1\r\nHost: h.example\r\n\r\n".getBytes,
      ("HTTP/1.1 200 OK\r\nContent-Length: 12\r\n\r\n" +
        "HTTP/1.1 404 No\r\nContent-Length: 0\r\n\r\n").getBytes,
      "HEAD + CL swallows")
    // trailers after the 0-chunk are parsed as headers (names recorded)
    compare(
      ("POST /t HTTP/1.1\r\nHost: h.example\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "3\r\nabc\r\n0\r\nX-Trailer-One: tv\r\n\r\n").getBytes,
      "HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n".getBytes,
      "chunked trailers recorded")
    // webdav/upnp methods parse (full method_strings table)
    compare(
      "PROPFIND /dav HTTP/1.1\r\nHost: h.example\r\n\r\n".getBytes,
      "HTTP/1.1 207 Multi\r\nContent-Length: 0\r\n\r\n".getBytes,
      "PROPFIND method")
    compare(
      "M-SEARCH * HTTP/1.1\r\nHost: h.example\r\n\r\n".getBytes,
      Array.emptyByteArray,
      "M-SEARCH method")
    // bad chunk size char: HPE error — direction parsing stops there
    compare(
      ("POST /b HTTP/1.1\r\nHost: h.example\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "zz\r\nGET /after HTTP/1.1\r\nHost: x\r\n\r\n").getBytes,
      "HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n".getBytes,
      "bad chunk size stops direction")
    // multiple Content-Length: LAST wins (value re-parsed per header)
    compare(
      ("POST /cl HTTP/1.1\r\nHost: h.example\r\nContent-Length: 3\r\n" +
        "Content-Length: 7\r\n\r\nabcdefgGET /x HTTP/1.1\r\nHost: h\r\n\r\n").getBytes,
      "HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n".getBytes,
      "last Content-Length wins")
  }
}
