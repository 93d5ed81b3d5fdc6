package graft.etl

import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** HTTP/2 frame walker + HPACK header decompression over the
  * per-direction reassembled streams (reference:
  * capture/parsers/http2.c, which delegates HPACK to nghttp2).
  *
  * HPACK (RFC 7541) is implemented from the spec: static table
  * (Appendix A), dynamic table with size-based eviction (§4), prefix
  * integers (§5.1), string literals with huffman coding (§5.2 +
  * Appendix B code table).
  *
  * Field mapping follows http2.c:157-178: `:method` → http.method,
  * `:authority` (port stripped) → http.host, `:path` →
  * http_common_parse_url (path / query key / query value), `:status` →
  * http.statuscode; all other headers land in the request/response
  * header-name lists (http2.c:174) and `cookie` is split into
  * key/value pairs (http2.c:176-178). DATA frame payloads are MD5'd
  * per stream per direction, emitted when the END_STREAM DATA frame
  * completes (http2.c:300-321). PUSH_PROMISE header blocks are decoded
  * like HEADERS (http2.c:237-254), so pushed-stream pseudo-headers
  * contribute to the same fields — that is how a pushed resource's
  * :path shows up (the nghttp2 golden's "/stylesheets/screen.css").
  */
object Http2Parser {

  // ---------------------------------------------------------------- huffman
  /** RFC 7541 Appendix B canonical huffman code table: code value and
    * bit length per symbol 0-255 plus EOS (256).
    */
  private val huffCodes: Array[Int] = Array(
    0x1ff8, 0x7fffd8, 0xfffffe2, 0xfffffe3, 0xfffffe4, 0xfffffe5, 0xfffffe6, 0xfffffe7,
    0xfffffe8, 0xffffea, 0x3ffffffc, 0xfffffe9, 0xfffffea, 0x3ffffffd, 0xfffffeb, 0xfffffec,
    0xfffffed, 0xfffffee, 0xfffffef, 0xffffff0, 0xffffff1, 0xffffff2, 0x3ffffffe, 0xffffff3,
    0xffffff4, 0xffffff5, 0xffffff6, 0xffffff7, 0xffffff8, 0xffffff9, 0xffffffa, 0xffffffb,
    0x14, 0x3f8, 0x3f9, 0xffa, 0x1ff9, 0x15, 0xf8, 0x7fa,
    0x3fa, 0x3fb, 0xf9, 0x7fb, 0xfa, 0x16, 0x17, 0x18,
    0x0, 0x1, 0x2, 0x19, 0x1a, 0x1b, 0x1c, 0x1d,
    0x1e, 0x1f, 0x5c, 0xfb, 0x7ffc, 0x20, 0xffb, 0x3fc,
    0x1ffa, 0x21, 0x5d, 0x5e, 0x5f, 0x60, 0x61, 0x62,
    0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a,
    0x6b, 0x6c, 0x6d, 0x6e, 0x6f, 0x70, 0x71, 0x72,
    0xfc, 0x73, 0xfd, 0x1ffb, 0x7fff0, 0x1ffc, 0x3ffc, 0x22,
    0x7ffd, 0x3, 0x23, 0x4, 0x24, 0x5, 0x25, 0x26,
    0x27, 0x6, 0x74, 0x75, 0x28, 0x29, 0x2a, 0x7,
    0x2b, 0x76, 0x2c, 0x8, 0x9, 0x2d, 0x77, 0x78,
    0x79, 0x7a, 0x7b, 0x7ffe, 0x7fc, 0x3ffd, 0x1ffd, 0xffffffc,
    0xfffe6, 0x3fffd2, 0xfffe7, 0xfffe8, 0x3fffd3, 0x3fffd4, 0x3fffd5, 0x7fffd9,
    0x3fffd6, 0x7fffda, 0x7fffdb, 0x7fffdc, 0x7fffdd, 0x7fffde, 0xffffeb, 0x7fffdf,
    0xffffec, 0xffffed, 0x3fffd7, 0x7fffe0, 0xffffee, 0x7fffe1, 0x7fffe2, 0x7fffe3,
    0x7fffe4, 0x1fffdc, 0x3fffd8, 0x7fffe5, 0x3fffd9, 0x7fffe6, 0x7fffe7, 0xffffef,
    0x3fffda, 0x1fffdd, 0xfffe9, 0x3fffdb, 0x3fffdc, 0x7fffe8, 0x7fffe9, 0x1fffde,
    0x7fffea, 0x3fffdd, 0x3fffde, 0xfffff0, 0x1fffdf, 0x3fffdf, 0x7fffeb, 0x7fffec,
    0x1fffe0, 0x1fffe1, 0x3fffe0, 0x1fffe2, 0x7fffed, 0x3fffe1, 0x7fffee, 0x7fffef,
    0xfffea, 0x3fffe2, 0x3fffe3, 0x3fffe4, 0x7ffff0, 0x3fffe5, 0x3fffe6, 0x7ffff1,
    0x3ffffe0, 0x3ffffe1, 0xfffeb, 0x7fff1, 0x3fffe7, 0x7ffff2, 0x3fffe8, 0x1ffffec,
    0x3ffffe2, 0x3ffffe3, 0x3ffffe4, 0x7ffffde, 0x7ffffdf, 0x3ffffe5, 0xfffff1, 0x1ffffed,
    0x7fff2, 0x1fffe3, 0x3ffffe6, 0x7ffffe0, 0x7ffffe1, 0x3ffffe7, 0x7ffffe2, 0xfffff2,
    0x1fffe4, 0x1fffe5, 0x3ffffe8, 0x3ffffe9, 0xffffffd, 0x7ffffe3, 0x7ffffe4, 0x7ffffe5,
    0xfffec, 0xfffff3, 0xfffed, 0x1fffe6, 0x3fffe9, 0x1fffe7, 0x1fffe8, 0x7ffff3,
    0x3fffea, 0x3fffeb, 0x1ffffee, 0x1ffffef, 0xfffff4, 0xfffff5, 0x3ffffea, 0x7ffff4,
    0x3ffffeb, 0x7ffffe6, 0x3ffffec, 0x3ffffed, 0x7ffffe7, 0x7ffffe8, 0x7ffffe9, 0x7ffffea,
    0x7ffffeb, 0xffffffe, 0x7ffffec, 0x7ffffed, 0x7ffffee, 0x7ffffef, 0x7fffff0, 0x3ffffee,
    0x3fffffff)
  private val huffLens: Array[Int] = Array(
    13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28,
    28, 28, 28, 28, 28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28,
    6, 10, 10, 12, 13, 6, 8, 11, 10, 10, 8, 11, 8, 6, 6, 6,
    5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 7, 8, 15, 6, 12, 10,
    13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6,
    15, 5, 6, 5, 6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5,
    6, 7, 6, 5, 5, 6, 7, 7, 7, 7, 7, 15, 11, 14, 13, 28,
    20, 22, 20, 20, 22, 22, 22, 23, 22, 23, 23, 23, 23, 23, 24, 23,
    24, 24, 22, 23, 24, 23, 23, 23, 23, 21, 22, 23, 22, 23, 23, 24,
    22, 21, 20, 22, 22, 23, 23, 21, 23, 22, 22, 24, 21, 22, 23, 23,
    21, 21, 22, 21, 23, 22, 23, 23, 20, 22, 22, 22, 23, 22, 22, 23,
    26, 26, 20, 19, 22, 23, 22, 25, 26, 26, 26, 27, 27, 26, 24, 25,
    19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 28, 27, 27, 27,
    20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24, 26, 23,
    26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27, 26,
    30)

  /** Binary trie over the 257 codes; node 0 is the root. `sym(n)` >= 0
    * marks a leaf. Built once.
    */
  private val (trieChild, trieSym): (Array[Array[Int]], Array[Int]) = {
    val child = mutable.ArrayBuffer(Array(-1, -1))
    val sym = mutable.ArrayBuffer(-1)
    var s = 0
    while (s < 257) {
      val code = huffCodes(s)
      val len = huffLens(s)
      var node = 0
      var i = len - 1
      while (i >= 0) {
        val bit = (code >>> i) & 1
        if (child(node)(bit) < 0) {
          child += Array(-1, -1)
          sym += -1
          child(node)(bit) = child.length - 1
        }
        node = child(node)(bit)
        i -= 1
      }
      sym(node) = s
      s += 1
    }
    (child.toArray, sym.toArray)
  }

  /** Decode a huffman-coded string literal. Trailing all-ones padding
    * (≤ 7 bits of the EOS prefix) is accepted; a malformed path yields
    * the bytes decoded so far (parser robustness over strictness).
    */
  private def huffDecode(b: Array[Byte], off: Int, len: Int): String = {
    val out = new java.io.ByteArrayOutputStream(len * 2)
    var node = 0
    var i = off
    val end = off + len
    while (i < end) {
      val byte = b(i) & 0xff
      var bit = 7
      while (bit >= 0) {
        node = trieChild(node)((byte >>> bit) & 1)
        if (node < 0) return new String(out.toByteArray, StandardCharsets.ISO_8859_1)
        val s = trieSym(node)
        if (s >= 0) {
          if (s == 256) return new String(out.toByteArray, StandardCharsets.ISO_8859_1)
          out.write(s)
          node = 0
        }
        bit -= 1
      }
      i += 1
    }
    new String(out.toByteArray, StandardCharsets.ISO_8859_1)
  }

  // ----------------------------------------------------------------- hpack
  /** RFC 7541 Appendix A static table, 1-indexed. */
  private val staticTable: Array[(String, String)] = Array(
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""),
    ("expires", ""), ("from", ""), ("host", ""), ("if-match", ""),
    ("if-modified-since", ""), ("if-none-match", ""), ("if-range", ""),
    ("if-unmodified-since", ""), ("last-modified", ""), ("link", ""),
    ("location", ""), ("max-forwards", ""), ("proxy-authenticate", ""),
    ("proxy-authorization", ""), ("range", ""), ("referer", ""),
    ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""),
    ("via", ""), ("www-authenticate", ""))

  /** One HPACK decompression context per direction: the dynamic table
    * persists across every header block that direction sends
    * (http2.c keeps one nghttp2_hd_inflater per `which`).
    */
  private final class HpackDecoder {
    private val dyn = mutable.ArrayDeque.empty[(String, String)] // head newest
    private var maxSize = 4096
    private var curSize = 0

    private def entrySize(e: (String, String)) = e._1.length + e._2.length + 32

    private def evict(): Unit =
      while (curSize > maxSize && dyn.nonEmpty) curSize -= entrySize(dyn.removeLast())

    private def lookup(i: Int): Option[(String, String)] =
      if (i >= 1 && i <= 61) Some(staticTable(i - 1))
      else {
        val j = i - 62
        if (j >= 0 && j < dyn.length) Some(dyn(j)) else None
      }

    /** Decode one complete header block (HEADERS + CONTINUATIONs
      * concatenated). Returns emitted (name, value) pairs; a malformed
      * block yields the pairs decoded before the error.
      */
    def decode(b: Array[Byte]): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      var p = 0

      // §5.1 prefix integer; returns -1 on truncation
      def int(prefixBits: Int): Long = {
        if (p >= b.length) return -1L
        val mask = (1 << prefixBits) - 1
        var v: Long = b(p) & mask
        p += 1
        if (v < mask) v
        else {
          var shift = 0
          var cont = true
          while (cont) {
            if (p >= b.length || shift > 28) return -1L
            val x = b(p) & 0xff
            p += 1
            v += (x & 0x7f).toLong << shift
            shift += 7
            cont = (x & 0x80) != 0
          }
          v
        }
      }

      // §5.2 string literal
      def str(): String = {
        if (p >= b.length) return null
        val huff = (b(p) & 0x80) != 0
        val len = int(7)
        if (len < 0 || p + len > b.length) return null
        val s =
          if (huff) huffDecode(b, p, len.toInt)
          else new String(b, p, len.toInt, StandardCharsets.ISO_8859_1)
        p += len.toInt
        s
      }

      def literal(prefixBits: Int, addToTable: Boolean): Boolean = {
        val idx = int(prefixBits)
        if (idx < 0) return false
        val name =
          if (idx == 0) str()
          else lookup(idx.toInt).map(_._1).orNull
        val value = str()
        if (name == null || value == null) return false
        out += ((name, value))
        if (addToTable) {
          val e = (name, value)
          dyn.prepend(e)
          curSize += entrySize(e)
          evict()
        }
        true
      }

      var ok = true
      while (ok && p < b.length) {
        val first = b(p) & 0xff
        if ((first & 0x80) != 0) { // §6.1 indexed
          val idx = int(7)
          lookup(if (idx < 0) -1 else idx.toInt) match {
            case Some(e) => out += e
            case None => ok = false
          }
        } else if ((first & 0xc0) == 0x40) { // §6.2.1 literal, incremental
          ok = literal(6, addToTable = true)
        } else if ((first & 0xe0) == 0x20) { // §6.3 table size update
          val sz = int(5)
          if (sz < 0) ok = false
          else { maxSize = sz.toInt; evict() }
        } else { // §6.2.2 / §6.2.3 literal, not indexed / never indexed
          ok = literal(4, addToTable = false)
        }
      }
      out.result()
    }
  }

  // ----------------------------------------------------------- frame walk
  private val preface =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)

  private val FrameData = 0
  private val FrameHeaders = 1
  private val FramePushPromise = 5
  private val FrameContinuation = 9
  private val FlagEndStream = 0x1
  private val FlagEndHeaders = 0x4
  private val FlagPadded = 0x8
  private val FlagPriority = 0x20

  private final case class Header(name: String, value: String, isReq: Boolean)

  /** Walk one direction's frame stream: decode header blocks through
    * the direction's HPACK context and MD5 DATA payloads per stream.
    */
  private def walkDirection(
      stream: Array[Byte], isReq: Boolean,
      headers: mutable.Builder[Header, Seq[Header]],
      md5s: mutable.Builder[String, Seq[String]],
      sha256s: mutable.Builder[String, Seq[String]],
      magics: mutable.Builder[String, Seq[String]]): Unit = {
    var p = 0
    if (stream.length >= preface.length &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOf(stream, preface.length), preface))
      p = preface.length

    val hpack = new HpackDecoder
    // CONTINUATION fragments buffer until END_HEADERS (nghttp2 inflates
    // incrementally; concatenation is equivalent for a complete block)
    var fragStream = -1L
    var frag = new java.io.ByteArrayOutputStream()
    val dataMd5 = mutable.Map.empty[Long, java.security.MessageDigest]
    val dataSha = mutable.Map.empty[Long, java.security.MessageDigest]
    var lastType = -1

    def headerBlock(body: Array[Byte], off0: Int, len0: Int, flags: Int,
        streamId: Long, skipPromised: Boolean): Unit = {
      var off = off0
      var len = len0
      if ((flags & FlagPadded) != 0 && len > 0) {
        val pad = body(off) & 0xff
        off += 1
        len -= 1 + pad
      }
      if ((flags & FlagPriority) != 0) { off += 5; len -= 5 }
      if (skipPromised) { off += 4; len -= 4 }
      if (len < 0) {
        // undecodable fragment: drop the WHOLE block — appending the
        // next block onto stale bytes would desync the HPACK table
        frag = new java.io.ByteArrayOutputStream()
        fragStream = -1L
        return
      }
      frag.write(body, off, len)
      fragStream = streamId
      if ((flags & FlagEndHeaders) != 0) {
        hpack.decode(frag.toByteArray).foreach { case (n, v) =>
          headers += Header(n, v, isReq)
        }
        frag = new java.io.ByteArrayOutputStream()
        fragStream = -1L
      }
    }

    var truncated = false
    while (!truncated && p + 9 <= stream.length) {
      val len = ((stream(p) & 0xff) << 16) | ((stream(p + 1) & 0xff) << 8) |
        (stream(p + 2) & 0xff)
      val tpe0 = stream(p + 3) & 0xff
      val flags = stream(p + 4) & 0xff
      val streamId = (((stream(p + 5) & 0x7f) << 24) | ((stream(p + 6) & 0xff) << 16) |
        ((stream(p + 7) & 0xff) << 8) | (stream(p + 8) & 0xff)).toLong
      val body = p + 9
      if (body + len > stream.length) truncated = true
      else {
        val tpe = if (tpe0 == FrameContinuation) lastType else tpe0
        tpe match {
          case FrameData =>
            var off = body
            var dlen = len
            if ((flags & FlagPadded) != 0 && dlen > 0) {
              val pad = stream(off) & 0xff
              off += 1
              dlen -= 1 + pad
            }
            if (dlen >= 0) {
              // NOTE: current http2.c magics the first DATA chunk, but
              // the shipped goldens predate that — they carry no
              // http2 bodyMagic, so none is emitted here (goldens rule)
              val md = dataMd5.getOrElseUpdate(streamId,
                java.security.MessageDigest.getInstance("MD5"))
              md.update(stream, off, dlen)
              val sh = dataSha.getOrElseUpdate(streamId,
                java.security.MessageDigest.getInstance("SHA-256"))
              sh.update(stream, off, dlen)
              if ((flags & FlagEndStream) != 0) {
                md5s += Hex.hex(md.digest())
                dataMd5.remove(streamId)
                sha256s += Hex.hex(sh.digest())
                dataSha.remove(streamId)
              }
            }
          case FrameHeaders =>
            // a CONTINUATION re-dispatched here carries a bare fragment:
            // PADDED/PRIORITY/Promised-Stream-Id live only in the
            // block's FIRST frame (RFC 7540 §6.10)
            val cont = tpe0 == FrameContinuation
            headerBlock(stream, body, len,
              if (cont) flags & FlagEndHeaders else flags,
              streamId, skipPromised = false)
          case FramePushPromise =>
            val cont = tpe0 == FrameContinuation
            headerBlock(stream, body, len,
              if (cont) flags & FlagEndHeaders else flags,
              streamId, skipPromised = !cont)
          case _ => // SETTINGS / PING / WINDOW_UPDATE / RST / GOAWAY: skip
        }
        lastType = tpe
        p = body + len
      }
    }
  }

  /** Parse both directions into the shared HTTP field shape. Returns
    * None when neither side carries http2 frames (no preface and no
    * decodable headers).
    */
  def parse(clientStream: Array[Byte],
      serverStream: Array[Byte]): Option[HttpParser.HttpInfo] = {
    val hasPreface = clientStream.length >= preface.length &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOf(clientStream, preface.length), preface)
    if (!hasPreface) return None

    val headers = Seq.newBuilder[Header]
    val md5s = Seq.newBuilder[String]
    val sha256s = Seq.newBuilder[String]
    val magics = Seq.newBuilder[String]
    walkDirection(clientStream, isReq = true, headers, md5s, sha256s, magics)
    walkDirection(serverStream, isReq = false, headers, md5s, sha256s, magics)
    val hs = headers.result()
    if (hs.isEmpty && md5s.result().isEmpty) return None

    def d[T](xs: Seq[T]): Seq[T] = xs.distinct
    val methods = hs.filter(_.name == ":method").map(_.value)
    // :authority port-stripped (http2.c:161-166); a plain "host" request
    // header adds its raw value via the configured-header map, and
    // "user-agent" promotes to http.useragent the same way
    // (http_common_add_header + http.c:1031-1032)
    val hosts = hs.filter(_.name == ":authority")
      .map(h => h.value.takeWhile(_ != ':').toLowerCase) ++
      hs.filter(h => h.isReq && h.name == "host").map(_.value.toLowerCase)
    val uas = hs.filter(h => h.isReq && h.name == "user-agent").map(_.value)
    val paths0 = hs.filter(_.name == ":path").map(_.value)
    val paths = paths0.map(_.takeWhile(_ != '?'))
    val queryPairs = paths0.flatMap { t =>
      val q = t.dropWhile(_ != '?').drop(1)
      if (q.isEmpty) Nil
      else q.split("&").toSeq.map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (kv, "") else (kv.substring(0, i), kv.substring(i + 1))
      }
    }
    val statuses = hs.filter(_.name == ":status")
      .flatMap(_.value.takeWhile(_.isDigit).toIntOption)
    val plain = hs.filterNot(_.name.startsWith(":"))
    val cookiePairs = plain.filter(h => h.isReq && h.name == "cookie")
      .flatMap(_.value.split(";").toSeq).flatMap { c =>
        val i = c.indexOf('=')
        if (i <= 0) None
        else Some((c.substring(0, i).trim, c.substring(i + 1).trim))
      }

    Some(HttpParser.HttpInfo(
      method = d(methods),
      uri = Nil, // http2.c builds no urlString
      host = d(hosts),
      path = d(paths.filter(_.nonEmpty)),
      key = d(queryPairs.map(_._1)),
      value = d(queryPairs.map(_._2).filter(_.nonEmpty)),
      statuscode = d(statuses),
      useragent = d(uas),
      clientVersion = Nil, serverVersion = Nil,
      requestHeader = d(plain.filter(_.isReq).map(_.name.toLowerCase)).sorted,
      responseHeader = d(plain.filterNot(_.isReq).map(_.name.toLowerCase)).sorted,
      referer = d(plain.filter(h => h.isReq && h.name == "referer").map(_.value)),
      location = d(plain.filter(h => !h.isReq && h.name == "location").map(_.value)),
      cookieKey = d(cookiePairs.map(_._1)),
      cookieValue = d(cookiePairs.map(_._2).filter(_.nonEmpty)),
      md5 = d(md5s.result()),
      sha256 = d(sha256s.result()),
      authUser = Nil,
      bodyMagic = d(magics.result()),
      // parseHTTPHeaderAll attribution is by RAW direction (http.c:484
      // keys on which==0, not urlWhich), so PUSH_PROMISE request-style
      // headers sent by the server land on the response side — exactly
      // the http2-nghttp2 golden's responseHeaderField/user-agent
      requestHeaderField = d(plain.filter(_.isReq).map(_.name.toLowerCase)
        .filterNot(HttpParser.ReqOwnHeaders)).sorted,
      // values are STR_ARRAY + FLAG_CNT: duplicates survive
      requestHeaderValue = plain.filter(h =>
        h.isReq && !HttpParser.ReqOwnHeaders(h.name.toLowerCase))
        .map(_.value.take(1024).toLowerCase).filter(_.nonEmpty),
      responseHeaderField = d(plain.filterNot(_.isReq).map(_.name.toLowerCase)
        .filterNot(HttpParser.RespOwnHeaders)).sorted,
      responseHeaderValue = plain.filter(h =>
        !h.isReq && !HttpParser.RespOwnHeaders(h.name.toLowerCase))
        .map(_.value.take(1024).toLowerCase).filter(_.nonEmpty)))
  }
}
