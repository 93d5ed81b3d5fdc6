package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Http2Parser

/** Round-trip fuzz for the HTTP/2 frame walker + HPACK decoder: header
  * blocks produced by an independent RFC 7541 encoder (its own dynamic-
  * table model, static indexes and huffman codes typed from the RFC's
  * Appendix A/B), framed per RFC 7540 with CONTINUATION splits, padding,
  * priority, PUSH_PROMISE and interleaved DATA streams; expectations
  * (field mapping per http2.c:157-178) computed from the generation
  * model, never from the parser.
  */
class Http2RoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x41b2c85eedL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  // ------------------------------------------------- huffman (RFC 7541 B)
  /** Appendix B codes for the characters this generator emits — typed
    * from the RFC table, not taken from the parser.
    */
  private val huff: Map[Char, (Int, Int)] = Map(
    '0' -> (0x0, 5), '1' -> (0x1, 5), '2' -> (0x2, 5), '3' -> (0x19, 6),
    '4' -> (0x1a, 6), '5' -> (0x1b, 6), '6' -> (0x1c, 6), '7' -> (0x1d, 6),
    '8' -> (0x1e, 6), '9' -> (0x1f, 6),
    'a' -> (0x3, 5), 'b' -> (0x23, 6), 'c' -> (0x4, 5), 'd' -> (0x24, 6),
    'e' -> (0x5, 5), 'f' -> (0x25, 6), 'g' -> (0x26, 6), 'h' -> (0x27, 6),
    'i' -> (0x6, 5), 'j' -> (0x74, 7), 'k' -> (0x75, 7), 'l' -> (0x28, 6),
    'm' -> (0x29, 6), 'n' -> (0x2a, 6), 'o' -> (0x7, 5), 'p' -> (0x2b, 6),
    'q' -> (0x76, 7), 'r' -> (0x2c, 6), 's' -> (0x8, 5), 't' -> (0x9, 5),
    'u' -> (0x2d, 6), 'v' -> (0x77, 7), 'w' -> (0x78, 7), 'x' -> (0x79, 7),
    'y' -> (0x7a, 7), 'z' -> (0x7b, 7),
    '-' -> (0x16, 6), '.' -> (0x17, 6), '/' -> (0x18, 6), ':' -> (0x5c, 7),
    '=' -> (0x20, 6), '&' -> (0xf8, 8), '?' -> (0x3fc, 10), '%' -> (0x15, 6),
    ' ' -> (0x14, 6), ';' -> (0xfb, 8), ',' -> (0xfa, 8))

  private def huffEncode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var bits = 0
    s.foreach { c =>
      val (code, len) = huff(c)
      acc = (acc << len) | code
      bits += len
      while (bits >= 8) {
        out.write(((acc >> (bits - 8)) & 0xff).toInt)
        bits -= 8
      }
    }
    if (bits > 0) { // pad with the EOS prefix (all ones)
      val pad = 8 - bits
      out.write((((acc << pad) | ((1 << pad) - 1)) & 0xff).toInt)
    }
    out.toByteArray
  }

  // ------------------------------------------- static table (RFC 7541 A)
  /** The exact-match subset this encoder indexes, (index, name, value). */
  private val staticExact: Seq[(Int, String, String)] = Seq(
    (2, ":method", "GET"), (3, ":method", "POST"), (4, ":path", "/"),
    (6, ":scheme", "http"), (7, ":scheme", "https"),
    (8, ":status", "200"), (13, ":status", "404"))
  /** Name-only static indexes for literal-with-indexed-name forms. */
  private val staticName: Map[String, Int] = Map(
    ":authority" -> 1, ":method" -> 2, ":path" -> 4, ":scheme" -> 6,
    ":status" -> 8, "accept" -> 19, "content-type" -> 31, "cookie" -> 32,
    "host" -> 38, "location" -> 46, "referer" -> 51, "server" -> 54,
    "user-agent" -> 58)

  // --------------------------------------------------------- HPACK encoder
  /** Mirrors the decoder's dynamic-table semantics (prepend + tail
    * eviction at 32-byte-overhead entry sizes) so indexed references
    * stay valid; representation per header is chosen randomly among the
    * legal RFC 7541 §6 forms.
    */
  private final class HpackEnc {
    private val dyn = scala.collection.mutable.ArrayDeque.empty[(String, String)]
    private var maxSize = 4096
    private var curSize = 0
    private def entrySize(e: (String, String)) = e._1.length + e._2.length + 32
    private def evict(): Unit =
      while (curSize > maxSize && dyn.nonEmpty) curSize -= entrySize(dyn.removeLast())

    private val out = new java.io.ByteArrayOutputStream()
    private def u8(v: Int): Unit = out.write(v & 0xff)
    private def pint(prefix: Int, firstBits: Int, v: Int): Unit = {
      val mask = (1 << prefix) - 1
      if (v < mask) u8(firstBits | v)
      else {
        u8(firstBits | mask)
        var x = v - mask
        while (x >= 128) { u8((x % 128) | 0x80); x /= 128 }
        u8(x)
      }
    }
    private def strLit(s: String): Unit = {
      val useHuff = chance(50) && s.forall(huff.contains)
      if (useHuff) {
        val b = huffEncode(s)
        pint(7, 0x80, b.length); out.write(b)
      } else {
        pint(7, 0x00, s.length)
        out.write(s.getBytes(StandardCharsets.ISO_8859_1))
      }
    }

    def tableSizeUpdate(sz: Int): Unit = {
      pint(5, 0x20, sz); maxSize = sz; evict()
    }

    def header(name: String, value: String): Unit = {
      val stat = staticExact.find(e => e._2 == name && e._3 == value)
      val dynIdx = dyn.indexOf((name, value))
      if (stat.isDefined && chance(80)) pint(7, 0x80, stat.get._1)
      else if (dynIdx >= 0 && chance(80)) pint(7, 0x80, 62 + dynIdx)
      else {
        val incremental = chance(40)
        val (firstBits, prefix) =
          if (incremental) (0x40, 6)
          else if (chance(50)) (0x00, 4) else (0x10, 4)
        val nameIdx = staticName.get(name).filter(_ => chance(70))
          .orElse(Option(dyn.indexWhere(_._1 == name)).filter(i =>
            i >= 0 && chance(50)).map(62 + _))
        nameIdx match {
          case Some(i) => pint(prefix, firstBits, i)
          case None    => pint(prefix, firstBits, 0); strLit(name)
        }
        strLit(value)
        if (incremental) {
          dyn.prepend((name, value)); curSize += entrySize((name, value))
          evict()
        }
      }
    }

    def take(): Array[Byte] = {
      val b = out.toByteArray; out.reset(); b
    }
  }

  // ------------------------------------------------------------- framing
  private final class Frames {
    val buf = new java.io.ByteArrayOutputStream()
    def frame(tpe: Int, flags: Int, streamId: Long, body: Array[Byte]): Unit = {
      buf.write((body.length >> 16) & 0xff); buf.write((body.length >> 8) & 0xff)
      buf.write(body.length & 0xff)
      buf.write(tpe); buf.write(flags)
      buf.write(((streamId >> 24) & 0x7f).toInt); buf.write(((streamId >> 16) & 0xff).toInt)
      buf.write(((streamId >> 8) & 0xff).toInt); buf.write((streamId & 0xff).toInt)
      buf.write(body)
    }
    def out: Array[Byte] = buf.toByteArray
  }

  /** Emit one header block as HEADERS/PUSH_PROMISE + CONTINUATIONs with
    * random splits, padding and priority.
    */
  private def emitBlock(f: Frames, block: Array[Byte], streamId: Long,
      push: Boolean, endStream: Boolean): Unit = {
    val nFrags = 1 + nextInt(3)
    val cuts = (0 until nFrags - 1).map(_ => nextInt(block.length + 1)).sorted
    val frags = (Seq(0) ++ cuts :+ block.length).sliding(2).map {
      case Seq(a, b) => java.util.Arrays.copyOfRange(block, a, b)
    }.toSeq
    frags.zipWithIndex.foreach { case (frag, i) =>
      val first = i == 0
      val last = i == frags.length - 1
      val body = new java.io.ByteArrayOutputStream()
      var flags = 0
      if (first) {
        val padded = chance(30)
        val priority = !push && chance(30)
        val pad = if (padded) nextInt(10) else 0
        if (padded) { flags |= 0x8; body.write(pad) }
        if (priority) { flags |= 0x20; body.write(new Array[Byte](5)) }
        if (push) body.write(Array[Byte](0, 0, 0, (streamId + 1).toByte))
        body.write(frag)
        if (padded) body.write(new Array[Byte](pad))
        if (last) flags |= 0x4
        if (endStream && !push) flags |= 0x1
        f.frame(if (push) 5 else 1, flags, streamId, body.toByteArray)
      } else {
        f.frame(9, if (last) 0x4 else 0, streamId, frag)
      }
    }
  }

  private final case class H(name: String, value: String, isReq: Boolean)

  private val pathsPool = Seq("/", "/index.html", "/a/b.css?x=1&y=2",
    "/api/v2/items?id=97&sort=asc&full", "/img/logo.png")
  private val authPool = Seq("www.example.com", "api.example.org:8443",
    "cdn.x.io:443", "h0st.example.net")
  private val uaPool = Seq("mozilla/5.0 chrome/90", "curl/7.68.0", "go-http-client/2.0")
  private val reqNames = Seq("accept", "x-trace-id", "accept-encoding",
    "content-type", "x-req-meta")
  private val respNames = Seq("server", "x-cache", "content-type", "etag",
    "x-resp-meta")
  private def randToken(): String = {
    val cs = "abcdefghijklmnopqrstuvwxyz0123456789-."
    (0 until 3 + nextInt(12)).map(_ => cs(nextInt(cs.length))).mkString
  }

  test("HTTP/2 round-trip: 120 sessions vs the RFC 7541/7540 model") {
    for (_ <- 0 until 120) {
      // the parser walks the ENTIRE client stream before the server
      // stream, so the model keeps per-direction lists and concatenates
      val cModel = Seq.newBuilder[H]
      val sModel = Seq.newBuilder[H]
      val cEnc = new HpackEnc
      val sEnc = new HpackEnc
      val cF = new Frames
      val sF = new Frames
      cF.buf.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
        .getBytes(StandardCharsets.ISO_8859_1))
      // digests per (direction, stream) in END_STREAM completion order
      val cMd5 = Seq.newBuilder[String]; val sMd5 = Seq.newBuilder[String]
      val cSha = Seq.newBuilder[String]; val sSha = Seq.newBuilder[String]
      def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
      def digests(payloads: Seq[Array[Byte]]) = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val sh = java.security.MessageDigest.getInstance("SHA-256")
        payloads.foreach { p => md.update(p); sh.update(p) }
        (hex(md.digest()), hex(sh.digest()))
      }

      val nStreams = 1 + nextInt(3)
      for (k <- 0 until nStreams) {
        val sid = 1L + k * 2
        // ---- request headers
        if (chance(10)) cEnc.tableSizeUpdate(oneOf(Seq(0, 128, 4096)))
        val method = oneOf(Seq("GET", "POST", "PUT"))
        val path = oneOf(pathsPool)
        val auth = oneOf(authPool)
        val reqHs = Seq(
          H(":method", method, isReq = true),
          H(":path", path, isReq = true),
          H(":authority", auth, isReq = true),
          H(":scheme", oneOf(Seq("http", "https")), isReq = true)) ++
          (0 until nextInt(4)).map(_ =>
            H(oneOf(reqNames), randToken(), isReq = true)) ++
          (if (chance(40)) Seq(H("user-agent", oneOf(uaPool), isReq = true)) else Nil) ++
          (if (chance(40)) Seq(H("cookie",
            s"sid=${randToken()}; theme=${oneOf(Seq("dark", "light"))}; bare",
            isReq = true)) else Nil) ++
          (if (chance(25)) Seq(H("referer", s"https://${oneOf(authPool)}/r",
            isReq = true)) else Nil)
        reqHs.foreach(h => cEnc.header(h.name, h.value))
        cModel ++= reqHs
        val reqBody = chance(50)
        emitBlock(cF, cEnc.take(), sid, push = false, endStream = !reqBody)
        if (reqBody) {
          val chunks = (0 until 1 + nextInt(3)).map(_ =>
            Array.fill(nextInt(40))(nextInt(256).toByte))
          chunks.zipWithIndex.foreach { case (c, i) =>
            val last = i == chunks.length - 1
            if (chance(30)) {
              val pad = nextInt(8)
              val body = Array(pad.toByte) ++ c ++ new Array[Byte](pad)
              cF.frame(0, (if (last) 0x1 else 0) | 0x8, sid, body)
            } else cF.frame(0, if (last) 0x1 else 0, sid, c)
          }
          val (m, s) = digests(chunks)
          cMd5 += m; cSha += s
        }
        // interleave a skipped control frame now and then
        if (chance(40)) cF.frame(oneOf(Seq(4, 6, 8)), 0, 0,
          Array.fill(8)(nextInt(256).toByte))

        // ---- response headers
        if (chance(10)) sEnc.tableSizeUpdate(oneOf(Seq(0, 128, 4096)))
        val status = oneOf(Seq("200", "204", "404", "500"))
        val respHs = Seq(H(":status", status, isReq = false)) ++
          (0 until nextInt(4)).map(_ =>
            H(oneOf(respNames), randToken(), isReq = false)) ++
          (if (chance(25)) Seq(H("location", s"/moved/${randToken()}",
            isReq = false)) else Nil)
        respHs.foreach(h => sEnc.header(h.name, h.value))
        sModel ++= respHs
        emitBlock(sF, sEnc.take(), sid, push = false, endStream = false)
        // ---- server push: request-style pseudos on the RAW server side
        if (chance(30)) {
          val pPath = oneOf(pathsPool)
          val pushHs = Seq(
            H(":method", "GET", isReq = false),
            H(":path", pPath, isReq = false),
            H(":authority", auth, isReq = false),
            H("user-agent", oneOf(uaPool), isReq = false))
          pushHs.foreach(h => sEnc.header(h.name, h.value))
          sModel ++= pushHs
          emitBlock(sF, sEnc.take(), sid, push = true, endStream = false)
        }
        // ---- response body
        val chunks = (0 until 1 + nextInt(2)).map(_ =>
          Array.fill(nextInt(60))(nextInt(256).toByte))
        chunks.zipWithIndex.foreach { case (c, i) =>
          sF.frame(0, if (i == chunks.length - 1) 0x1 else 0, sid, c)
        }
        val (m, s) = digests(chunks)
        sMd5 += m; sSha += s
      }

      val info = Http2Parser.parse(cF.out, sF.out)
      assert(info.isDefined)
      val i = info.get
      val hs = cModel.result() ++ sModel.result()
      def d[T](xs: Seq[T]) = xs.distinct
      val plain = hs.filterNot(_.name.startsWith(":"))
      assert(i.method == d(hs.filter(_.name == ":method").map(_.value)))
      assert(i.host == d(hs.filter(_.name == ":authority")
        .map(_.value.takeWhile(_ != ':').toLowerCase) ++
        hs.filter(h => h.isReq && h.name == "host").map(_.value.toLowerCase)))
      assert(i.useragent == d(hs.filter(h => h.isReq && h.name == "user-agent")
        .map(_.value)))
      val paths0 = hs.filter(_.name == ":path").map(_.value)
      assert(i.path == d(paths0.map(_.takeWhile(_ != '?')).filter(_.nonEmpty)))
      val qp = paths0.flatMap { t =>
        val q = t.dropWhile(_ != '?').drop(1)
        if (q.isEmpty) Nil
        else q.split("&").toSeq.map { kv =>
          val j = kv.indexOf('=')
          if (j < 0) (kv, "") else (kv.substring(0, j), kv.substring(j + 1))
        }
      }
      assert(i.key == d(qp.map(_._1)))
      assert(i.value == d(qp.map(_._2).filter(_.nonEmpty)))
      assert(i.statuscode == d(hs.filter(_.name == ":status")
        .flatMap(_.value.takeWhile(_.isDigit).toIntOption)))
      assert(i.requestHeader == d(plain.filter(_.isReq)
        .map(_.name.toLowerCase)).sorted)
      assert(i.responseHeader == d(plain.filterNot(_.isReq)
        .map(_.name.toLowerCase)).sorted)
      val cookies = plain.filter(h => h.isReq && h.name == "cookie")
        .flatMap(_.value.split(";").toSeq).flatMap { c =>
          val j = c.indexOf('=')
          if (j <= 0) None
          else Some((c.substring(0, j).trim, c.substring(j + 1).trim))
        }
      assert(i.cookieKey == d(cookies.map(_._1)))
      assert(i.cookieValue == d(cookies.map(_._2).filter(_.nonEmpty)))
      assert(i.referer == d(plain.filter(h => h.isReq && h.name == "referer")
        .map(_.value)))
      assert(i.location == d(plain.filter(h => !h.isReq && h.name == "location")
        .map(_.value)))
      assert(i.md5 == d(cMd5.result() ++ sMd5.result()))
      assert(i.sha256 == d(cSha.result() ++ sSha.result()))
      val own = Set("x-forwarded-for", "user-agent", "host", "referer",
        "authorization") // [headers-http-request] test config
      assert(i.requestHeaderField == d(plain.filter(_.isReq)
        .map(_.name.toLowerCase).filterNot(own)).sorted)
      assert(i.requestHeaderValue == plain.filter(h =>
        h.isReq && !own(h.name.toLowerCase))
        .map(_.value.take(1024).toLowerCase).filter(_.nonEmpty))
      assert(i.responseHeaderField == d(plain.filterNot(_.isReq)
        .map(_.name.toLowerCase).filterNot(Set("location"))).sorted)
      assert(i.responseHeaderValue == plain.filter(h =>
        !h.isReq && h.name.toLowerCase != "location")
        .map(_.value.take(1024).toLowerCase).filter(_.nonEmpty))
      assert(i.uri.isEmpty && i.clientVersion.isEmpty && i.serverVersion.isEmpty)
    }
  }

  test("HTTP/2 gates: no preface means no parse") {
    val f = new Frames
    f.frame(1, 0x4, 1, Array[Byte](0x82.toByte)) // :method GET, indexed
    assert(Http2Parser.parse(f.out, Array.emptyByteArray).isEmpty)
  }

  test("HTTP/2 hostile: truncation and flips never throw") {
    for (_ <- 0 until 150) {
      val enc = new HpackEnc
      val f = new Frames
      f.buf.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
        .getBytes(StandardCharsets.ISO_8859_1))
      enc.header(":method", "GET"); enc.header(":path", oneOf(pathsPool))
      enc.header("x-h", randToken())
      emitBlock(f, enc.take(), 1, push = false, endStream = false)
      f.frame(0, 0x1, 1, Array.fill(20)(nextInt(256).toByte))
      val stream = f.out
      nextInt(3) match {
        case 0 => Http2Parser.parse(stream.take(25 + nextInt(stream.length - 25)),
          Array.emptyByteArray)
        case 1 =>
          val b = stream.clone()
          val i = 24 + nextInt(b.length - 24)
          b(i) = (b(i) ^ (1 << nextInt(8))).toByte
          Http2Parser.parse(b, Array.emptyByteArray)
        case _ => // garbage continuation block: HPACK must fail soft
          val g = new Frames
          g.buf.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
            .getBytes(StandardCharsets.ISO_8859_1))
          g.frame(1, 0x4, 1, Array.fill(30)(nextInt(256).toByte))
          Http2Parser.parse(g.out, Array.emptyByteArray)
      }
    }
  }
}
