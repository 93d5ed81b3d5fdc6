package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TlsParser

/** Differential fuzz of the TLS hello walker against an independent
  * second transcription of the reference's machine
  * (capture/parsers/tls.c + capture/bsb.h) — the pattern that found
  * divergences in ASN.1/HTTP/SMTP/DNS. The production walker is
  * graft.etl.TlsParser (BSB-class style); the model below is an
  * integer-cursor re-derivation written from the C.
  *
  * Quirk surface both transcribe (and the generator aims at):
  *  - classification on the first chunk starting 16 03 with minor
  *    version <= 3 and handshake type 1/2 at byte 5; a type-1 chunk is
  *    the ONLY place the ClientHello is parsed (no reassembly, every
  *    clamp cuts at the packet boundary);
  *  - JA3 suppressed entirely when any of its four builders errored,
  *    including BSB_EXPORT_rewind on an EMPTY buffer (an extension
  *    block, curve list, or point-format list that contributed
  *    nothing) and sprintf overflow of the 30000/10000/1000-byte
  *    buffers;
  *  - truncated cipher/curve lists export one spurious "0-";
  *  - the client extension loop stops at <= 4 remaining bytes (a
  *    trailing empty extension header is never walked); SNI requires
  *    exact list/type/name length equalities;
  *  - JA3S: NO grease filter, emitted unconditionally, extension types
  *    recorded before the overflow break, and supported_versions' two
  *    payload bytes consumed TWICE (read + unconditional skip,
  *    tls.c:306-320) — extensions after it parse desynced by 2;
  *  - version only from ServerHello (0x0303 + supported_versions
  *    0x0304 => TLSv1.3, else TLSv1.2; != 0x0303 taken as-is even
  *    when garbage); cipher recorded even for truncated hellos
  *    (defaults 0x0000); session ids only for 0x0300-0x0303 and only
  *    when remaining > length (strict);
  *  - server machine: 8 KiB buffer with overflow truncation, at most
  *    ONE record drained per fed chunk, non-handshake head byte or a
  *    ServerHelloDone message unregisters, and the save-flush parses
  *    the whole remainder as one record body ignoring its declared
  *    length (tls_save, tls.c:732-740);
  *  - server ALPN adds http2 ONLY on the exact 5-byte 00 03 02 68 32
  *    payload.
  *
  * Certificates (message type 11) are out of scope here — CertParser
  * has its own golden + round-trip pinning; the generator still emits
  * type-11 messages so their SKIP framing is exercised.
  */
class TlsDifferentialFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- model

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.ISO_8859_1))
      .map(x => f"${x & 0xff}%02x").mkString

  /** snprintf-exact export buffer re-derived from bsb.h (independent of
    * TlsParser.Out): content bytes tracked separately from the cursor
    * so the strlen() view survives a failed sprintf.
    */
  private final class MBuf(cap: Int) {
    private val bytes = new Array[Byte](cap)
    var n = 0
    var bad = false
    def add(s: String): Unit = {
      if (bad) return
      val rem = cap - n
      if (s.length < rem) {
        s.getBytes(StandardCharsets.ISO_8859_1).copyToArray(bytes, n)
        n += s.length
      } else if (s.length == rem && rem > 0) {
        s.substring(0, s.length - 1).getBytes(StandardCharsets.ISO_8859_1)
          .copyToArray(bytes, n)
        bytes(n + s.length - 1) = 0
        n += s.length
      } else {
        s.substring(0, math.max(0, rem - 1))
          .getBytes(StandardCharsets.ISO_8859_1).copyToArray(bytes, n)
        if (rem > 0) bytes(cap - 1) = 0
        bad = true
      }
    }
    def addCh(c: Char): Unit =
      if (!bad && n < cap) { bytes(n) = c.toByte; n += 1 } else bad = true
    def back(): Unit = if (!bad && n >= 1) n -= 1 else bad = true
    def view: String = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
    def asCStr: String = {
      var i = 0
      while (i < cap && bytes(i) != 0) i += 1
      new String(bytes, 0, i, StandardCharsets.ISO_8859_1)
    }
  }

  private final class MRes {
    var version = List.empty[String]
    var cipher = List.empty[String]
    var ja3 = List.empty[String]
    var ja3string = List.empty[String]
    var ja3s = List.empty[String]
    var ja3sstring = List.empty[String]
    var srcId = List.empty[String]
    var dstId = List.empty[String]
    var sni = List.empty[String]
    var http2 = false
  }

  /** independent grease test (tls.c:181-189) */
  private def gr(v: Int): Boolean =
    (v & 0x0f) == 0x0a && (v & 0xff) == ((v >> 8) & 0xff)

  private def verName(v: Int): String = v match {
    case 0x0300 => "SSLv3"
    case 0x0301 => "TLSv1"
    case 0x0302 => "TLSv1.1"
    case 0x0303 => "TLSv1.2"
    case 0x0304 => "TLSv1.3"
    case d if d >= 0x7f00 && d <= 0x7fff => f"TLSv1.3-draft-${d & 0xff}%02d"
    case other  => f"0x$other%04x"
  }

  /** An import cursor tuple as plain vars via a tiny class — written
    * fresh from bsb.h, not shared with production.
    */
  private final class Cur(val a: Array[Byte], var p: Int, len: Int) {
    var stop: Int = if (len < 0) -1 else p + len // -1 == errored
    def err: Boolean = stop < 0
    def left: Int = if (err) 0 else stop - p
    def byte(): Int =
      if (!err && p < stop) { val v = a(p) & 0xff; p += 1; v }
      else { stop = -1; 0 }
    def word(): Int =
      if (!err && p + 2 <= stop) {
        val v = ((a(p) & 0xff) << 8) | (a(p + 1) & 0xff); p += 2; v
      } else { stop = -1; 0 }
    def jump(k: Int): Unit =
      if (!err && p + k <= stop) p += k else stop = -1
  }

  private def lhex(a: Array[Byte], from: Int, n: Int): String =
    (from until from + n).map(i => f"${a(i) & 0xff}%02x").mkString

  private def mClient(pkt: Array[Byte], out: MRes): Unit = {
    val ja3 = new MBuf(30000)
    val ecja3 = new MBuf(10000)
    val ecfja3 = new MBuf(1000)
    val eja3 = new MBuf(10000)
    if (pkt.length > 5) {
      val ssllen = math.min(pkt.length - 5,
        ((pkt(3) & 0xff) << 8) | (pkt(4) & 0xff))
      if (ssllen > 7) {
        val plen = math.min(ssllen - 4,
          ((pkt(7) & 0xff) << 8) | (pkt(8) & 0xff))
        val ver = ((pkt(9) & 0xff) << 8) | (pkt(10) & 0xff)
        ja3.add(s"$ver,")
        val c = new Cur(pkt, 11, plen - 2)
        if (c.left > 32) {
          c.jump(32)
          val sl = c.byte()
          if (sl > 0 && c.left > sl) out.srcId ::= lhex(pkt, c.p, sl)
          c.jump(sl)
          var remCiphers = c.word()
          while (!c.err && remCiphers > 0) {
            val ci = c.word()
            if (!gr(ci)) ja3.add(s"$ci-")
            remCiphers -= 2
          }
          ja3.back()
          ja3.addCh(',')
          val comp = c.byte()
          c.jump(comp)
          if (c.left > 6) {
            val etot = math.min(c.word(), c.left)
            val e = new Cur(pkt, c.p, etot)
            var stop = false
            while (!stop && e.left > 4) {
              val et = e.word()
              val el = e.word()
              if (!gr(et)) eja3.add(s"$et-")
              if (el > e.left) stop = true
              else et match {
                case 0 =>
                  val s = new Cur(pkt, e.p, el)
                  e.jump(el)
                  val ll = s.word()
                  if (ll == s.left && s.byte() == 0) {
                    val nl = s.word()
                    if (nl == s.left)
                      out.sni ::= new String(pkt, s.p, nl,
                        StandardCharsets.ISO_8859_1)
                  }
                case 10 =>
                  val b = new Cur(pkt, e.p, el)
                  e.jump(el)
                  var ll = b.word()
                  while (ll > 0 && !b.err) {
                    val cv = b.word()
                    if (!gr(cv)) ecja3.add(s"$cv-")
                    ll -= 2
                  }
                  ecja3.back()
                case 11 =>
                  val b = new Cur(pkt, e.p, el)
                  e.jump(el)
                  var ll = b.byte()
                  while (ll > 0 && !b.err) {
                    ecfja3.add(s"${b.byte()}-")
                    ll -= 1
                  }
                  ecfja3.back()
                case _ => e.jump(el)
              }
            }
            eja3.back()
          }
        }
      }
    }
    if (ja3.n > 0 && !ja3.bad && !ecja3.bad && !eja3.bad && !ecfja3.bad) {
      ja3.add(s"${eja3.view},${ecja3.view},${ecfja3.view}")
      out.ja3string ::= ja3.asCStr
      out.ja3 ::= md5hex(ja3.view)
    }
  }

  private val mCipherNames = TlsParser.cipherNames // the shared IANA table

  private def mServerHello(a: Array[Byte], off: Int, len: Int,
      out: MRes): Unit = {
    val c = new Cur(a, off, len)
    val ver = c.word()
    c.jump(32)
    if (c.err) return
    var later12 = false
    if (ver != 0x0303) out.version ::= verName(ver) else later12 = true
    if (ver >= 0x0300 && ver <= 0x0303) {
      val sl = c.byte()
      if (sl > 0 && c.left > sl) out.dstId ::= lhex(a, c.p, sl)
      c.jump(sl)
    }
    val cipher = c.word()
    out.cipher ::= mCipherNames.getOrElse(cipher, f"0x$cipher%04x")
    c.jump(1)
    val eja3 = new MBuf(10000)
    if (c.left > 2) {
      val etot = math.min(c.word(), c.left)
      val e = new Cur(a, c.p, etot)
      var stop = false
      while (!stop && e.left > 0) {
        val et = e.word()
        val el = e.word()
        eja3.add(s"$et-")
        if (el > e.left) stop = true
        else {
          if (et == 0x2b && el == 2) {
            val sv = e.word() // consumed twice: also skipped below
            if (sv == 0x0304) { out.version ::= "TLSv1.3"; later12 = false }
          }
          if (et == 0x10 && el == 5 && e.left >= 5 &&
            (a(e.p) & 0xff) == 0 && (a(e.p + 1) & 0xff) == 3 &&
            (a(e.p + 2) & 0xff) == 2 && a(e.p + 3) == 'h' && a(e.p + 4) == '2')
            out.http2 = true
          e.jump(el)
        }
      }
      eja3.back()
    }
    if (later12) out.version ::= "TLSv1.2"
    val js = new MBuf(30000)
    js.add(s"$ver,$cipher,${eja3.view}")
    out.ja3sstring ::= js.asCStr
    out.ja3s ::= md5hex(js.view)
  }

  /** returns true on ServerHelloDone */
  private def mRecord(a: Array[Byte], off: Int, len: Int, out: MRes): Boolean = {
    var p = off
    while (off + len - p >= 4) {
      val mlen = math.min(off + len - p,
        (((a(p + 1) & 0xff) << 16) | ((a(p + 2) & 0xff) << 8) |
          (a(p + 3) & 0xff)) + 4)
      (a(p) & 0xff) match {
        case 2  => mServerHello(a, p + 4, mlen - 4, out)
        case 14 => return true
        case _  => // 11 = certs: out of scope; anything else skipped
      }
      p += mlen
    }
    false
  }

  private final class MServer(out: MRes) {
    private val b = new Array[Byte](8192)
    private var n = 0
    private var gone = false
    def push(d: Array[Byte]): Unit = {
      if (gone) return
      val k = math.min(d.length, b.length - n)
      System.arraycopy(d, 0, b, n, k)
      n += k
      if (n < 5) return
      if (b(0) != 0x16) { n = 0; gone = true; return }
      val need = (((b(3) & 0xff) << 8) | (b(4) & 0xff)) + 5
      if (need > n) return
      if (mRecord(b, 5, need - 5, out)) { n = 0; gone = true; return }
      n -= need
      if (n > 0) System.arraycopy(b, need, b, 0, n)
    }
    def flush(): Unit = {
      if (gone) return
      if (n > 5 && b(0) == 0x16)
        mRecord(b, 5, n - 5, out)
      n = 0
    }
  }

  private def mParse(chunks: Seq[(Int, Array[Byte])]): Option[MRes] = {
    def hit(d: Array[Byte]): Boolean =
      d.length >= 6 && d(0) == 0x16 && d(1) == 0x03 && (d(2) & 0xff) <= 3 &&
        (d(5) == 1 || d(5) == 2)
    val out = new MRes
    var srv: MServer = null
    var srvDir = -1
    chunks.foreach { case (dir, d) =>
      if (srv == null) {
        if (hit(d)) {
          srv = new MServer(out)
          if (d(5) == 1) { mClient(d, out); srvDir = 1 - dir }
          else { srvDir = dir; srv.push(d) }
        }
      } else if (dir == srvDir) srv.push(d)
    }
    if (srv == null) None
    else { srv.flush(); Some(out) }
  }

  // ------------------------------------------------------------- compare

  private def compare(chunks: Seq[(Int, Array[Byte])], label: String): Unit = {
    val m = mParse(chunks)
    val p = TlsParser.parseChunks(chunks)
    def fields(x: MRes) = Seq(
      "version" -> x.version.reverse.distinct,
      "cipher" -> x.cipher.reverse.distinct,
      "ja3" -> x.ja3.reverse.distinct,
      "ja3string" -> x.ja3string.reverse.distinct,
      "ja3s" -> x.ja3s.reverse.distinct,
      "ja3sstring" -> x.ja3sstring.reverse.distinct,
      "srcId" -> x.srcId.reverse.distinct,
      "dstId" -> x.dstId.reverse.distinct,
      "sni" -> x.sni.reverse.distinct,
      "http2" -> (if (x.http2) Seq("h2") else Nil))
    def pFields(x: TlsParser.TlsInfo) = Seq(
      "version" -> x.version, "cipher" -> x.cipher, "ja3" -> x.ja3,
      "ja3string" -> x.ja3string, "ja3s" -> x.ja3s,
      "ja3sstring" -> x.ja3sstring, "srcId" -> x.srcSessionId,
      "dstId" -> x.dstSessionId, "sni" -> x.sni, "http2" -> x.alpn)
    (m, p) match {
      case (None, None) => ()
      case (Some(a), Some(b)) =>
        val diffs = fields(a).zip(pFields(b)).filter { case ((_, x), (_, y)) =>
          x != y
        }
        assert(diffs.isEmpty, s"\n[$label]\n" + diffs.map {
          case ((f, x), (_, y)) => s"  $f:\n    model=$x\n    ours =$y"
        }.mkString("\n") + "\nchunks:\n" + chunks.map { case (d, c) =>
          s"  dir$d " + c.take(80).map(x => f"$x%02x").mkString(" ") +
            (if (c.length > 80) s" …(${c.length})" else "")
        }.mkString("\n"))
      case _ =>
        fail(s"[$label] model=${m.isDefined} ours=${p.isDefined}")
    }
  }

  // ------------------------------------------------------------ generator

  private final class Rng(var seed: Long) {
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  private final class Enc {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u24(v: Int): Unit = { u8(v >> 16); u8(v >> 8); u8(v) }
    def raw(x: Array[Byte]): Unit = b.write(x, 0, x.length)
    def bytes: Array[Byte] = b.toByteArray
  }

  private val greasePool = Seq(0x0a0a, 0x2a2a, 0x9a9a, 0xfafa, 0xbaba)
  private val cipherPool =
    Seq(0x002f, 0x0035, 0x009c, 0x1301, 0x1302, 0xc02b, 0xc02f, 0x7777)

  private def genClientHello(rng: Rng): Array[Byte] = {
    val body = new Enc // hello body after the 4-byte hs header
    body.u16(rng.pick(Seq(0x0301, 0x0303, 0x0303, 0x0304, 0x7f1c, 0x1234)))
    for (_ <- 0 until 32) body.u8(rng.nextInt(256))
    val sidLen = rng.pick(Seq(0, 0, 16, 32, 200))
    body.u8(sidLen)
    for (_ <- 0 until (if (rng.chance(10)) math.max(0, sidLen - 3) else sidLen))
      body.u8(rng.nextInt(256))
    // cipher list: sometimes odd length, sometimes lying length
    val nC = rng.nextInt(300)
    val declaredC =
      if (rng.chance(15)) nC * 2 + rng.pick(Seq(-2, 1, 2, 40)) else nC * 2
    body.u16(math.max(0, declaredC))
    for (_ <- 0 until nC) body.u16(
      if (rng.chance(25)) rng.pick(greasePool) else rng.pick(cipherPool))
    val nComp = rng.nextInt(3)
    body.u8(nComp); for (_ <- 0 until nComp) body.u8(0)
    // extensions
    if (!rng.chance(10)) {
      val exts = new Enc
      val nE = rng.nextInt(8)
      for (_ <- 0 until nE) rng.nextInt(7) match {
        case 0 => // SNI, sometimes with lying inner lengths
          val host = s"h${rng.nextInt(99)}.example"
          val e = new Enc
          val lie = if (rng.chance(25)) rng.pick(Seq(-1, 1, 4)) else 0
          e.u16(host.length + 3 + lie)
          e.u8(if (rng.chance(10)) 1 else 0)
          e.u16(host.length + (if (rng.chance(10)) 2 else 0))
          e.raw(host.getBytes(StandardCharsets.ISO_8859_1))
          exts.u16(0); exts.u16(e.bytes.length); exts.raw(e.bytes)
        case 1 => // curves: empty sometimes (the rewind-error path)
          val n = rng.pick(Seq(0, 0, 1, 3, 8, 400))
          val e = new Enc
          e.u16(if (rng.chance(15)) n * 2 + 3 else n * 2)
          for (_ <- 0 until n) e.u16(
            if (rng.chance(25)) rng.pick(greasePool) else 20 + rng.nextInt(12))
          exts.u16(10); exts.u16(e.bytes.length); exts.raw(e.bytes)
        case 2 => // point formats, empty sometimes
          val n = rng.pick(Seq(0, 1, 2, 250))
          val e = new Enc
          e.u8(if (rng.chance(15)) n + 2 else n)
          for (_ <- 0 until n) e.u8(rng.nextInt(3))
          exts.u16(11); exts.u16(e.bytes.length); exts.raw(e.bytes)
        case 3 => // grease ext, possibly empty
          exts.u16(rng.pick(greasePool))
          val n = rng.nextInt(4); exts.u16(n)
          for (_ <- 0 until n) exts.u8(rng.nextInt(256))
        case 4 => // lying extension length (overruns the block)
          exts.u16(rng.nextInt(0xffff)); exts.u16(2000 + rng.nextInt(60000))
        case _ => // misc ext
          val n = rng.nextInt(12)
          exts.u16(rng.pick(Seq(13, 16, 21, 35, 43, 51, 65281)))
          exts.u16(n); for (_ <- 0 until n) exts.u8(rng.nextInt(256))
      }
      val eb = exts.bytes
      val declaredE =
        if (rng.chance(15)) eb.length + rng.pick(Seq(-3, 2, 500))
        else eb.length
      body.u16(math.max(0, declaredE))
      body.raw(eb)
    }
    val hs = new Enc
    val hb = body.bytes
    hs.u8(1)
    hs.u24(if (rng.chance(12)) hb.length + rng.pick(Seq(-5, 7, 4000))
      else hb.length)
    hs.raw(hb)
    val rec = new Enc
    val hsb = hs.bytes
    rec.u8(0x16); rec.u8(3); rec.u8(rng.pick(Seq(0, 1, 3, 3)))
    rec.u16(if (rng.chance(12)) hsb.length + rng.pick(Seq(-4, 6, 9000))
      else hsb.length)
    rec.raw(hsb)
    var out = rec.bytes
    if (rng.chance(20)) out = out.take(6 + rng.nextInt(out.length - 5))
    out
  }

  private def genServerStream(rng: Rng): Array[Byte] = {
    val s = new Enc
    def record(t: Int, body: Array[Byte], lieLen: Int = 0): Unit = {
      s.u8(t); s.u8(3); s.u8(rng.nextInt(4))
      s.u16(math.max(0, body.length + lieLen)); s.raw(body)
    }
    def helloBody(): Array[Byte] = {
      val b = new Enc
      b.u16(rng.pick(Seq(0x0303, 0x0303, 0x0301, 0x0300, 0x7f17, 0x0304,
        0x4444)))
      for (_ <- 0 until 32) b.u8(rng.nextInt(256))
      val sl = rng.pick(Seq(0, 0, 32, 16, 250))
      b.u8(sl)
      for (_ <- 0 until (if (rng.chance(10)) math.max(0, sl - 2) else sl))
        b.u8(rng.nextInt(256))
      b.u16(rng.pick(cipherPool))
      b.u8(0)
      if (!rng.chance(15)) {
        val exts = new Enc
        val nE = rng.nextInt(5)
        for (_ <- 0 until nE) rng.nextInt(5) match {
          case 0 => // supported_versions FIRST sometimes — the desync
            exts.u16(0x2b); exts.u16(2)
            exts.u16(rng.pick(Seq(0x0304, 0x0304, 0x0303)))
          case 1 => // alpn: exact h2 needle or near-miss variants
            rng.nextInt(3) match {
              case 0 => exts.u16(0x10); exts.u16(5)
                exts.raw(Array[Byte](0, 3, 2, 'h', '2'))
              case 1 => exts.u16(0x10); exts.u16(5)
                exts.raw(Array[Byte](0, 3, 2, 'h', '3'))
              case _ =>
                val p = "http/1.1"
                exts.u16(0x10); exts.u16(p.length + 3)
                exts.u16(p.length + 1); exts.u8(p.length)
                exts.raw(p.getBytes(StandardCharsets.ISO_8859_1))
            }
          case 2 => // grease (NOT filtered from ja3s)
            exts.u16(rng.pick(greasePool)); exts.u16(0)
          case 3 => // lying length
            exts.u16(51); exts.u16(900 + rng.nextInt(60000))
          case _ =>
            val n = rng.nextInt(8)
            exts.u16(rng.pick(Seq(0, 5, 35, 0xff01)))
            exts.u16(n); for (_ <- 0 until n) exts.u8(rng.nextInt(256))
        }
        val eb = exts.bytes
        b.u16(if (rng.chance(15)) eb.length + rng.pick(Seq(-2, 3, 200))
          else eb.length)
        b.raw(eb)
      }
      val hs = new Enc
      val hb = b.bytes
      hs.u8(2)
      hs.u24(if (rng.chance(12)) hb.length + rng.pick(Seq(-6, 8, 70000))
        else hb.length)
      hs.raw(hb)
      hs.bytes
    }
    // hello record (sometimes preceded by junk/alert records)
    if (rng.chance(10)) record(21, Array[Byte](1, 0)) // alert first: kills
    record(22, helloBody(), if (rng.chance(10)) rng.pick(Seq(-8, 12)) else 0)
    if (rng.chance(50)) { // certificate message (skipped framing)
      val certs = new Enc
      val n = rng.nextInt(2000)
      certs.u8(11); certs.u24(n + 3); certs.u24(n)
      for (_ <- 0 until n) certs.u8(rng.nextInt(256))
      record(22, certs.bytes)
    }
    if (rng.chance(40)) { // big record: the 8 KiB overflow path
      val big = new Enc
      val n = 7000 + rng.nextInt(6000)
      big.u8(11); big.u24(n)
      for (_ <- 0 until n) big.u8(rng.nextInt(256))
      record(22, big.bytes)
    }
    if (rng.chance(60)) record(22, Array[Byte](14, 0, 0, 0)) // SHD: stop
    if (rng.chance(40)) record(20, Array[Byte](1)) // CCS after
    if (rng.chance(30)) { // another hello AFTER (parsed unless stopped)
      record(22, helloBody())
    }
    s.bytes
  }

  private def genSession(rng: Rng, recipe: StringBuilder)
      : Seq[(Int, Array[Byte])] = {
    val chunks = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    val clientFirst = !rng.chance(15)
    if (rng.chance(85)) {
      val ch = genClientHello(rng)
      recipe.append("ch ")
      if (clientFirst) chunks += ((0, ch)) else recipe.append("late ")
      if (!clientFirst) chunks += ((0, ch))
    } else recipe.append("noch ")
    var srv = genServerStream(rng)
    if (rng.chance(15)) { srv = srv.take(1 + rng.nextInt(srv.length)); recipe.append("strunc ") }
    // split the server stream into chunks at random boundaries
    val cuts = (Seq(0, srv.length) ++ (0 until rng.nextInt(6))
      .map(_ => rng.nextInt(srv.length + 1))).distinct.sorted
    val sChunks = cuts.sliding(2).collect {
      case Seq(a, b) if b > a => java.util.Arrays.copyOfRange(srv, a, b)
    }.toSeq
    recipe.append(s"s${sChunks.length} ")
    if (clientFirst) sChunks.foreach(c => chunks += ((1, c)))
    else {
      // server chunks first (server-classified session)
      val (pre, post) = sChunks.splitAt(1 + rng.nextInt(sChunks.length))
      val tail = chunks.toList
      chunks.clear()
      pre.foreach(c => chunks += ((1, c)))
      chunks ++= tail
      post.foreach(c => chunks += ((1, c)))
    }
    // stray client data chunks interleaved (ignored by the machine)
    if (rng.chance(30)) chunks.insert(rng.nextInt(chunks.length + 1),
      (0, Array.tabulate(rng.nextInt(40))(i => (i * 7).toByte)))
    // byte mutations: both sides are byte-exact machines
    if (rng.chance(20) && chunks.nonEmpty) {
      recipe.append("mut ")
      val k = rng.nextInt(chunks.length)
      val (d, c) = chunks(k)
      if (c.length > 0) {
        val b = c.clone()
        for (_ <- 0 to rng.nextInt(4))
          b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        chunks(k) = (d, b)
      }
    }
    chunks.toSeq
  }

  // --------------------------------------------------------------- tests

  test("generated sessions: walker matches the tls.c model") {
    // soak knobs: GRAFT_FUZZ_TRIALS=30000 GRAFT_FUZZ_SEED=0x... sbt test
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(1200)
    val rng = new Rng(sys.env.get("GRAFT_FUZZ_SEED")
      .map(java.lang.Long.decode(_).longValue).getOrElse(0x715cafeL))
    for (trial <- 0 until nTrials) {
      val recipe = new StringBuilder
      compare(genSession(rng, recipe), s"trial $trial: $recipe")
    }
  }

  test("pinned tls.c quirks") {
    def rec(t: Int, minor: Int, body: Seq[Int]): Array[Byte] =
      (Seq(t, 3, minor, body.length >> 8, body.length & 0xff) ++ body)
        .map(_.toByte).toArray
    // 1. supported_versions double-consume desyncs later extensions in
    // ja3s: exts = [43 len2 0304] [51 len0] — after reading 0304 the
    // skip eats "00 33", so the second ext parses as type 0x0000
    val sh1 = Seq(3, 3) ++ Seq.fill(32)(7) ++ Seq(0) ++ // ver, random, sid0
      Seq(0x13, 0x01, 0) ++ // cipher 0x1301, compression
      Seq(0, 10, 0, 0x2b, 0, 2, 3, 4, 0, 0x33, 0, 0) // exts
    val hs1 = Seq(2, 0, 0, sh1.length) ++ sh1
    val out1 = TlsParser.parseChunks(Seq((1, rec(0x16, 3, hs1))))
    assert(out1.exists(_.ja3sstring == Seq("771,4865,43-0")),
      s"desync quirk: got ${out1.map(_.ja3sstring)}")
    compare(Seq((1, rec(0x16, 3, hs1))), "supported_versions desync")

    // 2. client with an empty curves list: rewind on empty errors the
    // builder and suppresses the WHOLE ja3 (version still absent —
    // client never adds one)
    val chBody = Seq(3, 3) ++ Seq.fill(32)(9) ++ Seq(0) ++
      Seq(0, 2, 0x13, 0x01) ++ // one cipher
      Seq(1, 0) ++             // compression
      Seq(0, 6, 0, 10, 0, 2, 0, 0) // curves ext, list len 0
    val ch = Seq(1, 0, 0, chBody.length) ++ chBody
    val m2 = Seq((0, rec(0x16, 1, ch)), (1, rec(0x16, 3, hs1)))
    val got2 = TlsParser.parseChunks(m2).get
    assert(got2.ja3.isEmpty && got2.ja3string.isEmpty,
      "empty curve list must suppress ja3 (rewind-on-empty error)")
    compare(m2, "empty curves suppress ja3")

    // 3. ServerHelloDone stops the machine: a second hello after SHD in
    // the same direction is never parsed
    val shd = Seq(14, 0, 0, 0)
    val m3 = Seq((1, rec(0x16, 3, hs1)), (1, rec(0x16, 3, shd)),
      (1, rec(0x16, 3, Seq(2, 0, 0, sh1.length) ++ sh1)))
    val got3 = TlsParser.parseChunks(m3).get
    assert(got3.ja3s.size == 1, "hello after ServerHelloDone must not parse")
    compare(m3, "SHD unregisters")

    // 4. one record drained per chunk: two records in ONE chunk — the
    // second parses only via the save flush (here: exactly one record
    // remains, so it parses correctly)
    val twoRecs = rec(0x16, 3, hs1) ++ rec(0x16, 3, Seq(2, 0, 0,
      sh1.length) ++ sh1)
    compare(Seq((1, twoRecs)), "two records one chunk")

    // 5. save-flush parses the remainder as ONE record body ignoring
    // record framing: three records in one chunk leave two buffered —
    // the flush walks messages across the second record's boundary
    val threeRecs = twoRecs ++ rec(0x16, 3, shd)
    compare(Seq((1, threeRecs)), "three records one chunk (flush misparse)")

    // 6. truncated ServerHello (>= 34 bytes) still records version AND
    // cipher 0x0000
    val tiny = Seq(2, 0, 0, 40) ++ Seq(3, 1) ++ Seq.fill(32)(1) ++ Seq(0)
    val got6 = TlsParser.parseChunks(Seq((1, rec(0x16, 3, tiny)))).get
    assert(got6.version == Seq("TLSv1") && got6.cipher == Seq("0x0000"),
      s"truncated hello: ${got6.version} ${got6.cipher}")
    compare(Seq((1, rec(0x16, 3, tiny))), "truncated server hello")

    // 7. an alert-first chunk fails the classify gate; the next chunk
    // classifies and parses normally — but an alert RECORD fed to an
    // already-running machine kills it (head byte != 0x16)
    val m7 = Seq((1, rec(0x15, 3, Seq(1, 0))), (1, rec(0x16, 3, hs1)))
    assert(TlsParser.parseChunks(m7).exists(_.ja3s.nonEmpty),
      "second chunk classifies after a non-TLS first chunk")
    compare(m7, "alert first, hello second")
    val m7b = Seq((1, rec(0x16, 3, hs1) ++ rec(0x15, 3, Seq(1, 0))),
      (1, rec(0x16, 3, Seq(2, 0, 0, sh1.length) ++ sh1)))
    val got7b = TlsParser.parseChunks(m7b).get
    assert(got7b.ja3s.size == 1,
      "buffered alert record must unregister before the second hello")
    compare(m7b, "alert record kills the machine")
  }
}
