package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TlsParser

/** Round-trip property fuzz for the TLS hello parser and JA3/JA3S: a
  * structured encoder builds Client/ServerHello handshakes (random
  * cipher/extension/curve/format lists with GREASE values, session ids,
  * SNI, ALPN, supported_versions) and predicts ja3/ja3s strings +
  * digests, version naming, chosen cipher, session ids and SNI/ALPN
  * from the PUBLIC JA3 definition (md5 of
  * "ver,ciphers,exts,curves,formats" with GREASE filtered) — never from
  * the parser under test.
  *
  * Inputs stay on the reference-parseable shapes (r15, after the
  * tls.c-exact rewrite): the ClientHello is a single record in one
  * packet (the reference parses it from the classify packet only), the
  * server messages each fill a whole record fed record-per-chunk, and
  * supported_versions goes LAST in the server extension list (the
  * reference consumes its 2 payload bytes twice — tls.c:306-320 — which
  * desyncs any extension after it; that quirk is
  * TlsDifferentialFuzzSpec territory, not the public-JA3 oracle's).
  */
class TlsRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x715f0bbL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("US-ASCII")).map(x => f"${x & 0xff}%02x").mkString

  // GREASE per RFC 8701: 0xNaNa with equal nibbles-bytes
  private val grease = Seq(0x0a0a, 0x1a1a, 0x3a3a, 0x8a8a, 0xfafa)
  private def isGrease(v: Int): Boolean = grease.contains(v)

  private val cipherPool = Seq(0x002f, 0x0035, 0x009c, 0x1301, 0x1302,
    0xc02b, 0xc02f, 0xcca8)
  // independent copies of the public tables (IANA registry / moloch
  // version labels) for the subset the generator draws from
  private val cipherNames = Map(
    0x002f -> "TLS_RSA_WITH_AES_128_CBC_SHA",
    0x0035 -> "TLS_RSA_WITH_AES_256_CBC_SHA",
    0x009c -> "TLS_RSA_WITH_AES_128_GCM_SHA256",
    0x1301 -> "TLS_AES_128_GCM_SHA256",
    0x1302 -> "TLS_AES_256_GCM_SHA384",
    0xc02b -> "TLS_ECDHE_ECDSA_WITH_AES_128_GCM_SHA256",
    0xc02f -> "TLS_ECDHE_RSA_WITH_AES_128_GCM_SHA256",
    0xcca8 -> "TLS_ECDHE_RSA_WITH_CHACHA20_POLY1305_SHA256")

  private final class Enc {
    val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u24(v: Int): Unit = { u8(v >> 16); u8(v >> 8); u8(v) }
    def bytes(b: Array[Byte]): Unit = buf.write(b)
  }

  /** Wrap a handshake message body in (type, u24 len) and split it over
    * 1..3 TLS records (fragmentation is record-layer-legal).
    */
  private def toRecords(hsType: Int, body: Array[Byte],
      frags: Int): Array[Byte] = {
    val hs = new Enc
    hs.u8(hsType); hs.u24(body.length); hs.bytes(body)
    val full = hs.buf.toByteArray
    val cuts = (Seq(0, full.length) ++
      (1 until frags).map(_ => 1 + nextInt(math.max(1, full.length - 1))))
      .distinct.sorted
    val out = new Enc
    cuts.sliding(2).foreach {
      case Seq(a, b) if b > a =>
        out.u8(22); out.u16(0x0301); out.u16(b - a)
        out.buf.write(full, a, b - a)
      case _ =>
    }
    out.buf.toByteArray
  }

  private def extBlock(exts: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val e = new Enc
    exts.foreach { case (t, d) => e.u16(t); e.u16(d.length); e.bytes(d) }
    val out = new Enc
    out.u16(e.buf.size)
    out.bytes(e.buf.toByteArray)
    out.buf.toByteArray
  }

  test("client/server hellos round-trip JA3, JA3S, version, cipher, sni, alpn") {
    for (trial <- 0 until 200) {
      // ---- ClientHello ----
      val cVersion = oneOf(Seq(0x0301, 0x0302, 0x0303, 0x0303))
      val sidLen = oneOf(Seq(0, 16, 32))
      val sid = Array.tabulate(sidLen)(i => ((trial * 7 + i) & 0xff).toByte)
      val ciphers = ((0 until 2 + nextInt(6)).map(_ => oneOf(cipherPool)) ++
        (if (chance(60)) Seq(oneOf(grease)) else Nil))
      val cipherList = scala.util.Random.javaRandomToRandom(
        new java.util.Random(trial * 31L + 5)).shuffle(ciphers.toList)
      val curves = (0 until 1 + nextInt(4)).map(_ =>
        oneOf(Seq(23, 24, 25, 29, 30))) ++
        (if (chance(40)) Seq(oneOf(grease)) else Nil)
      val formats = (0 until 1 + nextInt(2)).map(_ => oneOf(Seq(0, 1, 2)))
      val sniHost = s"s${nextInt(40)}.example.com"
      val hasSni = chance(70)
      val alpnOffer = Seq("h2", "http/1.1")
      val hasAlpn = chance(50)
      val supportedV = if (chance(40)) Seq(oneOf(grease), 0x0304, 0x0303)
        else Nil
      val extList = Seq.newBuilder[(Int, Array[Byte])]
      if (hasSni) {
        val e = new Enc
        e.u16(sniHost.length + 3) // server_name_list length
        e.u8(0)                   // host_name
        e.u16(sniHost.length)
        e.bytes(sniHost.getBytes("US-ASCII"))
        extList += ((0, e.buf.toByteArray))
      }
      locally {
        val e = new Enc
        e.u16(curves.length * 2); curves.foreach(e.u16)
        extList += ((10, e.buf.toByteArray))
      }
      locally {
        val e = new Enc
        e.u8(formats.length); formats.foreach(e.u8)
        extList += ((11, e.buf.toByteArray))
      }
      if (hasAlpn) {
        val inner = new Enc
        alpnOffer.foreach { p =>
          inner.u8(p.length); inner.bytes(p.getBytes("US-ASCII"))
        }
        val e = new Enc
        e.u16(inner.buf.size); e.bytes(inner.buf.toByteArray)
        extList += ((16, e.buf.toByteArray))
      }
      if (supportedV.nonEmpty) {
        val e = new Enc
        e.u8(supportedV.length * 2); supportedV.foreach(e.u16)
        extList += ((43, e.buf.toByteArray))
      }
      if (chance(50)) extList += ((oneOf(grease), Array.emptyByteArray))
      if (chance(40)) extList += ((21, new Array[Byte](1 + nextInt(11)))) // padding
      val cExts = scala.util.Random.javaRandomToRandom(
        new java.util.Random(trial * 131L + 7)).shuffle(extList.result().toList)

      val ch = new Enc
      ch.u16(cVersion)
      ch.bytes(Array.fill[Byte](32)((trial & 0x7f).toByte)) // random
      ch.u8(sid.length); ch.bytes(sid)
      ch.u16(cipherList.length * 2); cipherList.foreach(ch.u16)
      ch.u8(1); ch.u8(0) // compression: null
      ch.bytes(extBlock(cExts))
      val clientStream = toRecords(1, ch.buf.toByteArray, 1)

      // ---- ServerHello ----
      val chosen = oneOf(cipherPool)
      val tls13 = chance(35)
      val sSid = Array.tabulate(oneOf(Seq(0, 32)))(i => (i + 3).toByte)
      val sExts = Seq.newBuilder[(Int, Array[Byte])]
      if (chance(40)) sExts += ((0xff01, Array[Byte](0)))
      var alpnChoice: Option[String] = None
      if (chance(40)) {
        // server ALPN: exactly one chosen protocol
        val p = oneOf(alpnOffer)
        alpnChoice = Some(p)
        val inner = new Enc
        inner.u8(p.length); inner.bytes(p.getBytes("US-ASCII"))
        val e = new Enc
        e.u16(inner.buf.size); e.bytes(inner.buf.toByteArray)
        sExts += ((16, e.buf.toByteArray))
      }
      // supported_versions LAST: the reference double-consumes its
      // payload (tls.c:306-320), desyncing any extension after it
      if (tls13) {
        val e = new Enc; e.u16(0x0304)
        sExts += ((43, e.buf.toByteArray))
      }
      val sExtList = sExts.result()
      val sh = new Enc
      sh.u16(0x0303)
      sh.bytes(Array.fill[Byte](32)(9))
      sh.u8(sSid.length); sh.bytes(sSid)
      sh.u16(chosen)
      sh.u8(0) // compression
      sh.bytes(extBlock(sExtList))
      val serverStream = toRecords(2, sh.buf.toByteArray, 1)

      // ---- expectations from the public JA3 definition ----
      val expJa3Str = Seq(
        cVersion.toString,
        cipherList.filterNot(isGrease).mkString("-"),
        cExts.map(_._1).filterNot(isGrease).mkString("-"),
        curves.filterNot(isGrease).mkString("-"),
        formats.mkString("-")).mkString(",")
      val expJa3sStr = Seq("771", chosen.toString,
        sExtList.map(_._1).mkString("-")).mkString(",")
      val expVersion = if (tls13) "TLSv1.3" else "TLSv1.2"

      val chunks = Seq((0, clientStream)) ++
        TlsParser.recordChunks(serverStream).map(1 -> _)
      val info = TlsParser.parseChunks(chunks)
        .getOrElse(fail(s"trial $trial: no TlsInfo"))
      assert(info.ja3string == Seq(expJa3Str), s"trial $trial ja3string")
      assert(info.ja3 == Seq(md5hex(expJa3Str)), s"trial $trial ja3")
      assert(info.ja3sstring == Seq(expJa3sStr), s"trial $trial ja3sstring")
      assert(info.ja3s == Seq(md5hex(expJa3sStr)), s"trial $trial ja3s")
      assert(info.version == Seq(expVersion), s"trial $trial version")
      assert(info.cipher == Seq(cipherNames(chosen)), s"trial $trial cipher")
      val sidHex = sid.map(b => f"${b & 0xff}%02x").mkString
      assert(info.srcSessionId ==
        (if (sidHex.isEmpty) Nil else Seq(sidHex)), s"trial $trial sid")
      assert(info.sni == (if (hasSni) Seq(sniHost) else Nil),
        s"trial $trial sni")
      assert(info.alpn ==
        (if (alpnChoice.contains("h2")) Seq("h2") else Nil),
        s"trial $trial alpn (only the exact h2 needle tags)")
    }
  }
}
