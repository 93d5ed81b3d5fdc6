package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.AppProtocols

/** Round-trip fuzz for the SOCKS4/4a/5 peel (reference:
  * capture/parsers/socks.c): handshakes built from the RFC 1928/1929
  * and SOCKS4/4a layouts with random inner payloads appended, the peel
  * expected to return exactly those inner streams plus the destination
  * from the generation model. Hostile corners: truncation, aborted
  * handshakes, server banners before the v5 reply, look-alike first
  * bytes without a server answer.
  */
class SocksRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x50c5eedL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private def ascii(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.ISO_8859_1)
  private def inner(): Array[Byte] =
    Array.fill(nextInt(60))(nextInt(256).toByte)

  private val userPool = Seq("", "fred", "svc-proxy", "a")
  private val hostPool = Seq("www.example.com", "x.io", "10.1.2.3")

  test("SOCKS4/4a round-trip: 120 handshakes peel to the model") {
    for (_ <- 0 until 120) {
      val port = 1 + nextInt(65535)
      val user = oneOf(userPool)
      val is4a = chance(40)
      val host = oneOf(hostPool)
      val ip = if (is4a) Array[Byte](0, 0, 0, (1 + nextInt(254)).toByte)
        else Array[Byte](10, nextInt(256).toByte, nextInt(256).toByte,
          (1 + nextInt(254)).toByte)
      val b = new java.io.ByteArrayOutputStream()
      b.write(4); b.write(if (chance(80)) 1 else 2)
      b.write(port >> 8); b.write(port & 0xff)
      b.write(ip)
      b.write(ascii(user)); b.write(0)
      if (is4a) { b.write(ascii(host)); b.write(0) }
      val innerSrc = inner()
      b.write(innerSrc)
      // server reply: 8 bytes starting 0x00, then the inner stream
      val innerDst = inner()
      val d = new java.io.ByteArrayOutputStream()
      d.write(0); d.write(90); d.write(new Array[Byte](6)); d.write(innerDst)
      val res = AppProtocols.peelSocks(b.toByteArray, d.toByteArray)
      assert(res.isDefined)
      val (s2, d2, info) = res.get
      assert(s2.sameElements(innerSrc))
      assert(d2.sameElements(innerDst))
      assert(info.port == port)
      assert(info.user == user)
      if (is4a) { assert(info.ip == null); assert(info.host == host) }
      else {
        assert(info.host == null)
        assert(info.ip == ip.map(_ & 0xff).mkString("."))
      }
    }
  }

  test("SOCKS5 round-trip: 150 handshakes across atyps and auth") {
    for (_ <- 0 until 150) {
      val port = 1 + nextInt(65535)
      val nMethods = 1 + nextInt(3)
      val withAuth = chance(40)
      val user = if (withAuth) "u" + nextInt(1000) else ""
      val pass = "p" + nextInt(1000)
      val atyp = oneOf(Seq(1, 3, 4))
      val host = oneOf(hostPool.filter(_ != "10.1.2.3"))
      val b = new java.io.ByteArrayOutputStream()
      b.write(5); b.write(nMethods)
      (0 until nMethods).foreach(_ => b.write(if (withAuth) 2 else 0))
      if (withAuth) {
        b.write(1); b.write(user.length); b.write(ascii(user))
        b.write(pass.length); b.write(ascii(pass))
      }
      b.write(5); b.write(1); b.write(0); b.write(atyp)
      val expIp = atyp match {
        case 1 =>
          val ip = Array[Byte](10, nextInt(256).toByte, nextInt(256).toByte, 9)
          b.write(ip); ip.map(_ & 0xff).mkString(".")
        case 3 =>
          b.write(host.length); b.write(ascii(host)); null
        case _ =>
          val v6 = new Array[Byte](16); v6(0) = 0x20; v6(1) = 0x01; v6(15) = 7
          b.write(v6); "2001::7"
      }
      b.write(port >> 8); b.write(port & 0xff)
      val innerSrc = inner()
      b.write(innerSrc)
      // server: [banner?] VER METHOD [auth ok], reply VER REP RSV ATYP …
      val d = new java.io.ByteArrayOutputStream()
      val banner = chance(25)
      if (banner) d.write(ascii("ssh-like banner\r\n"))
      d.write(5); d.write(if (withAuth) 2 else 0)
      if (withAuth) { d.write(1); d.write(0) }
      d.write(5); d.write(0); d.write(0); d.write(1)
      d.write(new Array[Byte](4)); d.write(0); d.write(0)
      val innerDst = inner()
      d.write(innerDst)
      // a banner before the method choice only happens on reverse-socks
      // sessions, where the peel runs with allowSocks4=false and skips
      // the server-must-answer-5-first guard (socks5-reverse golden)
      val res = AppProtocols.peelSocks(b.toByteArray, d.toByteArray,
        allowSocks4 = !banner)
      assert(res.isDefined, s"atyp $atyp auth=$withAuth banner=$banner")
      val (s2, d2, info) = res.get
      assert(s2.sameElements(innerSrc))
      assert(d2.sameElements(innerDst), s"atyp $atyp auth=$withAuth banner=$banner")
      assert(info.port == port)
      assert(info.user == user)
      assert(info.password == withAuth)
      if (atyp == 3) { assert(info.ip == null); assert(info.host == host) }
      else assert(info.ip == expIp)
      // the RFC 1929 sub-negotiation scan stands alone too (used when
      // the CONNECT never completes)
      if (withAuth)
        assert(AppProtocols.socks5AuthUser(b.toByteArray).contains(user))
    }
  }

  test("SOCKS gates and hostile: look-alikes, truncation, aborts") {
    // a TDS-like server answering 4/5-first-byte client noise must not peel
    val tds = Array[Byte](4, 1, 0, 80, 1, 2, 3, 4, 0)
    assert(AppProtocols.peelSocks(tds, Array[Byte](4, 1, 0)).isEmpty)
    val v5cli = Array[Byte](5, 1, 0, 5, 1, 0, 1, 1, 2, 3, 4, 0, 80)
    assert(AppProtocols.peelSocks(v5cli, Array[Byte](2, 0)).isEmpty)
    for (_ <- 0 until 150) {
      // truncate a valid handshake anywhere: must never throw, and an
      // incomplete request yields None or a well-formed partial peel
      val port = 1 + nextInt(65535)
      val b = new java.io.ByteArrayOutputStream()
      b.write(5); b.write(1); b.write(2)
      b.write(1); b.write(3); b.write(ascii("abc")); b.write(3); b.write(ascii("xyz"))
      b.write(5); b.write(1); b.write(0); b.write(3)
      b.write(7); b.write(ascii("x.io.co"))
      b.write(port >> 8); b.write(port & 0xff)
      val full = b.toByteArray
      val cut = 1 + nextInt(full.length)
      AppProtocols.peelSocks(full.take(cut),
        Array[Byte](5, 2, 1, 0, 5, 0, 0, 1, 0, 0, 0, 0, 0, 0))
      AppProtocols.socks5AuthUser(full.take(cut))
    }
  }
}
