package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Decode, Pcap}
import graft.expr.Parser

/** Robustness under hostile input: at capture scale, truncated and
  * bit-flipped pcap files (and user-typed garbage expressions) are
  * routine — every parser must degrade (empty iterator / parse error),
  * never throw unexpectedly or hang. Seeded: failures reproduce.
  */
class FuzzSpec extends AnyFunSuite {

  test("random bytes never crash the pcap parser or decoder") {
    val r = new scala.util.Random(42)
    (0 until 300).foreach { i =>
      val len = r.nextInt(4096)
      val b = new Array[Byte](len)
      r.nextBytes(b)
      // magic sometimes planted so the record walker actually runs
      if (i % 3 == 0 && len >= 4) {
        b(0) = 0xd4.toByte; b(1) = 0xc3.toByte; b(2) = 0xb2.toByte; b(3) = 0xa1.toByte
      }
      Pcap.parseFile(b, s"fuzz$i").foreach { p =>
        Decode.decode(p) // Option result; must not throw
      }
    }
  }

  test("bit-flipped real captures never crash parse, decode, or sessionize") {
    val r = new scala.util.Random(7)
    val base = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/pcap/socks-http-example.pcap"))
    (0 until 60).foreach { _ =>
      val b = base.clone()
      (0 until 40).foreach { _ =>
        val i = r.nextInt(b.length)
        b(i) = (b(i) ^ (1 << r.nextInt(8))).toByte
      }
      Pcap.parseFile(b, "fuzz").foreach(p => Decode.decode(p))
    }
  }

  test("truncations at every boundary degrade to a shorter packet list") {
    val base = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/pcap/http-301-get.pcap"))
    val full = Pcap.parseFile(base, "t").size
    val r = new scala.util.Random(11)
    (0 until 100).foreach { _ =>
      val cut = r.nextInt(base.length)
      val n = Pcap.parseFile(java.util.Arrays.copyOf(base, cut), "t").size
      assert(n <= full)
    }
  }

  test("garbage expressions parse or raise IllegalArgumentException") {
    val r = new scala.util.Random(13)
    val alphabet = "ab=!&|()[]<>*/\\\"' .:$-0129\t"
    (0 until 500).foreach { _ =>
      val s = Seq.fill(r.nextInt(40))(alphabet(r.nextInt(alphabet.length))).mkString
      try { Parser.parse(s); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
