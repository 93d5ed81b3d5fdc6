package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.QuicParser

/** Differential fuzz of the QUIC walker against an independent second
  * transcription of the reference's machine (capture/parsers/quic.c
  * over udp.c's dispatch) — the ASN.1/HTTP/SMTP/DNS/TLS/SSH pattern.
  *
  * Quirk surface both transcribe (and the generator aims at):
  *  - classification ONLY on the first datagram per direction
  *    (udp.c:85-90): "Q05"/"Q04" at offset 1 need len > 100 and a
  *    0xc0-masked first byte; "Q02/3/4" at offset 9 need len > 100 and
  *    (byte0 & 0x83) == 0x01; "PRST" at offset 9 tags outright;
  *  - registered parsers see every later datagram of BOTH directions
  *    (and the registration datagram) until they unregister;
  *  - 2445: short/reset/non-frame datagrams keep the parser alive;
  *    version < 24 (or missing) unregisters; the first stream frame
  *    unregisters after a CHLO attempt on MIN(declared, remaining)
  *    bytes; LE data length 4 rewrites to 1024;
  *  - 4648: the first non-Q04x-long-header datagram unregisters;
  *    otherwise brute CHLO scan to len-20;
  *  - 5x: non-Q05 datagram unregisters; quic tags when both
  *    directions delivered; gives up after 20 datagrams;
  *  - chlo: quic tags once the 8-byte header imports; the entry walk
  *    needs remaining >= tagLen*8 + 8 after the header; cumulative LE
  *    end offsets, non-monotonic/overflowing offsets stop the walk.
  */
class QuicDifferentialFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- model

  private final case class MOut(host: List[String], ua: List[String],
      ver: List[String], tagged: Boolean)

  private def mChlo(d: Array[Byte], off: Int, len: Int,
      host: scala.collection.mutable.ListBuffer[String],
      ua: scala.collection.mutable.ListBuffer[String],
      ver: scala.collection.mutable.ListBuffer[String]): Boolean = {
    // returns the "tagged" signal (header read)
    if (len < 8) return false
    val tagOk = d(off) == 'C' && d(off + 1) == 'H' && d(off + 2) == 'L' &&
      d(off + 3) == 'O'
    val n = (d(off + 4) & 0xff) | ((d(off + 5) & 0xff) << 8)
    if (!tagOk || len - 8 < n * 8 + 8) return true
    val values = off + 8 + n * 8
    val vlen = len - 8 - n * 8
    var prev = 0
    var i = 0
    while (i < n) {
      val e = off + 8 + i * 8
      val endOff = (d(e + 4) & 0xff) | ((d(e + 5) & 0xff) << 8) |
        ((d(e + 6) & 0xff) << 16) | ((d(e + 7) & 0xff) << 24)
      if (endOff > vlen || prev > vlen || prev >= endOff) return true
      val s = new String(d, values + prev, endOff - prev,
        StandardCharsets.ISO_8859_1)
      val t = new String(d, e, 4, StandardCharsets.ISO_8859_1)
      if (t == "SNI\u0000") host += s
      else if (t == "UAID") ua += s
      else if (t == "VER\u0000") ver += s
      prev = endOff
      i += 1
    }
    true
  }

  private def mParse(dgrams: Seq[(Int, Array[Byte])]): Option[MOut] = {
    val host = scala.collection.mutable.ListBuffer[String]()
    val ua = scala.collection.mutable.ListBuffer[String]()
    val ver = scala.collection.mutable.ListBuffer[String]()
    var tagged = false
    var a24 = false
    var a46 = false
    var a5 = false
    var b5 = 0
    var n5 = 0
    val seen = new Array[Boolean](2)
    def pre(d: Array[Byte], at: Int, s: String): Boolean =
      d.length >= at + s.length &&
        (0 until s.length).forall(k => (d(at + k) & 0xff) == s.charAt(k))
    dgrams.foreach { case (w, d) =>
      if (!seen(w)) {
        seen(w) = true
        if (d.length > 100 && (d(0) & 0xc0) == 0xc0) {
          if (pre(d, 1, "Q05")) { if (!a5) { a5 = true; b5 = 1 << w; n5 = 0 } }
          if (pre(d, 1, "Q04")) a46 = true
        }
        if (d.length > 100 && (d(0) & 0x83) == 0x01 &&
          (pre(d, 9, "Q02") || pre(d, 9, "Q03") || pre(d, 9, "Q04")))
          a24 = true
        if (pre(d, 9, "PRST")) tagged = true
      }
      if (a24) a24 = {
        // quic_2445_udp_parser, re-derived
        var keep = true
        var fin = false
        if (d.length < 9 || (d(0) & 0x02) != 0) fin = true
        var o = if (!fin && (d(0) & 0x08) != 0) 9 else 1
        if (!fin && d.length < o + 5) fin = true
        var vv = -1
        if (!fin) {
          if ((d(0) & 0x01) != 0 && d(o) == 'Q') {
            vv = ((d(o + 1) & 0xff) - 48) * 100 +
              ((d(o + 2) & 0xff) - 48) * 10 + ((d(o + 3) & 0xff) - 48)
            o += 4
          }
          if (vv < 24) { keep = false; fin = true }
        }
        if (!fin) {
          o += (if ((d(0) & 0x30) == 0) 1 else ((d(0) & 0x30) >> 4) * 2)
          o += 12
          if (vv < 34) o += 1
          if (o > d.length) fin = true
        }
        if (!fin) {
          var p = o
          var looped = false
          while (!looped && p < d.length) {
            looped = true // the reference returns from every loop path
            val t = d(p) & 0xff
            p += 1
            if ((t & 0x80) != 0) {
              val oLen = if ((t & 0x1c) != 0) ((t & 0x1c) >> 2) + 1 else 0
              p += (t & 0x03) + 1 + oLen
              var dl = d.length - p
              var bad = p > d.length
              if ((t & 0x20) != 0) {
                if (!bad && p + 2 <= d.length) {
                  dl = (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8)
                  p += 2
                  if (dl == 4) dl = 1024
                } else bad = true
              }
              if (!bad) {
                if (mChlo(d, p, math.min(dl, d.length - p), host, ua, ver))
                  tagged = true
                keep = false
              }
            }
          }
        }
        keep
      }
      if (a46) a46 = {
        if (d.length < 20 || d(1) != 'Q' || (d(0) & 0xc0) != 0xc0) false
        else {
          val vv = ((d(2) & 0xff) - 48) * 100 + ((d(3) & 0xff) - 48) * 10 +
            ((d(4) & 0xff) - 48)
          if (vv < 46 || vv > 48) false
          else {
            var p = 5
            var hit = false
            while (!hit && p < d.length - 20) {
              if (pre(d, p, "CHLO")) {
                if (mChlo(d, p, d.length - p, host, ua, ver)) tagged = true
                hit = true
              } else p += 1
            }
            !hit
          }
        }
      }
      if (a5) a5 = {
        if (d.length < 20 || !pre(d, 1, "Q05")) false
        else {
          b5 |= 1 << w
          if (b5 == 3) { tagged = true; false }
          else { n5 += 1; n5 <= 20 }
        }
      }
    }
    if (tagged) Some(MOut(host.toList, ua.toList, ver.toList, tagged))
    else None
  }

  // ------------------------------------------------------------- compare

  private def compare(dgrams: Seq[(Int, Array[Byte])], label: String): Unit = {
    val m = mParse(dgrams)
    val p = QuicParser.parseDatagrams(dgrams)
    (m, p) match {
      case (None, None) => ()
      case (Some(a), Some(b)) =>
        val mf = Seq("host" -> a.host.distinct, "ua" -> a.ua.distinct,
          "ver" -> a.ver.distinct)
        val pf = Seq("host" -> b.host, "ua" -> b.useragent,
          "ver" -> b.version)
        val diffs = mf.zip(pf).filter { case ((_, x), (_, y)) => x != y }
        assert(diffs.isEmpty, s"\n[$label]\n" + diffs.map {
          case ((f, x), (_, y)) => s"  $f:\n    model=$x\n    ours =$y"
        }.mkString("\n"))
      case _ =>
        fail(s"[$label] model=${m.isDefined} ours=${p.isDefined}\n" +
          dgrams.map { case (w, d) =>
            s"  dir$w " + d.take(60).map(x => f"$x%02x").mkString(" ") +
              (if (d.length > 60) s" …(${d.length})" else "")
          }.mkString("\n"))
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

  private def genChlo(rng: Rng): Array[Byte] = {
    val e = new java.io.ByteArrayOutputStream
    def ascii(s: String): Unit =
      e.write(s.getBytes(StandardCharsets.ISO_8859_1), 0, s.length)
    if (rng.chance(10)) ascii("CHLX") else ascii("CHLO")
    val tags = (0 until rng.nextInt(5)).map(_ => rng.pick(Seq(
      "SNI\u0000", "UAID", "VER\u0000", "PAD\u0000", "AEAD")))
    val vals = tags.map(t => s"v${rng.nextInt(99)}-" + "x" * rng.nextInt(12))
    val declaredN =
      if (rng.chance(15)) tags.length + rng.pick(Seq(-1, 1, 200, 8000))
      else tags.length
    e.write(math.max(0, declaredN) & 0xff)
    e.write((math.max(0, declaredN) >> 8) & 0xff)
    e.write(rng.nextInt(256)); e.write(rng.nextInt(256))
    var cum = 0
    tags.zip(vals).foreach { case (t, v) =>
      ascii(t)
      cum += v.length
      val lied = if (rng.chance(15)) cum + rng.pick(Seq(-40, -1, 7, 90000))
        else cum
      e.write(lied & 0xff); e.write((lied >> 8) & 0xff)
      e.write((lied >> 16) & 0xff); e.write((lied >> 24) & 0xff)
    }
    vals.foreach(ascii)
    if (rng.chance(30)) for (_ <- 0 until rng.nextInt(30))
      e.write(rng.nextInt(256))
    e.toByteArray
  }

  private def gen2445(rng: Rng): Array[Byte] = {
    val e = new java.io.ByteArrayOutputStream
    val pn = rng.pick(Seq(0x00, 0x10, 0x20, 0x30))
    val flags = 0x01 | 0x08 | pn |
      (if (rng.chance(8)) 0x02 else 0) // sometimes PUBLIC_FLAG_RESET
    e.write(flags)
    for (_ <- 0 until 8) e.write(rng.nextInt(256)) // CID
    val ver = rng.pick(Seq(24, 30, 34, 39, 43, 45, 20, 23))
    val e2 = new java.io.ByteArrayOutputStream
    e2.write(flags)
    for (_ <- 0 until 8) e2.write(rng.nextInt(256))
    // version string Q0\d\d at offset 9
    e2.write('Q'); e2.write('0'); e2.write('0' + ver / 10)
    e2.write('0' + ver % 10)
    for (_ <- 0 until (if (pn == 0) 1 else (pn >> 4) * 2)) e2.write(0)
    for (_ <- 0 until 12) e2.write(rng.nextInt(256)) // hash
    if (ver < 34) e2.write(0)
    val t = 0x80 | (if (rng.chance(50)) 0x20 else 0) |
      (rng.nextInt(8) << 2) | rng.nextInt(4)
    e2.write(if (rng.chance(10)) t & 0x7f else t) // sometimes non-frame
    val sl = (t & 0x03) + 1
    val ol = if ((t & 0x1c) != 0) ((t & 0x1c) >> 2) + 1 else 0
    for (_ <- 0 until sl + ol) e2.write(rng.nextInt(256))
    val chlo = genChlo(rng)
    if ((t & 0x20) != 0) {
      val dl = if (rng.chance(20)) rng.pick(Seq(4, 0, 65535))
        else chlo.length
      e2.write(dl & 0xff); e2.write((dl >> 8) & 0xff)
    }
    e2.write(chlo, 0, chlo.length)
    // pad past the 100-byte classify gate
    val need = 101 - e2.size
    for (_ <- 0 until math.max(need, rng.nextInt(30)))
      e2.write(rng.pick(Seq(0, rng.nextInt(256))))
    val out = e2.toByteArray
    if (rng.chance(15)) out.take(9 + rng.nextInt(out.length - 9)) else out
  }

  private def gen4648(rng: Rng): Array[Byte] = {
    val e = new java.io.ByteArrayOutputStream
    e.write(0xc0 | rng.nextInt(0x40))
    val ver = rng.pick(Seq(46, 47, 48, 44, 49))
    e.write('Q'); e.write('0'); e.write('0' + ver / 10)
    e.write('0' + ver % 10)
    for (_ <- 0 until rng.nextInt(40)) e.write(0)
    val chlo = genChlo(rng)
    e.write(chlo, 0, chlo.length)
    val need = 101 - e.size
    for (_ <- 0 until math.max(need, 21)) e.write(0)
    e.toByteArray
  }

  private def gen5x(rng: Rng): Array[Byte] = {
    val e = new java.io.ByteArrayOutputStream
    e.write(if (rng.chance(80)) 0xc0 | rng.nextInt(0x40) else rng.nextInt(256))
    e.write('Q'); e.write('0'); e.write('5'); e.write('0' + rng.nextInt(2))
    val n = rng.pick(Seq(16, 50, 97, 150))
    for (_ <- 0 until n) e.write(rng.nextInt(256))
    e.toByteArray
  }

  private def genPrst(rng: Rng): Array[Byte] = {
    val e = new java.io.ByteArrayOutputStream
    for (_ <- 0 until 9) e.write(rng.nextInt(256))
    e.write('P'); e.write('R'); e.write('S'); e.write('T')
    for (_ <- 0 until rng.nextInt(20)) e.write(rng.nextInt(256))
    e.toByteArray
  }

  private def genSession(rng: Rng, recipe: StringBuilder)
      : Seq[(Int, Array[Byte])] = {
    val dgrams = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    val kinds = Seq("2445", "4648", "5x", "prst", "noise")
    val n = 1 + rng.nextInt(6)
    for (_ <- 0 until n) {
      val w = rng.nextInt(2)
      val k = rng.pick(kinds)
      recipe.append(s"$k$w ")
      val d = k match {
        case "2445" => gen2445(rng)
        case "4648" => gen4648(rng)
        case "5x"   => gen5x(rng)
        case "prst" => genPrst(rng)
        case _ =>
          Array.tabulate(rng.pick(Seq(5, 40, 120)))(i => (i * 31).toByte)
      }
      dgrams += ((w, d))
    }
    // byte mutations
    if (rng.chance(25) && dgrams.nonEmpty) {
      recipe.append("mut ")
      val i = rng.nextInt(dgrams.length)
      val (w, d) = dgrams(i)
      if (d.nonEmpty) {
        val b = d.clone()
        for (_ <- 0 to rng.nextInt(4))
          b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        dgrams(i) = (w, b)
      }
    }
    dgrams.toSeq
  }

  // --------------------------------------------------------------- tests

  test("generated sessions: walker matches the quic.c model") {
    // soak knobs: GRAFT_FUZZ_TRIALS=30000 GRAFT_FUZZ_SEED=0x... sbt test
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(2000)
    val rng = new Rng(sys.env.get("GRAFT_FUZZ_SEED")
      .map(java.lang.Long.decode(_).longValue).getOrElse(0x9b1cL))
    for (trial <- 0 until nTrials) {
      val recipe = new StringBuilder
      compare(genSession(rng, recipe), s"trial $trial: $recipe")
    }
  }

  test("pinned quic.c/udp.c quirks") {
    def mk(bytes: Seq[Int]): Array[Byte] = bytes.map(_.toByte).toArray
    // 1. classification only on the FIRST datagram per direction: a
    // quic-shaped SECOND datagram after a non-quic first never tags
    val noise = mk(Seq.fill(120)(0x11))
    val rng = new Rng(7)
    val q = gen2445(rng)
    assert(QuicParser.parseDatagrams(Seq((0, noise), (0, q))).isEmpty,
      "second datagram must not classify")
    compare(Seq((0, noise), (0, q)), "no second-datagram classify")
    // but the same datagram FIRST in the other direction classifies
    compare(Seq((0, noise), (1, q)), "other direction first classifies")

    // 2. PRST tags only as the first datagram of its direction
    val prst = mk(Seq.fill(9)(7) ++ "PRST".map(_.toInt) ++ Seq.fill(8)(0))
    assert(QuicParser.parseDatagrams(Seq((0, prst))).exists(_.tagged))
    assert(QuicParser.parseDatagrams(Seq((0, noise), (0, prst))).isEmpty,
      "PRST on a non-first datagram must not tag")

    // 3. LE dataLen == 4 rewrites to 1024 (quic.c:170-172): consumes
    // far past the actual 4 bytes — CHLO walk sees MIN(1024, remaining)
    compare(Seq((0, gen2445(new Rng(0x44)))), "dataLen 4 quirk seedcase")

    // 4. 5x gives up after 20 datagrams without the second direction
    val q5 = {
      val e = new java.io.ByteArrayOutputStream
      e.write(0xc1); e.write('Q'); e.write('0'); e.write('5'); e.write('0')
      for (_ <- 0 until 110) e.write(3)
      e.toByteArray
    }
    val oneSided = Seq((0, q5)) ++ (0 until 25).map(_ => (0, q5))
    assert(QuicParser.parseDatagrams(oneSided).isEmpty,
      "one-sided Q05x never tags")
    compare(oneSided, "5x gives up")
    val both = Seq((0, q5), (1, q5))
    assert(QuicParser.parseDatagrams(both).exists(_.tagged))
    compare(both, "5x both directions")
  }
}
