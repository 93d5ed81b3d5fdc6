package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Yara

/** Differential fuzz for the YARA string-match engine: 200 seeded random
  * (payload, rule) pairs where every `$` string's expected presence is
  * decided by an independent naive byte-scan implementing the published
  * modifier semantics (ascii / wide = UTF-16LE expansion / nocase =
  * ASCII fold / fullword = no alphanumeric neighbor), and the rule
  * condition is then evaluated over those expected presences. The
  * engine's scan verdict must agree on every case — planted matches,
  * case-flipped plants under nocase, absent strings, and any/all/not
  * combinations.
  */
class YaraFuzzDiffSpec extends AnyFunSuite {

  private var seed = 0x5ca1ab1eL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private def randWord(lo: Int, hi: Int): String = {
    val n = lo + nextInt(hi - lo + 1)
    val sb = new StringBuilder
    for (_ <- 0 until n)
      sb += oneOf(("abcdefghijklmnopqrstuvwxyz" +
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789").toSeq)
    sb.toString
  }

  private def isAlnum(b: Byte): Boolean = {
    val c = b.toChar
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  }

  /** Naive reference matcher: does `s` (with modifiers) occur in `data`? */
  private def naivePresent(data: Array[Byte], s: String, nocase: Boolean,
      wide: Boolean, asciiToo: Boolean, fullword: Boolean): Boolean = {
    def fold(b: Byte): Byte =
      if (nocase && b >= 'A' && b <= 'Z') (b + 32).toByte else b
    def occursPattern(pat: Array[Byte], step: Int): Boolean = {
      var i = 0
      while (i + pat.length <= data.length) {
        var j = 0
        var ok = true
        while (ok && j < pat.length) {
          if (fold(data(i + j)) != fold(pat(j))) ok = false
          j += 1
        }
        if (ok && fullword) {
          // YARA fullword: the match is not immediately preceded or
          // followed by an alphanumeric byte (checked at the ascii
          // layer; generated fullword strings are ascii-only)
          if (i > 0 && isAlnum(data(i - 1))) ok = false
          if (i + pat.length < data.length && isAlnum(data(i + pat.length)))
            ok = false
        }
        if (ok) return true
        i += 1
      }
      false
    }
    val asciiPat = s.getBytes("ISO-8859-1")
    val widePat = s.flatMap(c => Seq(c, '\u0000')).mkString
      .getBytes("ISO-8859-1")
    if (wide && asciiToo) occursPattern(asciiPat, 1) || occursPattern(widePat, 2)
    else if (wide) occursPattern(widePat, 2)
    else occursPattern(asciiPat, 1)
  }

  // ---- hex patterns: ?? wildcards, ?A/A? masked nibbles, [n]/[lo-hi] ----

  private sealed trait HTok
  private final case class HLit(mask: Int, value: Int) extends HTok
  private final case class HJump(lo: Int, hi: Int) extends HTok

  /** Naive backtracking hex matcher — the independent oracle. */
  private def naiveHex(data: Array[Byte], toks: IndexedSeq[HTok]): Boolean = {
    def from(i: Int, t: Int): Boolean =
      if (t == toks.length) true
      else toks(t) match {
        case HLit(m, v) =>
          i < data.length && (data(i) & m) == v && from(i + 1, t + 1)
        case HJump(lo, hi) =>
          (lo to hi).exists(k => i + k <= data.length && from(i + k, t + 1))
      }
    (0 to data.length).exists(s => from(s, 0))
  }

  private def hexSrc(toks: Seq[HTok]): String = toks.map {
    case HLit(0xff, v) => f"$v%02X"
    case HLit(0x0f, v) => f"?${v & 0xf}%X"
    case HLit(0xf0, v) => f"${(v >> 4) & 0xf}%X?"
    case HLit(0x00, _) => "??"
    case HLit(m, v) => throw new IllegalStateException(f"mask $m%02x")
    case HJump(lo, hi) if lo == hi => s"[$lo]"
    case HJump(lo, hi) => s"[$lo-$hi]"
  }.mkString("{ ", " ", " }")

  test("hex engine agrees with a naive backtracking matcher on 200 pairs") {
    for (trial <- 0 until 200) {
      val data = new Array[Byte](128 + nextInt(1024))
      for (i <- data.indices) data(i) = nextInt(256).toByte
      // ~60% of patterns derive from a real payload slice (guaranteed
      // present before mutation), rest are random (usually absent) —
      // the naive matcher decides either way
      val fromPayload = nextInt(100) < 60
      val nTok = 3 + nextInt(8)
      val toks = scala.collection.mutable.ArrayBuffer[HTok]()
      if (fromPayload) {
        var pos = nextInt(math.max(1, data.length - 4 * nTok))
        var t = 0
        while (t < nTok) {
          val last = t == nTok - 1
          // jumps only interior (YARA forbids leading/trailing jumps)
          if (!last && t > 0 && toks.last.isInstanceOf[HLit] &&
            nextInt(100) < 25) {
            val k = 1 + nextInt(4)
            val slack = nextInt(3) // widen the range around the true gap
            toks += HJump(math.max(0, k - slack), k + nextInt(3))
            pos += k
          } else {
            val b = data(pos) & 0xff
            toks += (nextInt(4) match {
              case 0 => HLit(0x00, 0x00) // ??
              case 1 => HLit(0x0f, b & 0x0f)
              case 2 => HLit(0xf0, b & 0xf0)
              case _ => HLit(0xff, b)
            })
            pos += 1
          }
          t += 1
        }
        // mutate one literal in ~40% of derived patterns (may break it)
        if (nextInt(100) < 40) {
          val lits = toks.indices.filter(i => toks(i) match {
            case HLit(0xff, _) => true; case _ => false })
          if (lits.nonEmpty) {
            val i = lits(nextInt(lits.length))
            toks(i) = HLit(0xff, nextInt(256))
          }
        }
      } else {
        for (t <- 0 until nTok) {
          val last = t == nTok - 1
          if (!last && t > 0 && toks.last.isInstanceOf[HLit] &&
            nextInt(100) < 20)
            toks += HJump(nextInt(3), 2 + nextInt(5))
          else toks += (nextInt(4) match {
            case 0 => HLit(0x00, 0x00)
            case 1 => HLit(0x0f, nextInt(16))
            case 2 => HLit(0xf0, nextInt(16) << 4)
            case _ => HLit(0xff, nextInt(256))
          })
        }
      }
      // normalize: never end on a jump
      while (toks.nonEmpty && toks.last.isInstanceOf[HJump])
        toks.remove(toks.length - 1)
      if (toks.isEmpty) toks += HLit(0xff, nextInt(256))
      val expected = naiveHex(data, toks.toIndexedSeq)
      val src = s"rule H { strings: $$h = ${hexSrc(toks.toSeq)} condition: $$h }"
      val got = Yara.scan(Yara.parse(src), data).nonEmpty
      assert(got == expected,
        s"trial $trial: engine=$got naive=$expected\n$src")
    }
  }

  test("engine agrees with the naive matcher on 200 random rule/payload pairs") {
    for (trial <- 0 until 200) {
      // payload: binary noise with spaced printable runs
      val data = new Array[Byte](256 + nextInt(2048))
      for (i <- data.indices)
        data(i) = (if (nextInt(3) == 0) nextInt(256) else 32 + nextInt(95)).toByte
      // 2-4 strings, some planted, some absent
      val nStr = 2 + nextInt(3)
      val specs = (0 until nStr).map { si =>
        val w = randWord(4, 10)
        val nocase = nextInt(100) < 35
        val wide = nextInt(100) < 25
        val asciiToo = wide && nextInt(100) < 50
        val fullword = !wide && nextInt(100) < 30
        val mods = Seq(
          if (nocase) Some("nocase") else None,
          if (wide) Some("wide") else None,
          if (asciiToo) Some("ascii") else None,
          if (fullword) Some("fullword") else None).flatten.mkString(" ")
        // plant ~60% of strings into the payload
        if (nextInt(100) < 60 && data.length > 4 * w.length + 8) {
          val planted =
            if (nocase && nextInt(2) == 0)
              w.map(c => if (nextInt(2) == 0) c.toUpper else c.toLower)
            else w
          val bytes =
            if (wide && !asciiToo)
              planted.flatMap(c => Seq(c, '\u0000')).mkString.getBytes("ISO-8859-1")
            else planted.getBytes("ISO-8859-1")
          val at = nextInt(data.length - bytes.length)
          System.arraycopy(bytes, 0, data, at, bytes.length)
        }
        (s"s$si", w, mods, nocase, wide, asciiToo, fullword)
      }
      val present = specs.map { case (id, w, _, nocase, wide, asciiToo, fw) =>
        id -> naivePresent(data, w, nocase, wide, asciiToo, fw)
      }.toMap
      // condition: random over the strings
      val (condSrc, expected) = nextInt(4) match {
        case 0 => ("any of them", present.values.exists(identity))
        case 1 => ("all of them", present.values.forall(identity))
        case 2 =>
          val a = specs(nextInt(specs.length))._1
          val b = specs(nextInt(specs.length))._1
          (s"$$$a and not $$$b",
            present(a) && !present(b))
        case _ =>
          val a = specs(nextInt(specs.length))._1
          val b = specs(nextInt(specs.length))._1
          (s"$$$a or $$$b", present(a) || present(b))
      }
      val src = "rule T {\n  strings:\n" + specs.map { case (id, w, mods, _, _, _, _) =>
        s"""    $$$id = "$w"${if (mods.nonEmpty) " " + mods else ""}"""
      }.mkString("\n") + s"\n  condition: $condSrc\n}"
      val got = Yara.scan(Yara.parse(src), data).nonEmpty
      assert(got == expected,
        s"trial $trial: engine=$got naive=$expected presences=$present\n$src")
    }
  }
}
