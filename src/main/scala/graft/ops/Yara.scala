package graft.ops

import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** I12: YARA content rules over session payload bytes.
  *
  * The reference compiles rule files with libyara and tags matching
  * sessions `yara:<identifier>` (capture/yara.c:141-163, scan invoked
  * from the parser dispatch, parsers.c:1101). This implements the core
  * of the rule language natively — enough for typical network-content
  * rules (including the reference's tests/rules.yara):
  *
  *   - `strings:` text (`"..."` with `nocase`/`wide`/`ascii`/
  *     `fullword`), hex (`{ AA ?? BB }` with `??` wildcards and
  *     `[n]`/`[lo-hi]` jumps), and regex (`/re/`) entries;
  *   - `condition:` boolean algebra over string ids, `any/all/N of
  *     them`, `of ($prefix*)` string sets, positional `$x in (lo .. hi)`
  *     and `$x at n`, occurrence counts (`#x >= n`), and `filesize`
  *     comparisons with KB/MB/GB literals;
  *   - rule tags (`rule Name : tag1 tag2`).
  *
  * Scanning is a pure function over byte arrays, so it distributes as a
  * UDF over payload columns — each executor compiles nothing and shares
  * the broadcast rule list.
  */
object Yara {

  // ------------------------------------------------------------- model
  sealed trait Matcher {
    /** All (offset, length) matches of this string in `b`, offset-sorted
      * and offset-distinct (when needle variants — wide, xor keys,
      * base64 alignments — collide on an offset, the first variant's
      * length is reported, like YARA's first-match bookkeeping).
      */
    def hits(b: Array[Byte]): Seq[(Int, Int)]
    /** All match offsets (start positions) of this string in `b`. */
    final def offsets(b: Array[Byte]): Seq[Int] = hits(b).map(_._1)
    def matches(b: Array[Byte]): Boolean = hits(b).nonEmpty
  }

  /** Text needle; `nocase` folds ASCII case; `wide` also tries UTF-16LE. */
  final case class TextMatcher(text: String, nocase: Boolean, wide: Boolean,
      fullword: Boolean = false) extends Matcher {
    private val needles: Seq[Array[Byte]] = {
      val ascii = text.getBytes(StandardCharsets.ISO_8859_1)
      if (wide) Seq(ascii, text.flatMap(c => Seq(c, '\u0000')).mkString
        .getBytes(StandardCharsets.ISO_8859_1))
      else Seq(ascii)
    }
    private def lower(x: Byte): Byte =
      if (x >= 'A' && x <= 'Z') (x + 32).toByte else x
    private def alnum(x: Byte): Boolean =
      (x >= '0' && x <= '9') || (x >= 'A' && x <= 'Z') ||
        (x >= 'a' && x <= 'z')
    def hits(b: Array[Byte]): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      needles.foreach { n =>
        var i = 0
        while (i + n.length <= b.length) {
          var j = 0
          while (j < n.length && (if (nocase) lower(b(i + j)) == lower(n(j))
            else b(i + j) == n(j))) j += 1
          if (j == n.length &&
            (!fullword ||
              ((i == 0 || !alnum(b(i - 1))) &&
               (i + n.length == b.length || !alnum(b(i + n.length))))))
            out += ((i, n.length))
          i += 1
        }
      }
      out.result().sortBy(_._1).distinctBy(_._1)
    }
  }

  /** Hex pattern token: exact byte, `??` wildcard, or a `[lo-hi]` jump
    * (YARA's variable-length gap; `[n]` is `[n-n]`).
    */
  sealed trait HexTok
  final case class HexByte(v: Int) extends HexTok
  case object HexAny extends HexTok
  /** Half-wildcard nibble: `?A` masks the high nibble, `A?` the low. */
  final case class HexMasked(v: Int, mask: Int) extends HexTok
  final case class HexJump(lo: Int, hi: Int) extends HexTok

  /** Hex pattern with wildcards and jumps (DFS over jump lengths; rule
    * patterns are short, payloads bounded by the capture snap length).
    */
  final case class HexMatcher(pattern: Array[HexTok]) extends Matcher {
    /** End index of the match starting at i0, or -1; jumps try the
      * SHORTEST gap first, so a variable pattern reports its shortest
      * match length at each offset.
      */
    private def matchAt(b: Array[Byte], i0: Int, t0: Int): Int = {
      var i = i0
      var t = t0
      while (t < pattern.length) {
        pattern(t) match {
          case HexByte(v) =>
            if (i >= b.length || (b(i) & 0xff) != v) return -1
            i += 1; t += 1
          case HexAny =>
            if (i >= b.length) return -1
            i += 1; t += 1
          case HexMasked(v, mask) =>
            if (i >= b.length || (b(i) & mask) != v) return -1
            i += 1; t += 1
          case HexJump(lo, hi) =>
            var g = lo
            while (g <= hi && i + g <= b.length) {
              val e = matchAt(b, i + g, t + 1)
              if (e >= 0) return e
              g += 1
            }
            return -1
        }
      }
      i
    }
    def hits(b: Array[Byte]): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      var i = 0
      while (i <= b.length - 1) {
        val e = matchAt(b, i, 0)
        if (e >= 0) out += ((i, e - i))
        i += 1
      }
      out.result()
    }
  }
  object HexMatcher {
    def bytes(vs: Int*): HexMatcher =
      HexMatcher(vs.map(v => if (v == -1) HexAny else HexByte(v))
        .toArray[HexTok])
  }

  /** `xor` modifier: the text under every single-byte XOR key in
    * [lo, hi] (YARA defaults to the full 0x00-0xff range). YARA forbids
    * combining with nocase; enforced at parse.
    */
  final case class XorMatcher(text: String, lo: Int = 0, hi: Int = 255,
      wide: Boolean = false) extends Matcher {
    private val plains: Seq[Array[Byte]] = {
      val ascii = text.getBytes(StandardCharsets.ISO_8859_1)
      if (wide) Seq(ascii, text.flatMap(c => Seq(c, '\u0000')).mkString
        .getBytes(StandardCharsets.ISO_8859_1))
      else Seq(ascii)
    }
    def hits(b: Array[Byte]): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      plains.foreach { p =>
        var key = lo
        while (key <= hi) {
          var i = 0
          while (i + p.length <= b.length) {
            var j = 0
            while (j < p.length && (b(i + j) ^ key).toByte == p(j)) j += 1
            if (j == p.length) out += ((i, p.length))
            i += 1
          }
          key += 1
        }
      }
      out.result().sortBy(_._1).distinctBy(_._1)
    }
  }

  /** `base64` / `base64wide` modifiers: the three alignment-shifted
    * base64 encodings of the text, partial leading/trailing sextets
    * trimmed (YARA's documented semantics: prepend 0/1/2 dummy bytes,
    * encode, strip the characters whose bits mix with the padding).
    * `wide` interleaves the RESULTING base64 needles with NULs.
    */
  final case class Base64Matcher(text: String, wide: Boolean = false)
      extends Matcher {
    private val needles: Seq[Array[Byte]] = {
      val raw = text.getBytes(StandardCharsets.ISO_8859_1)
      val enc = java.util.Base64.getEncoder
      val variants = (0 to 2).map { pad =>
        val padded = Array.fill[Byte](pad)(0) ++ raw
        var s = enc.encodeToString(padded).replaceAll("=+$", "")
        // leading chars sharing bits with the dummy prefix: pad bytes
        // occupy ceil(pad*8/6) leading sextets, and the next sextet mixes
        // pad-tail bits with the first real byte when pad*8 % 6 != 0
        val lead = (pad * 8 + 5) / 6
        s = s.substring(lead)
        // trailing sextet mixing real bits with padding zeros
        val totalBits = padded.length * 8
        if (totalBits % 6 != 0) s = s.substring(0, s.length - 1)
        s
      }.distinct
      variants.map { v =>
        if (wide) v.flatMap(c => Seq(c, '\u0000')).mkString
          .getBytes(StandardCharsets.ISO_8859_1)
        else v.getBytes(StandardCharsets.ISO_8859_1)
      }
    }
    def hits(b: Array[Byte]): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      needles.filter(_.nonEmpty).foreach { n =>
        var i = 0
        while (i + n.length <= b.length) {
          var j = 0
          while (j < n.length && b(i + j) == n(j)) j += 1
          if (j == n.length) out += ((i, n.length))
          i += 1
        }
      }
      out.result().sortBy(_._1).distinctBy(_._1)
    }
  }

  /** Regex over the latin-1 view of the bytes (YARA regex semantics);
    * `nocase` is the word modifier (a silent no-op before round 7).
    */
  final case class RegexMatcher(re: String, nocase: Boolean = false)
      extends Matcher {
    private val p = java.util.regex.Pattern.compile(re,
      if (nocase) java.util.regex.Pattern.CASE_INSENSITIVE else 0)
    def hits(b: Array[Byte]): Seq[(Int, Int)] = {
      val m = p.matcher(new String(b, StandardCharsets.ISO_8859_1))
      val out = Seq.newBuilder[(Int, Int)]
      while (m.find()) out += ((m.start(), m.end() - m.start()))
      out.result()
    }
  }

  sealed trait Cond
  final case class Ref(id: String) extends Cond
  final case class InRange(id: String, lo: Int, hi: Int) extends Cond
  final case class At(id: String, offset: Int) extends Cond
  final case class CountCmp(id: String, op: String, n: Int) extends Cond
  /** `#a in (lo..hi)` (YARA 4.x): occurrences within the byte range. */
  final case class CountInRange(id: String, op: String, n: Int,
      lo: Int, hi: Int) extends Cond
  final case class FilesizeCmp(op: String, n: Long) extends Cond
  /** Reference to another rule's verdict (must be defined earlier in the
    * file, as YARA requires).
    */
  final case class RuleRef(name: String) extends Cond
  /** `uint8/16/32[be](offset) op value` — the magic-number reads used by
    * network/file-type rules. Default little-endian like YARA;
    * `signed` sign-extends the read (the `intN` forms).
    */
  final case class UIntCmp(width: Int, bigEndian: Boolean, offset: Int,
      op: String, value: Long, signed: Boolean = false) extends Cond
  /** `N of them` / `of ($p*)` / `of ($a, $b, $p*)`: `prefix` is the
    * single-star form, `ids` the explicit set (entries ending `*` match
    * by prefix); both empty = `them`. `range` is the 4.3 `of … in
    * (lo..hi)` form — a string only counts if one of its offsets falls
    * inside the range.
    */
  final case class OfThem(n: Option[Int], prefix: Option[String] = None,
      ids: Seq[String] = Nil, range: Option[(Int, Int)] = None)
      extends Cond
  /** A numeric operand inside a `for` body / loop bound: a literal or a
    * string's occurrence count (`#a`).
    */
  sealed trait NumE
  final case class NumLit(v: Long) extends NumE
  final case class NumCount(id: String) extends NumE
  /** `@id[k]` (offset) or `!id[k]` (match length, `len = true`) as a
    * numeric operand; `ord` None = the enclosing loop variable.
    * Undefined ordinals make the enclosing comparison false (YARA's
    * undefined-value propagation).
    */
  final case class NumOffset(id: String, ord: Option[Int],
      len: Boolean = false) extends NumE
  /** `for <q> i in (lo..hi) : ( … )` over occurrence ordinals (1-based,
    * like YARA's `@a[i]`). The body is a Cond tree whose
    * [[OffIdxCmp]]/[[OffIdxIn]] leaves read `@id[i]` under the binding.
    */
  final case class ForIndex(n: Option[Int], lo: NumE, hi: NumE,
      body: Cond) extends Cond
  /** `@id[i] op rhs` (offset) / `!id[i] op rhs` (match length,
    * `len = true`) under a [[ForIndex]] binding.
    */
  final case class OffIdxCmp(id: String, op: String, rhs: NumE,
      len: Boolean = false) extends Cond
  /** `@id[i] in (lo..hi)` / `!id[i] in (lo..hi)` under a binding. */
  final case class OffIdxIn(id: String, lo: Int, hi: Int,
      len: Boolean = false) extends Cond
  /** `for <q> of <set> : ( … )`: the body is an ordinary Cond over the
    * placeholder id `$` (`$`, `$ at`, `$ in`, `#`, `@[k]`, `![k]` all
    * parse to id "$"), re-bound to each string of the set in turn.
    */
  final case class ForOf(n: Option[Int], prefix: Option[String],
      ids: Seq[String], body: Cond) extends Cond
  final case class And(a: Cond, b: Cond) extends Cond
  final case class Or(a: Cond, b: Cond) extends Cond
  final case class Not(a: Cond) extends Cond

  /** `for i in (lo..hi)` iteration clamp — YARA likewise bounds loop
    * iterations so a rule can't stall the scanner; payload offsets are
    * snap-length-bounded, so real rules sit far below this.
    */
  val MaxLoopIterations = 100000L

  private def cmp(op: String, a: Long, b: Long): Boolean = op match {
    case ">" => a > b
    case ">=" => a >= b
    case "<" => a < b
    case "<=" => a <= b
    case "==" => a == b
    case "!=" => a != b
    case other => throw new IllegalArgumentException(s"bad operator $other")
  }

  final case class Rule(name: String, tags: Seq[String],
      strings: Seq[(String, Matcher)], condition: Cond,
      priv: Boolean = false, glob: Boolean = false) {
    /** `env`: verdicts of rules defined earlier in the file, for
      * [[RuleRef]] conditions ([[scan]] threads it in order).
      */
    def matches(b: Array[Byte],
        env: Map[String, Boolean] = Map.empty): Boolean = {
      lazy val hit: Map[String, Boolean] =
        strings.map { case (id, m) => id -> m.matches(b) }.toMap
      // memoized per payload: for-loop bodies read the same string's
      // matches once per iteration — never rescan
      val hitsCache = scala.collection.mutable.Map[String, IndexedSeq[(Int, Int)]]()
      def hitsOf(id: String): IndexedSeq[(Int, Int)] =
        hitsCache.getOrElseUpdate(id,
          strings.collectFirst { case (`id`, m) => m }
            .map(_.hits(b).toIndexedSeq).getOrElse(IndexedSeq.empty))
      def offsetsOf(id: String): Seq[Int] = hitsOf(id).map(_._1)
      def subset(prefix: Option[String], ids: Seq[String]) =
        if (ids.nonEmpty)
          strings.filter(s => ids.exists(sel =>
            if (sel.endsWith("*")) s._1.startsWith(sel.dropRight(1))
            else s._1 == sel))
        else prefix match {
          case None => strings
          case Some(p) => strings.filter(_._1.startsWith(p))
        }
      // `sBind` re-points the placeholder id "$" inside a ForOf body;
      // `iBind` is the 1-based occurrence ordinal inside a ForIndex body
      def eval(c: Cond, sBind: String = "$", iBind: Int = 0): Boolean = {
        def rid(id: String): String = if (id == "$") sBind else id
        // None = undefined (out-of-range ordinal) — comparisons on it
        // are false, like YARA's undefined propagation
        def num(e: NumE): Option[Long] = e match {
          case NumLit(v) => Some(v)
          case NumCount(id) => Some(offsetsOf(rid(id)).length.toLong)
          case NumOffset(id, ord, len) =>
            hitsOf(rid(id)).lift(ord.getOrElse(iBind) - 1)
              .map(h => (if (len) h._2 else h._1).toLong)
        }
        c match {
          case Ref(id) => hit.getOrElse(rid(id), false)
          case InRange(id, lo, hi) =>
            offsetsOf(rid(id)).exists(o => o >= lo && o <= hi)
          case At(id, off) => offsetsOf(rid(id)).contains(off)
          case CountCmp(id, op, n) =>
            cmp(op, offsetsOf(rid(id)).length.toLong, n)
          case CountInRange(id, op, n, lo, hi) =>
            cmp(op, offsetsOf(rid(id)).count(o => o >= lo && o <= hi).toLong, n)
          case FilesizeCmp(op, n) => cmp(op, b.length.toLong, n)
          case RuleRef(r) => env.getOrElse(r,
            throw new IllegalArgumentException(
              s"condition references undefined rule $r"))
          case UIntCmp(w, be, off, op, v, signed) =>
            val nBytes = w / 8
            if (off < 0 || off + nBytes > b.length) false
            else {
              var x = 0L
              var k = 0
              while (k < nBytes) {
                val byte = b(off + k) & 0xffL
                x |= (if (be) byte << (8 * (nBytes - 1 - k)) else byte << (8 * k))
                k += 1
              }
              if (signed) x = (x << (64 - w)) >> (64 - w) // sign-extend
              cmp(op, x, v)
            }
          case OfThem(n, p, ids, range) =>
            val sel = subset(p, ids)
            def ok(id: String): Boolean = range match {
              case None => hit(id)
              case Some((lo, hi)) =>
                offsetsOf(id).exists(o => o >= lo && o <= hi)
            }
            n match {
              case None => sel.nonEmpty && sel.forall(s => ok(s._1))
              case Some(k) => sel.count(s => ok(s._1)) >= k
            }
          case ForIndex(n, loE, hiE, body) =>
            // lazy, capped iteration: a rule may write any literal
            // bounds (`for any i in (1..0x7fffffff)`), so the range is
            // never materialized and is clamped like YARA's own loop
            // iteration limit; `any`/`N` short-circuit at N hits, `all`
            // at the first miss
            (num(loE), num(hiE)) match {
              case (Some(lo0), Some(hi0)) =>
                val lo = math.max(1L, lo0)
                val hi = math.min(hi0, lo + MaxLoopIterations - 1)
                def idxs = Iterator.iterate(lo)(_ + 1)
                  .takeWhile(_ <= hi).map(_.toInt)
                n match {
                  case None => lo <= hi &&
                    idxs.forall(i => eval(body, sBind, i))
                  case Some(k) =>
                    idxs.filter(i => eval(body, sBind, i)).take(k).size >= k
                }
              case _ => false
            }
          case OffIdxCmp(id, op, rhs, len) =>
            // @a[i] is 1-based; out-of-range ordinal = undefined = false
            (hitsOf(rid(id)).lift(iBind - 1), num(rhs)) match {
              case (Some(h), Some(r)) =>
                cmp(op, (if (len) h._2 else h._1).toLong, r)
              case _ => false
            }
          case OffIdxIn(id, lo, hi, len) =>
            hitsOf(rid(id)).lift(iBind - 1)
              .map(h => if (len) h._2 else h._1)
              .exists(v => v >= lo && v <= hi)
          case ForOf(n, p, ids, body) =>
            val sel = subset(p, ids)
            n match {
              case None => sel.nonEmpty &&
                sel.forall(s => eval(body, s._1, iBind))
              case Some(k) => sel.count(s => eval(body, s._1, iBind)) >= k
            }
          case And(x, y) => eval(x, sBind, iBind) && eval(y, sBind, iBind)
          case Or(x, y) => eval(x, sBind, iBind) || eval(y, sBind, iBind)
          case Not(x) => !eval(x, sBind, iBind)
        }
      }
      eval(condition)
    }
  }

  // ------------------------------------------------------------ parser
  /** Parse a rules file; unsupported constructs raise with the rule name. */
  def parse(source: String): Seq[Rule] = {
    // strip comments
    val src = source.replaceAll("(?s)/\\*.*?\\*/", "")
      .replaceAll("(?m)//.*$", "")
    val headRe =
      ("((?:(?:private|global)\\s+)*)rule\\s+(\\w+)" +
        "\\s*(?::\\s*([\\w \\t]+?))?\\s*\\{").r
    headRe.findAllMatchIn(src).map { m =>
      val mods = Option(m.group(1)).getOrElse("")
      val priv = mods.contains("private")
      val glob = mods.contains("global")
      val name = m.group(2)
      val tags = Option(m.group(3)).map(_.trim.split("\\s+").toSeq)
        .getOrElse(Nil).filter(_.nonEmpty)
      // walk to the matching close brace, skipping string/regex literals
      val start = m.end
      var i = start
      var depth = 1
      while (i < src.length && depth > 0) {
        src.charAt(i) match {
          case '"' | '/' =>
            val quote = src.charAt(i)
            i += 1
            while (i < src.length && src.charAt(i) != quote) {
              if (src.charAt(i) == '\\') i += 1
              i += 1
            }
          case '{' => depth += 1
          case '}' => depth -= 1
          case _ =>
        }
        i += 1
      }
      val body = src.substring(start, math.max(start, i - 1))
      def section(kw: String): Option[String] = {
        val i = body.indexOf(kw + ":")
        if (i < 0) None
        else {
          val after = body.substring(i + kw.length + 1)
          val ends = Seq("strings:", "condition:", "meta:")
            .filter(k => k != kw + ":")
            .map(after.indexOf).filter(_ >= 0)
          Some(if (ends.isEmpty) after else after.substring(0, ends.min))
        }
      }
      val strRe = ("\\$(\\w+)\\s*=\\s*(?:\"((?:[^\"\\\\]|\\\\.)*)\"" +
        "((?:[\\w \\t]|\\([^)]*\\))*)|\\{([^}]*)\\}" +
        "|/((?:[^/\\\\]|\\\\.)*)/([\\w \\t]*))").r
      val strings = section("strings").map { s =>
        strRe.findAllMatchIn(s).map { sm =>
          val id = sm.group(1)
          val matcher =
            if (sm.group(2) != null) {
              val mods = Option(sm.group(3)).getOrElse("")
              val text = unescape(sm.group(2))
              val nocase = mods.contains("nocase")
              val wide = mods.contains("wide")
              if (mods.contains("base64")) {
                // YARA: base64 is incompatible with nocase/xor/fullword
                if (nocase || mods.contains("xor") ||
                  mods.contains("fullword"))
                  throw new IllegalArgumentException(
                    s"rule $name: base64 cannot combine with nocase/xor/fullword")
                Base64Matcher(text, wide = mods.contains("base64wide"))
              } else if (mods.contains("xor")) {
                if (nocase) throw new IllegalArgumentException(
                  s"rule $name: xor cannot combine with nocase")
                // optional key range: xor(0x01) / xor(0x10-0x8f)
                val rangeRe = "xor\\s*\\(\\s*(0x[0-9a-fA-F]+|\\d+)" +
                  "(?:\\s*-\\s*(0x[0-9a-fA-F]+|\\d+))?\\s*\\)"
                val (lo, hi) = rangeRe.r.findFirstMatchIn(mods) match {
                  case Some(rm) =>
                    val a = numLit(rm.group(1)).toInt
                    val b = Option(rm.group(2)).map(numLit(_).toInt)
                      .getOrElse(a)
                    (a, b)
                  case None => (0, 255)
                }
                XorMatcher(text, lo, hi, wide = wide)
              } else TextMatcher(text,
                nocase = nocase,
                wide = wide,
                fullword = mods.contains("fullword"))
            } else if (sm.group(4) != null) {
              val body = sm.group(4).trim
              val tokRe =
                ("(\\?\\?|[0-9a-fA-F]{2}|[0-9a-fA-F]\\?|\\?[0-9a-fA-F]" +
                  "|\\[\\s*\\d+(?:\\s*-\\s*\\d+)?\\s*\\])").r
              val parsed = tokRe.findAllIn(body).map {
                case "??" => HexAny
                case t if t.startsWith("[") =>
                  val nums = "\\d+".r.findAllIn(t).map(_.toInt).toSeq
                  if (nums.length == 2) HexJump(nums(0), nums(1))
                  else HexJump(nums.head, nums.head)
                case t if t.charAt(0) == '?' => // ?A: high nibble masked
                  HexMasked(Integer.parseInt(t.substring(1), 16), 0x0f)
                case t if t.charAt(1) == '?' => // A?: low nibble masked
                  HexMasked(Integer.parseInt(t.substring(0, 1), 16) << 4, 0xf0)
                case h => HexByte(Integer.parseInt(h, 16))
              }.toArray[HexTok]
              val consumed = tokRe.findAllIn(body).mkString(" ")
                .replaceAll("\\s+", "")
              if (consumed != body.replaceAll("\\s+", ""))
                throw new IllegalArgumentException(
                  s"rule $name: unsupported hex tokens in '$body'")
              HexMatcher(parsed)
            } else {
              // regex word modifiers: nocase honored; wide/fullword on a
              // regex are loud failures, never a silently-ignored mod
              val rmods = Option(sm.group(6)).getOrElse("")
              if (rmods.contains("wide") || rmods.contains("fullword"))
                throw new IllegalArgumentException(
                  s"rule $name: wide/fullword on a regex string is unsupported")
              RegexMatcher(sm.group(5), nocase = rmods.contains("nocase"))
            }
          id -> (matcher: Matcher)
        }.toSeq
      }.getOrElse(Nil)
      val condStr = section("condition").map(_.trim).getOrElse("")
      Rule(name, tags, strings, parseCond(name, condStr), priv, glob)
    }.toSeq
  }

  /** Decimal or 0x-hex literal. */
  private def numLit(t: String): Long =
    try {
      if (t.startsWith("0x") || t.startsWith("0X"))
        java.lang.Long.parseLong(t.substring(2), 16)
      else t.toLong
    } catch {
      case _: NumberFormatException =>
        // uniform parse-failure contract (never NumberFormatException)
        throw new IllegalArgumentException(s"bad numeric literal '$t'")
    }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
      .replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")

  /** `100`, `64KB`, `2MB` → bytes. */
  private def sizeLit(rule: String, t: String): Long = {
    val m = "(\\d+)(KB|MB|GB)?".r
    t match {
      case m(n, suf) =>
        n.toLong * (suf match {
          case "KB" => 1024L
          case "MB" => 1024L * 1024
          case "GB" => 1024L * 1024 * 1024
          case _ => 1L
        })
      case _ => throw new IllegalArgumentException(
        s"rule $rule: bad size literal '$t'")
    }
  }

  private val cmpOps = Set(">", ">=", "<", "<=", "==", "!=")

  private def parseCond(rule: String, s: String): Cond = {
    val toks = mutable.Queue(
      s.replace("(", " ( ").replace(")", " ) ").replace(",", " , ")
        .replace("[", " [ ").replace("]", " ] ").replace(":", " : ")
        .replace("..", " .. ").split("\\s+").filter(_.nonEmpty).toSeq: _*)
    def fail(what: String) = throw new IllegalArgumentException(
      s"rule $rule: unsupported condition near '$what'")
    // safe dequeue: a truncated condition fails the parse contract
    // (IllegalArgumentException), never NoSuchElementException
    def next(): String = if (toks.isEmpty) fail("<end>") else toks.dequeue()
    // the `for` loop variable in scope, for `@a[i]` validation
    var boundVar: Option[String] = None
    def expect(t: String): Unit = if (next() != t) fail(t)
    // literal, `#a`, `@a[k]` (offset), or `!a[k]` (match length) — the
    // numeric operands `for` bounds/bodies take (k = constant ordinal
    // or the loop variable)
    def numE(): NumE = next() match {
      case t if t.startsWith("#") && t.length > 1 => NumCount(t.drop(1))
      case "#" => NumCount("$")
      case t if (t.startsWith("@") || t.startsWith("!")) && t != "!=" =>
        val isLen = t.startsWith("!")
        val id = if (t.length == 1) "$" else t.drop(1)
        expect("[")
        val idxTok = next()
        expect("]")
        if (boundVar.contains(idxTok)) NumOffset(id, None, isLen)
        else if (idxTok.matches("\\d+"))
          NumOffset(id, Some(idxTok.toInt), isLen)
        else fail(idxTok)
      case t => NumLit(numLit(t))
    }
    def rangeTail(): (Int, Int) = {
      expect("(")
      val lo = numLit(next()).toInt
      expect("..")
      val hi = numLit(next()).toInt
      expect(")")
      (lo, hi)
    }
    // `of them` | `of ($prefix*)` | trailing `in (lo..hi)` (YARA 4.3)
    def ofTail(n: Option[Int]): Cond = {
      expect("of")
      val base = next() match {
        case "them" => OfThem(n)
        case "(" =>
          // `($a, $b, $p*)` — comma-separated ids, `*` = prefix match
          val ids = Seq.newBuilder[String]
          var done = false
          while (!done) {
            if (toks.isEmpty) fail(")")
            next() match {
              case ")" => done = true
              case "," => // separator — ids may also arrive pre-split
              case t =>
                val id = t.stripSuffix(",")
                if (!id.startsWith("$") || id.length < 2) fail(t)
                ids += id.drop(1)
            }
          }
          val set = ids.result()
          if (set.isEmpty) fail("()")
          // single star entry keeps the classic prefix form
          if (set.length == 1 && set.head.endsWith("*"))
            OfThem(n, Some(set.head.dropRight(1)))
          else OfThem(n, None, set)
        case other => fail(other)
      }
      if (toks.headOption.contains("in")) {
        next()
        base.copy(range = Some(rangeTail()))
      } else base
    }
    // `for any|all|N (of <set> | i in (lo..hi)) : ( body )`
    def forTail(): Cond = {
      val n = next() match {
        case "any" => Some(1)
        case "all" => None
        case t if t.matches("\\d+") => Some(t.toInt)
        case other => fail(other)
      }
      toks.headOption match {
        case Some("of") =>
          val of = ofTail(n) match {
            case o: OfThem =>
              if (o.range.isDefined) fail("in") // no range on for-of
              o
            case _ => fail("of")
          }
          expect(":"); expect("(")
          val body = or()
          expect(")")
          ForOf(n, of.prefix, of.ids, body)
        case Some(v) if v.matches("[A-Za-z_]\\w*") =>
          next()
          expect("in"); expect("(")
          val lo = numE()
          expect("..")
          val hi = numE()
          expect(")")
          expect(":"); expect("(")
          val saved = boundVar
          boundVar = Some(v)
          val body = try or() finally boundVar = saved
          expect(")")
          ForIndex(n, lo, hi, body)
        case other => fail(other.getOrElse("<end>"))
      }
    }
    // `@a[i]` / `@a[2]` offset term, `!a[i]` / `!a[2]` match-length
    // term: inside a for body the index must be the loop variable;
    // outside, a constant ordinal desugars to a single-iteration
    // ForIndex over that ordinal
    def atTail(t: String): Cond = {
      val isLen = t.startsWith("!")
      val id = if (t.length == 1) "$" else t.drop(1)
      expect("[")
      val idxTok = next()
      expect("]")
      def leaf(): Cond =
        if (toks.headOption.contains("in")) {
          next()
          val (lo, hi) = rangeTail()
          OffIdxIn(id, lo, hi, isLen)
        } else {
          val op = next()
          if (!cmpOps(op)) fail(op)
          OffIdxCmp(id, op, numE(), isLen)
        }
      if (boundVar.contains(idxTok)) leaf()
      else if (idxTok.matches("\\d+")) {
        val k = idxTok.toInt
        ForIndex(Some(1), NumLit(k), NumLit(k), leaf())
      } else fail(idxTok)
    }
    def primary(): Cond = {
      if (toks.isEmpty) fail("<end>")
      next() match {
        case "(" =>
          val e = or()
          if (toks.isEmpty || next() != ")") fail(")")
          e
        case "not" => Not(primary())
        case "any" => ofTail(Some(1))
        case "all" => ofTail(None)
        case "for" => forTail()
        case "filesize" =>
          val op = next()
          if (!cmpOps(op)) fail(op)
          FilesizeCmp(op, sizeLit(rule, next()))
        case t if t.matches("u?int(8|16|32)(be)?") =>
          val width = "\\d+".r.findFirstIn(t).get.toInt
          val be = t.endsWith("be")
          if (next() != "(") fail(s"$t (")
          val off = numLit(next()).toInt
          if (next() != ")") fail(")")
          val op = next()
          if (!cmpOps(op)) fail(op)
          UIntCmp(width, be, off, op, numLit(next()),
            signed = !t.startsWith("u"))
        case t if t.matches("\\d+") => ofTail(Some(t.toInt))
        case t if (t.startsWith("@") || t.startsWith("!")) && t != "!=" =>
          atTail(t)
        case t if t.startsWith("#") =>
          // `#` bare = the for-of placeholder's count
          val id = if (t == "#") "$" else t.drop(1)
          if (toks.headOption.contains("in")) {
            // `#a in (lo..hi) op n` — occurrences within the range
            next()
            val (lo, hi) = rangeTail()
            val op = next()
            if (!cmpOps(op)) fail(op)
            CountInRange(id, op, numLit(next()).toInt, lo, hi)
          } else {
            val op = next()
            if (!cmpOps(op)) fail(op)
            CountCmp(id, op, numLit(next()).toInt)
          }
        case t if t.startsWith("$") =>
          // `$` bare = the for-of placeholder string
          val id = if (t == "$") "$" else t.drop(1)
          toks.headOption match {
            case Some("in") =>
              next()
              val (lo, hi) = rangeTail()
              InRange(id, lo, hi)
            case Some("at") =>
              next()
              At(id, numLit(next()).toInt)
            case _ => Ref(id)
          }
        // bare identifier = reference to an earlier rule's verdict
        case t if t.matches("[A-Za-z_]\\w*") => RuleRef(t)
        case other => fail(other)
      }
    }
    def and(): Cond = {
      var e = primary()
      while (toks.headOption.contains("and")) { next(); e = And(e, primary()) }
      e
    }
    def or(): Cond = {
      var e = and()
      while (toks.headOption.contains("or")) { next(); e = Or(e, and()) }
      e
    }
    val e = or()
    if (toks.nonEmpty) fail(toks.head)
    e
  }

  // ------------------------------------------------------------- scan
  /** Tags for one payload: `yara:<name>` plus the rule's own tags, each
    * `yara:`-prefixed (capture/yara.c:149-156 tag shape). Rules evaluate
    * in file order so later rules may reference earlier verdicts;
    * `private` rules contribute no tags, and a failing `global` rule
    * suppresses every match (YARA semantics).
    */
  def scan(rules: Seq[Rule], data: Array[Byte]): Seq[String] = {
    var env = Map.empty[String, Boolean]
    val verdicts = rules.map { r =>
      val m = r.matches(data, env)
      env += (r.name -> m)
      (r, m)
    }
    if (verdicts.exists { case (r, m) => r.glob && !m }) Nil
    else verdicts.collect { case (r, true) if !r.priv => r }
      .flatMap(r => (r.name +: r.tags).map("yara:" + _)).distinct
  }

  /** Session form: scan both directions' reassembled streams. */
  def tags(rules: Seq[Rule], src: Array[Byte], dst: Array[Byte]): Seq[String] =
    (scan(rules, src) ++ scan(rules, dst)).distinct.sorted

  /** Column form for at-scale tagging over payload columns. */
  def tagsCol(rules: Seq[Rule]): (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column = {
    val u = org.apache.spark.sql.functions.udf {
      (a: Array[Byte], b: Array[Byte]) =>
        tags(rules,
          if (a == null) Array.emptyByteArray else a,
          if (b == null) Array.emptyByteArray else b)
    }
    (a, b) => u(a, b)
  }
}
