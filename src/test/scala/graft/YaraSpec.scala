package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Yara

class YaraSpec extends AnyFunSuite with SparkSpecBase {

  private def b(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

  test("parses and applies the reference test rule (tags + in-range)") {
    val rules = Yara.parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/tests/rules.yara")),
        StandardCharsets.UTF_8))
    assert(rules.length == 1)
    val r = rules.head
    assert(r.name == "Pop3Yara" && r.tags == Seq("tag1", "tag2"))
    // " POP3 " within the first 50 bytes → match
    assert(Yara.scan(rules, b("+OK POP3 server ready")) ==
      Seq("yara:Pop3Yara", "yara:tag1", "yara:tag2"))
    // needle present but past offset 50 → no match
    assert(Yara.scan(rules, b("x" * 60 + " POP3 ")).isEmpty)
    assert(Yara.scan(rules, b("+OK IMAP server")).isEmpty)
  }

  test("text modifiers: nocase and wide") {
    val rules = Yara.parse(
      """rule T { strings: $a = "Secret" nocase $w = "evil" wide
        | condition: $a or $w }""".stripMargin)
    assert(Yara.scan(rules, b("xxSECRETxx")).nonEmpty)
    assert(Yara.scan(rules, b("xxsecretxx")).nonEmpty)
    val wide = "x" + "evil".flatMap(c => Seq(c, '\u0000')).mkString
    assert(Yara.scan(rules, b(wide)).nonEmpty)
    assert(Yara.scan(rules, b("innocent")).isEmpty)
  }

  test("hex patterns with wildcards and N-of-them conditions") {
    val rules = Yara.parse(
      """rule H : net {
        | strings:
        |   $mz = { 4D 5A ?? 00 }
        |   $elf = { 7F 45 4C 46 }
        |   $txt = "payload"
        | condition:
        |   2 of them
        |}""".stripMargin)
    val data = Array[Byte](0x4d, 0x5a, 0x77, 0x00) ++ b("..payload..")
    assert(Yara.scan(rules, data) == Seq("yara:H", "yara:net"))
    assert(Yara.scan(rules, Array[Byte](0x4d, 0x5a, 0x77, 0x00)).isEmpty)
    val rules2 = Yara.parse(
      "rule A { strings: $x = { 7F 45 4C 46 } condition: any of them }")
    assert(Yara.scan(rules2,
      Array[Byte](0x7f, 0x45, 0x4c, 0x46, 9)).nonEmpty)
  }

  test("regex strings and boolean algebra") {
    val rules = Yara.parse(
      """rule R {
        | strings:
        |   $re = /GET \/[a-z]+\.php/
        |   $ua = "curl"
        | condition:
        |   $re and not $ua
        |}""".stripMargin)
    assert(Yara.scan(rules, b("GET /shell.php HTTP/1.1")).nonEmpty)
    assert(Yara.scan(rules, b("GET /shell.php\r\nUser-Agent: curl")).isEmpty)
    assert(Yara.scan(rules, b("POST /x.php")).isEmpty)
  }

  test("session tagging over both directions") {
    val rules = Yara.parse(
      "rule D { strings: $s = \"beacon\" condition: any of them }")
    assert(Yara.tags(rules, b("nothing"), b("the beacon answers")) ==
      Seq("yara:D"))
    assert(Yara.tags(rules, b("x"), b("y")).isEmpty)
  }

  test("pop3-tag pcap gets the golden yara tags end-to-end") {
    val got = graft.etl.SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/pop3-tag.pcap").collect()
    assert(got.length == 1)
    // golden tags: [dstip, srcip, yara:Pop3Yara, yara:tag1, yara:tag2];
    // the srcip/dstip entries come from the WISE tagger plugins (out of
    // scope) — the yara subset must match exactly
    assert(got.head.tags.filter(_.startsWith("yara:")).sorted ==
      Seq("yara:Pop3Yara", "yara:tag1", "yara:tag2"))
    // queryable through the expression language
    import graft.expr.Compiler
    import graft.model.FieldRegistry
    val c = new Compiler(FieldRegistry.sessions, FieldRegistry.sessionCol,
      SparkEntry.now)
    val df = graft.etl.SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/pop3-tag.pcap").toDF()
    assert(df.filter(c.compile("tags == \"yara:Pop3Yara\"")).count() == 1)
    assert(df.filter(c.compile("tags == \"yara:nomatch\"")).count() == 0)
  }

  test("unsupported constructs fail loudly, not silently") {
    // module references outside the supported math/hash/pe/elf subset
    intercept[IllegalArgumentException] {
      Yara.parse("rule M { condition: pe.signatures[0].subject }")
    }
    intercept[IllegalArgumentException] {
      Yara.parse(
        "rule E { condition: cuckoo.network.http_request(/evil/) }")
    }
  }

  test("match lengths: !a[i] with fixed, regex and hex-jump strings") {
    // regex: per-occurrence length
    val re = Yara.parse(
      """rule L { strings: $a = /ab+/
        | condition: for any i in (1..#a) : ( !a[i] == 4 ) }""".stripMargin)
    assert(Yara.scan(re, b("ab..abbb..")).nonEmpty) // "abbb" has len 4
    assert(Yara.scan(re, b("ab..abb...")).isEmpty)
    // hex jump: shortest match length reported
    val hx = Yara.parse(
      "rule J { strings: $h = { 41 [0-4] 42 } condition: !h[1] == 3 }")
    assert(Yara.scan(hx, b("A.B")).nonEmpty) // len 3 (one gap byte)
    assert(Yara.scan(hx, b("AB")).isEmpty) // len 2
    // constant ordinal outside a loop + length as a for-of body operand
    val fo = Yara.parse(
      """rule W { strings: $p1 = "xy" $p2 = "longer!"
        | condition: for all of ($p*) : ( ![1] >= 2 ) }""".stripMargin)
    assert(Yara.scan(fo, b("xy longer!")).nonEmpty)
    assert(Yara.scan(fo, b("xy only")).isEmpty) // p2 undefined -> false
  }

  test("hex jumps: fixed and ranged gaps match YARA semantics") {
    val rules = Yara.parse(
      "rule J { strings: $a = { 41 [2] 42 } $b = { 43 [1-3] 44 } " +
        "condition: $a or $b }")
    def hit(s: String) = Yara.scan(rules, s.getBytes("ISO-8859-1")).nonEmpty
    assert(hit("AxxB"))       // [2] exactly two gap bytes
    assert(!hit("AxB"))       // one gap byte ≠ [2]
    assert(!hit("AxxxB"))     // three ≠ [2]
    assert(hit("CxD") && hit("CxxD") && hit("CxxxD")) // [1-3]
    assert(!hit("CD") && !hit("CxxxxD"))
  }

  test("at / count / filesize conditions and fullword modifier") {
    val rules = Yara.parse(
      """rule C1 { strings: $m = "MZ" condition: $m at 0 }
        rule C2 { strings: $x = "ab" condition: #x >= 2 }
        rule C3 { condition: filesize > 1KB }
        rule C4 { strings: $w = "cat" fullword condition: $w }""")
    def tags(s: String) = Yara.scan(rules, s.getBytes("ISO-8859-1"))
    assert(tags("MZdata").contains("yara:C1"))
    assert(!tags("xMZdata").contains("yara:C1"))
    assert(tags("abab").contains("yara:C2"))
    assert(!tags("abx").contains("yara:C2"))
    assert(tags("x" * 1025).contains("yara:C3"))
    assert(!tags("x" * 1024).contains("yara:C3"))
    assert(tags("a cat sat").contains("yara:C4"))
    assert(!tags("concatenate").contains("yara:C4"))
  }

  test("at with a 64-bit offset expression is false, never a wrapped Int") {
    // 0x100000000 truncated to Int is 0 — YARA evaluates the comparison
    // as plain false for any offset beyond the payload, so a string that
    // DOES occur at offset 0 must not match
    val rules = Yara.parse(
      """rule W1 { strings: $m = "MZ" condition: $m at 0x100000000 }
        rule W2 { strings: $m = "MZ" condition: $m at 2147483648 }
        rule W3 { strings: $m = "MZ" condition: $m at (0 - 4) }""")
    assert(Yara.scan(rules, "MZdata".getBytes("ISO-8859-1")).isEmpty)
  }

  test("of ($prefix*) string-set conditions") {
    val rules = Yara.parse(
      "rule P { strings: $a1 = \"foo\" $a2 = \"bar\" $b1 = \"zap\" " +
        "condition: all of ($a*) }")
    def hit(s: String) = Yara.scan(rules, s.getBytes("ISO-8859-1")).nonEmpty
    assert(hit("foo bar"))          // both $a*, $b1 irrelevant
    assert(!hit("foo zap"))         // $a2 missing
  }

  test("of ($a, $b, $p*) explicit string sets") {
    val rules = Yara.parse(
      "rule S { strings: $a = \"foo\" $b = \"bar\" $c1 = \"zap\" " +
        "$c2 = \"zip\" condition: 2 of ($a, $c*) }")
    def hit(s: String) = Yara.scan(rules, s.getBytes("ISO-8859-1")).nonEmpty
    assert(hit("foo zap"))       // $a + $c1 — 2 of the set
    assert(hit("zap zip"))       // $c1 + $c2
    assert(!hit("foo bar"))      // $b is NOT in the set: only $a hits
    // `any of ($a, $b)` works too
    val any = Yara.parse(
      "rule T { strings: $a = \"foo\" $b = \"bar\" $c = \"zap\" " +
        "condition: any of ($a, $b) }")
    assert(Yara.scan(any, b("bar only")).nonEmpty)
    assert(Yara.scan(any, b("zap only")).isEmpty)
    // the no-space comma form is equally valid YARA (was a silent
    // never-match: the ids tokenized as one bogus `$a,$c*` entry)
    val tight = Yara.parse(
      "rule U { strings: $a = \"foo\" $b = \"bar\" $c1 = \"zap\" " +
        "$c2 = \"zip\" condition: 2 of ($a,$c*) }")
    assert(Yara.scan(tight, b("foo zap")).nonEmpty)
    assert(Yara.scan(tight, b("foo bar")).isEmpty)
  }

  test("masked hex nibbles ?A / A? match by half byte") {
    val rules = Yara.parse(
      "rule M { strings: $h = { 4D 5? ?A } condition: $h }")
    // 4D, high-nibble 5, low-nibble A
    assert(Yara.scan(rules, Array[Byte](0x4d, 0x5a, 0x1a)).nonEmpty)
    assert(Yara.scan(rules, Array[Byte](0x4d, 0x5f.toByte, 0xfa.toByte)).nonEmpty)
    assert(Yara.scan(rules, Array[Byte](0x4d, 0x6a, 0x1a)).isEmpty,
      "high nibble must be 5")
    assert(Yara.scan(rules, Array[Byte](0x4d, 0x5a, 0x1b)).isEmpty,
      "low nibble must be A")
  }

  test("regex nocase modifier is honored (was a silent no-op)") {
    val rules = Yara.parse(
      "rule R { strings: $r = /user=[a-z]+/ nocase condition: $r }")
    assert(Yara.scan(rules, b("USER=ROOT")).nonEmpty)
    assert(Yara.scan(rules, b("nothing")).isEmpty)
    val cs = Yara.parse(
      "rule R2 { strings: $r = /user=[a-z]+/ condition: $r }")
    assert(Yara.scan(cs, b("USER=ROOT")).isEmpty, "no nocase → case-sensitive")
    intercept[IllegalArgumentException] {
      Yara.parse("rule R3 { strings: $r = /x/ wide condition: $r }")
    }
  }

  test("xor modifier: full range and bounded key range") {
    val rules = Yara.parse(
      """rule X { strings: $a = "cmd.exe" xor condition: $a }""")
    val plain = b("..cmd.exe..")
    def xored(key: Int) = plain.map(x => (x ^ key).toByte)
    assert(Yara.scan(rules, plain).nonEmpty)          // key 0
    assert(Yara.scan(rules, xored(0x41)).nonEmpty)
    assert(Yara.scan(rules, xored(0xfe)).nonEmpty)
    assert(Yara.scan(rules, b("innocent")).isEmpty)

    val bounded = Yara.parse(
      """rule X { strings: $a = "cmd.exe" xor(0x10-0x20) condition: $a }""")
    assert(Yara.scan(bounded, xored(0x15)).nonEmpty)
    assert(Yara.scan(bounded, xored(0x41)).isEmpty)   // outside range
    // nocase+xor is a YARA error
    intercept[IllegalArgumentException] {
      Yara.parse("""rule B { strings: $a = "x" xor nocase condition: $a }""")
    }
  }

  test("base64 modifier matches all three encoding alignments") {
    val rules = Yara.parse(
      """rule B64 { strings: $a = "This program cannot" base64
        | condition: $a }""".stripMargin)
    val enc = java.util.Base64.getEncoder
    // the needle at each alignment inside a larger encoded blob
    for (pre <- Seq("", "x", "xy")) {
      val blob = enc.encodeToString(
        (pre + "This program cannot run").getBytes("ISO-8859-1"))
      assert(Yara.scan(rules, b(blob)).nonEmpty, s"prefix '$pre'")
    }
    assert(Yara.scan(rules,
      b(enc.encodeToString(b("different text here")))).isEmpty)
  }

  test("uintN magic reads: little and big endian, hex literals") {
    val rules = Yara.parse(
      """rule MZ { condition: uint16(0) == 0x5A4D }
        |rule PNGv { condition: uint32be(0) == 0x89504E47 }""".stripMargin)
    assert(Yara.scan(rules, Array[Byte](0x4d, 0x5a, 1, 2))
      == Seq("yara:MZ"))
    assert(Yara.scan(rules,
      Array(0x89.toByte, 0x50.toByte, 0x4e.toByte, 0x47.toByte))
      == Seq("yara:PNGv"))
    // out-of-bounds read is false, not an error
    assert(Yara.scan(rules, Array[Byte](0x4d)).isEmpty)
  }

  test("private rules, rule references, and global gating") {
    val rules = Yara.parse(
      """private rule IsHttp { strings: $h = "HTTP/1." condition: $h }
        |rule EvilUA { strings: $u = "evil-agent" condition: IsHttp and $u }
        |""".stripMargin)
    assert(Yara.scan(rules, b("GET / HTTP/1.1 evil-agent")) ==
      Seq("yara:EvilUA")) // private rule itself emits no tag
    assert(Yara.scan(rules, b("evil-agent no http")).isEmpty)

    val gated = Yara.parse(
      """global rule SizeGate { condition: filesize < 100 }
        |rule Hit { strings: $a = "x" condition: $a }""".stripMargin)
    assert(Yara.scan(gated, b("x")).toSet ==
      Set("yara:SizeGate", "yara:Hit"))
    assert(Yara.scan(gated, b("x" * 200)).isEmpty) // global gate fails
  }

  test("intN is signed (uintN stays unsigned)") {
    val rules = Yara.parse(
      """rule S { condition: int8(0) == -1 }
        |rule U { condition: uint8(0) == 255 }
        |rule S16 { condition: int16be(0) < 0 }""".stripMargin)
    val ff = Array[Byte](0xff.toByte, 0x00)
    assert(Yara.scan(rules, ff).toSet ==
      Set("yara:S", "yara:U", "yara:S16"))
    assert(Yara.scan(rules, Array[Byte](0x7f, 0x00)).isEmpty)
  }

  test("count-in-range and of-them-in-range (YARA 4.x)") {
    val rules = Yara.parse(
      """rule C { strings: $a = "ab" condition: #a in (0..9) == 2 }
        |rule R { strings: $x = "cd" $y = "ef"
        | condition: any of them in (0..3) }""".stripMargin)
    // "ab" at 0 and 8 → two in [0..9]; "abab…" beyond doesn't count
    assert(Yara.scan(rules, b("ab....  ab....ab")).contains("yara:C"))
    assert(Yara.scan(rules, b("ab only once")).isEmpty)
    // "ef" inside [0..3] → R fires; both needles only past 3 → not
    assert(Yara.scan(rules, b(".ef..cd")).contains("yara:R"))
    assert(Yara.scan(rules, b("....cd..ef")).filter(_ == "yara:R").isEmpty)
  }

  test("for i in (1..#a): offset-ordinal bodies, any/all quantifiers") {
    val rules = Yara.parse(
      """rule F1 { strings: $a = "x"
        | condition: for all i in (1..#a) : ( @a[i] < 10 ) }
        |rule F2 { strings: $a = "x"
        | condition: for any i in (1..#a) : ( @a[i] in (5..6) ) }
        |rule F3 { strings: $a = "x" $b = "ab"
        | condition: for 2 i in (1..#a) : ( @a[i] > @b[1] ) }""".stripMargin)
    // all x's below offset 10
    assert(Yara.scan(rules, b("x.x.x")).contains("yara:F1"))
    assert(!Yara.scan(rules, b("x" + "." * 11 + "x")).contains("yara:F1"))
    // some x at offset 5 or 6
    assert(Yara.scan(rules, b(".....x")).contains("yara:F2"))
    assert(!Yara.scan(rules, b("x...x...")).contains("yara:F2"))
    // at least two x's after the first "ab"
    assert(Yara.scan(rules, b("ab..x..x")).contains("yara:F3"))
    assert(!Yara.scan(rules, b("x.x.ab")).contains("yara:F3"))
    // constant ordinal outside a loop desugars to a one-shot check
    val c = Yara.parse(
      "rule K { strings: $a = \"z\" condition: @a[2] == 4 }")
    assert(Yara.scan(c, b("z...z")).nonEmpty)
    assert(Yara.scan(c, b("z....z")).isEmpty)
  }

  test("huge for-loop bounds are capped, lazy and memoized") {
    val r = Yara.parse(
      """rule B { strings: $a = "q"
        | condition: for any i in (1..2147483647) : ( @a[i] < 100 ) }"""
        .stripMargin)
    val t0 = System.nanoTime()
    assert(Yara.scan(r, b("q hit")).nonEmpty) // short-circuits at i=1
    assert(Yara.scan(r, b("none")).isEmpty) // capped at MaxLoopIterations
    assert((System.nanoTime() - t0) / 1e9 < 30,
      "capped loop must not materialize or rescan per iteration")
  }

  test("nested uintN reads — the PE header idiom") {
    // uint32(uint32(0x3c)) == 0x4550: e_lfanew at 0x3c points at "PE\0\0"
    val rules = Yara.parse(
      """rule PE { condition:
        |  uint16(0) == 0x5A4D and uint32(uint32(0x3c)) == 0x4550 }"""
        .stripMargin)
    val img = new Array[Byte](0x50)
    img(0) = 'M'; img(1) = 'Z'
    img(0x3c) = 0x44 // e_lfanew = 0x44 (little-endian)
    img(0x44) = 'P'; img(0x45) = 'E'
    assert(Yara.scan(rules, img).nonEmpty)
    img(0x45) = 'X' // break the pointed-at signature
    assert(Yara.scan(rules, img).isEmpty)
    // pointer past the payload = undefined read = false, not a throw
    img(0x3c) = 0x7f
    assert(Yara.scan(rules, img).isEmpty)
  }

  test("arithmetic operators with C precedence, \\ division, % modulo") {
    val rules = Yara.parse(
      """rule A { condition: 2 + 3 * 4 == 14 }
        |rule B { condition: 7 \ 2 == 3 and 7 % 3 == 1 }
        |rule C { condition: 1 \ 0 == 0 }
        |rule D { condition: -3 + 5 == 2 and ~0 == -1 }
        |rule E { strings: $a = "x"
        | condition: #a * 2 == 4 and @a[2] - @a[1] == 3 }""".stripMargin)
    val got = Yara.scan(rules, b("x..x")).toSet
    assert(got("yara:A") && got("yara:B") && got("yara:D") && got("yara:E"))
    assert(!got("yara:C"), "division by zero is undefined, not a throw")
  }

  test("bitwise operators and shift semantics") {
    val rules = Yara.parse(
      """rule M { condition: uint32(0) & 0xFFFF == 0x5A4D }
        |rule S { condition: 1 << 4 == 16 and 256 >> 4 == 16 }
        |rule O { condition: 1 << 64 == 0 and 5 | 2 == 7 and 5 ^ 1 == 4 }"""
        .stripMargin)
    val mz = Array[Byte]('M', 'Z', 0x10, 0x20)
    assert(Yara.scan(rules, mz).toSet ==
      Set("yara:M", "yara:S", "yara:O"))
  }

  test("filesize as an operand and expression range bounds") {
    val rules = Yara.parse(
      """rule H { strings: $t = "trailer"
        | condition: $t in (filesize - 10 .. filesize) }
        |rule W { strings: $a = "ab" condition: $a in (0..filesize) }
        |rule F { condition: filesize \ 2 >= 4 }""".stripMargin)
    assert(Yara.scan(rules, b("....ab....trailer")).toSet ==
      Set("yara:H", "yara:W", "yara:F"))
    assert(!Yara.scan(rules, b("trailer junk after..."))
      .contains("yara:H"))
  }

  test("unspaced operators lex correctly; bare @a means @a[1]") {
    val rules = Yara.parse(
      """rule U { condition: uint32be(0)==0x89504E47 }
        |rule V { strings: $a = "z" condition: @a+2==@a[2] }
        |rule T { condition: true and not false }""".stripMargin)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    assert(Yara.scan(rules, png).toSet == Set("yara:U", "yara:T"))
    assert(Yara.scan(rules, b("z.z")).contains("yara:V"))
    assert(!Yara.scan(rules, b("z..z")).contains("yara:V"))
  }

  test("undefined ordinals propagate through arithmetic to false") {
    val rules = Yara.parse(
      """rule N { strings: $a = "k" condition: @a[5] + 1 > 0 }""")
    assert(Yara.scan(rules, b("k")).isEmpty)
  }

  test("math module: entropy, mean, deviation, MEAN_BYTES, promotion") {
    val rules = Yara.parse(
      """import "math"
        |rule LowEntropy { condition: math.entropy(0, filesize) < 1.5 }
        |rule HighEntropy { condition: math.entropy(0, filesize) >= 1.5 }
        |rule MeanMid { condition:
        |  math.in_range(math.mean(0, filesize), 96.0, 100.0) }
        |rule Dev { condition:
        |  math.deviation(0, filesize, math.MEAN_BYTES) > 20.0 }
        |rule Mix { condition: filesize * 1.0 >= 4.0 and
        |  math.max(filesize, 2) == filesize }""".stripMargin)
    // "aaaa" — one symbol: entropy 0, mean 97, |97-127.5| = 30.5
    val tags = Yara.scan(rules, b("aaaa")).toSet
    assert(tags == Set("yara:LowEntropy", "yara:MeanMid", "yara:Dev",
      "yara:Mix"))
    // 4 distinct equiprobable bytes: entropy = 2 bits exactly
    assert(Yara.scan(rules, b("abcd")).contains("yara:HighEntropy"))
  }

  test("math module: undefined slices and float bit-ops are false") {
    val rules = Yara.parse(
      """rule R1 { condition: math.entropy(0, filesize + 1) > 0 }
        |rule R2 { condition: math.mean(0, 0) >= 0 }
        |rule R3 { condition: math.abs(0 - 3) == 3 }""".stripMargin)
    assert(Yara.scan(rules, b("xy")).toSet == Set("yara:R3"))
    // arity and unknown module functions fail the parse contract
    intercept[IllegalArgumentException](
      Yara.parse("""rule B { condition: math.entropy(1) > 0 }"""))
    intercept[IllegalArgumentException](
      Yara.parse("""rule B { condition: math.nope(1, 2) > 0 }"""))
    intercept[IllegalArgumentException](
      Yara.parse("""rule B { condition: dotnet.is_dotnet }"""))
  }

  test("hash module: md5/sha1/sha256 slice compares") {
    // md5("abc") / sha256("abc") — RFC 1321 / FIPS 180 test vectors
    val rules = Yara.parse(
      """import "hash"
        |rule M { condition:
        |  hash.md5(1, 3) == "900150983CD24FB0D6963F7D28E17F72" }
        |rule S { condition: hash.sha256(1, 3) ==
        |  "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad" }
        |rule N { condition: hash.md5(0, filesize) != "00" }
        |rule OOB { condition: hash.md5(2, 100) == "00" }""".stripMargin)
    assert(Yara.scan(rules, b(".abc.")).toSet ==
      Set("yara:M", "yara:S", "yara:N"))
  }

  test("for of with $ / # placeholder bodies") {
    val rules = Yara.parse(
      """rule P { strings: $a = "foo" $b = "bar"
        | condition: for all of them : ( $ in (0..7) ) }
        |rule Q { strings: $p1 = "aa" $p2 = "bb"
        | condition: for any of ($p*) : ( # >= 2 ) }""".stripMargin)
    assert(Yara.scan(rules, b("foo bar")).contains("yara:P"))
    assert(!Yara.scan(rules, b("foo     bar")).contains("yara:P"))
    assert(Yara.scan(rules, b("aa..aa")).contains("yara:Q"))
    assert(!Yara.scan(rules, b("aa..bb")).contains("yara:Q"))
  }

  test("none / percentage quantifiers and defined operator") {
    val rules = Yara.parse(
      """rule None0 { strings: $a = "xx" $b = "yy"
        | condition: none of them }
        |rule Pct50 { strings: $a = "foo" $b = "bar" $c = "baz"
        | condition: 50% of them }
        |rule Pct100 { strings: $a = "foo" $b = "bar" $c = "baz"
        | condition: 100% of them }
        |rule ForNone { strings: $a = "foo" $b = "bar"
        | condition: for none of them : ( $ at 0 ) }
        |rule Def { condition: defined uint16(0) and
        |  not defined uint32(100) and not defined pe.is_pe }""".stripMargin)
    // "foo bar" hits $a,$b of Pct*'s three (2/3 = 66%)
    val tags = Yara.scan(rules, b("foo bar")).toSet
    assert(tags.contains("yara:Pct50"))
    assert(!tags.contains("yara:Pct100"))
    // neither xx nor yy occurs → none-of holds; add one → it breaks
    assert(tags.contains("yara:None0"))
    assert(!Yara.scan(rules, b("foo xx")).contains("yara:None0"))
    // $a at 0 matches, so "for none : at 0" fails; shift input → holds
    assert(!tags.contains("yara:ForNone"))
    assert(Yara.scan(rules, b(" foo bar")).contains("yara:ForNone"))
    // defined: payload has ≥2 bytes, <104; not a PE
    assert(tags.contains("yara:Def"))
    // percentage bounds and misuse on index loops fail the parse
    intercept[IllegalArgumentException](Yara.parse(
      "rule B { strings: $a = \"x\" condition: 0% of them }"))
    intercept[IllegalArgumentException](Yara.parse(
      "rule B { condition: for 50% i in (1..3) : ( true ) }"))
    // `%` stays arithmetic when not followed by `of`
    assert(Yara.scan(Yara.parse("rule M { condition: 5 % 2 == 1 }"),
      b("")).nonEmpty)
  }

  test("pe module: header fields on a synthetic PE32+ image") {
    // minimal PE32+: MZ stub, e_lfanew=0x40, COFF, optional header,
    // one section mapping the entry RVA 0x1000 to file offset 0x400
    val img = new Array[Byte](0x40 + 24 + 240 + 40)
    def w16(i: Int, v: Int): Unit = {
      img(i) = (v & 0xff).toByte; img(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Long): Unit = {
      w16(i, (v & 0xffff).toInt); w16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    w16(0, 0x5a4d)            // MZ
    w32(0x3c, 0x40)           // e_lfanew
    w32(0x40, 0x4550)         // PE\0\0
    w16(0x44, 0x8664)         // machine AMD64
    w16(0x46, 1)              // sections
    w32(0x48, 0x5f000000L)    // timestamp
    w16(0x54, 240)            // optional header size
    w16(0x56, 0x2022)         // characteristics: EXE | DLL | LARGE
    val opt = 0x40 + 24
    w16(opt, 0x20b)           // PE32+
    w32(opt + 16, 0x1000)     // entry RVA
    w32(opt + 24, 0x40000000L) // image base lo (u64)
    w32(opt + 28, 0x1L)       //            hi
    w16(opt + 68, 2)          // subsystem GUI
    val sec = opt + 240
    w32(sec + 8, 0x200)       // virtual size
    w32(sec + 12, 0x1000)     // virtual address
    w32(sec + 16, 0x200)      // raw size
    w32(sec + 20, 0x400)      // raw pointer
    val rules = Yara.parse(
      """import "pe"
        |rule IsDll { condition: pe.is_pe and pe.is_dll() and
        |  pe.is_64bit() and not pe.is_32bit() }
        |rule Hdr { condition: pe.machine == pe.MACHINE_AMD64 and
        |  pe.number_of_sections == 1 and pe.timestamp == 0x5f000000 and
        |  pe.subsystem == pe.SUBSYSTEM_WINDOWS_GUI and
        |  pe.image_base == 0x140000000 }
        |rule Entry { condition: pe.entry_point == 0x400 }""".stripMargin)
    assert(Yara.scan(rules, img).toSet ==
      Set("yara:IsDll", "yara:Hdr", "yara:Entry"))
    // non-PE payload: every pe.* field undefined → no rule fires
    assert(Yara.scan(rules, b("plain text payload")).isEmpty)
  }

  test("pe module: sections, imports, imphash and magic on a PE32 image") {
    // PE32, two named sections, one import descriptor (KERNEL32.dll →
    // LoadLibraryA, GetProcAddress) laid out per the public PE/COFF spec
    val img = new Array[Byte](0x800)
    def w16(i: Int, v: Int): Unit = {
      img(i) = (v & 0xff).toByte; img(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Long): Unit = {
      w16(i, (v & 0xffff).toInt); w16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    def ws(i: Int, s: String): Unit =
      s.getBytes("ISO-8859-1").zipWithIndex.foreach {
        case (c, k) => img(i + k) = c
      }
    w16(0, 0x5a4d); w32(0x3c, 0x80)
    // Rich header in the DOS stub: XORed DanS + 3 pads, two entries
    // (prodid, build, count) = (0x5d, 0x2264, 3), (0x101, 0x1f00, 1),
    // then the clear "Rich" marker + key
    val rKey = 0x12345678L
    w32(0x40, 0x536e6144L ^ rKey)
    w32(0x44, rKey); w32(0x48, rKey); w32(0x4c, rKey) // pads (0 ^ key)
    w32(0x50, 0x005d2264L ^ rKey); w32(0x54, 3L ^ rKey)
    w32(0x58, 0x01011f00L ^ rKey); w32(0x5c, 1L ^ rKey)
    ws(0x60, "Rich"); w32(0x64, rKey)
    w32(0x80, 0x4550)
    w16(0x84, 0x14c) // Intel 80386
    w16(0x86, 2) // two sections
    w16(0x94, 0xe0) // optional header size
    w16(0x96, 0x0102) // EXECUTABLE | 32BIT (not a DLL)
    val opt = 0x98
    w16(opt, 0x10b) // PE32
    w32(opt + 16, 0x1000) // entry RVA (.text)
    w32(opt + 28, 0x400000L) // image base
    w16(opt + 68, 3) // subsystem console
    w32(opt + 96, 0x2100) // DataDirectory[0]: export table RVA
    w32(opt + 100, 0x80)
    w32(opt + 104, 0x2000) // DataDirectory[1]: import table RVA
    w32(opt + 108, 0x80)
    val s0 = opt + 0xe0
    ws(s0, ".text")
    w32(s0 + 8, 0x1000); w32(s0 + 12, 0x1000)
    w32(s0 + 16, 0x200); w32(s0 + 20, 0x400)
    w32(s0 + 36, 0x60000020L) // CODE | EXECUTE | READ
    val s1 = s0 + 40
    ws(s1, ".idata")
    w32(s1 + 8, 0x1000); w32(s1 + 12, 0x2000)
    w32(s1 + 16, 0x200); w32(s1 + 20, 0x600)
    w32(s1 + 36, 0xc0000040L) // INITIALIZED | READ | WRITE
    // import descriptor (rva 0x2000 → file 0x600) + terminator
    w32(0x600, 0x2040) // OriginalFirstThunk
    w32(0x60c, 0x2030) // Name
    w32(0x610, 0x2050) // FirstThunk
    ws(0x630, "KERNEL32.dll")
    w32(0x640, 0x2060); w32(0x644, 0x2070) // OFT thunks, 0-terminated
    w32(0x650, 0x2060); w32(0x654, 0x2070)
    ws(0x662, "LoadLibraryA") // hint/name: u16 hint then name
    ws(0x672, "GetProcAddress")
    // export directory (rva 0x2100 → file 0x700)
    w32(0x70c, 0x2130) // image name RVA
    w32(0x710, 1) // ordinal base
    w32(0x714, 2) // number of functions
    w32(0x718, 2) // number of names
    w32(0x720, 0x2150) // AddressOfNames RVA
    ws(0x730, "payload.dll")
    w32(0x750, 0x2160); w32(0x754, 0x2170) // name-pointer array
    ws(0x760, "EvilFunc"); ws(0x770, "GetStuff")

    val rules = Yara.parse(
      """import "pe"
        |import "magic"
        |rule Secs { condition: pe.number_of_sections == 2 and
        |  pe.sections[0].name == ".text" and
        |  pe.sections[1].name == ".idata" and
        |  pe.sections[1].virtual_address == 0x2000 and
        |  pe.sections[0].raw_data_size == 0x200 and
        |  pe.sections[0].raw_data_offset == 0x400 and
        |  pe.sections[0].virtual_size == 0x1000 and
        |  pe.sections[0].characteristics & 0x20000000 != 0 }
        |rule SecLoop { condition:
        |  for any i in (0..pe.number_of_sections - 1) :
        |    ( pe.sections[i].name startswith ".ida" ) }
        |rule SecLoopAll { condition:
        |  for all i in (0..pe.number_of_sections - 1) :
        |    ( pe.sections[i].raw_data_size == 0x200 ) }
        |rule OutOfRange { condition:
        |  pe.sections[5].name == ".text" or
        |  pe.sections[0 - 1].raw_data_size == 0 }
        |rule Imports { condition: pe.number_of_imports == 1 and
        |  pe.number_of_imported_functions == 2 }
        |rule ImportsFn { condition:
        |  pe.imports("kernel32.dll", "LoadLibraryA") and
        |  pe.imports("KERNEL32.DLL") == 2 and
        |  pe.imports("kernel32.dll", "loadlibrarya") and
        |  not pe.imports("kernel32.dll", "LoadLibraryZ") and
        |  not pe.imports("user32.dll") }
        |rule SecIter { condition:
        |  for any section in pe.sections :
        |    ( section.name == ".idata" and
        |      section.virtual_address == 0x2000 ) }
        |rule SecIterAll { condition:
        |  for all s in pe.sections : ( s.raw_data_size == 0x200 ) }
        |rule SecIterMiss { condition:
        |  for any section in pe.sections : ( section.name == ".evil" ) }
        |rule Exports { condition: pe.number_of_exports == 2 and
        |  pe.exports("EvilFunc") and pe.exports("evilfunc") and
        |  not pe.exports("Nope") and pe.dll_name == "payload.dll" and
        |  pe.dll_name iendswith ".DLL" }
        |rule Matches { condition:
        |  for any section in pe.sections :
        |    ( section.name matches /\.(text|idata)$/ ) and
        |  pe.dll_name matches /^PAY.*dll$/i and
        |  not pe.dll_name matches /^dll/ }
        |rule Overlay { condition: pe.is_pe == 1 and
        |  not defined pe.overlay.offset and
        |  not defined pe.overlay.size }
        |rule Rich { condition:
        |  pe.rich_signature.offset == 0x40 and
        |  pe.rich_signature.length == 0x20 and
        |  pe.rich_signature.key == 0x12345678 and
        |  pe.rich_signature.toolid(0x5d) == 3 and
        |  pe.rich_signature.version(0x2264, 0x5d) == 3 and
        |  pe.rich_signature.version(0x1f00) and
        |  not pe.rich_signature.toolid(0x99) and
        |  not pe.rich_signature.version(0x2264, 0x101) }
        |rule Ovl16 { condition:
        |  pe.overlay.size == 16 and
        |  uint8(pe.overlay.offset) == 0x45 }
        |rule Imphash { condition:
        |  pe.imphash() == "87bed5a7cba00c7e1f4015f1bdae2183" }
        |rule Magic { condition:
        |  magic.type() contains "PE32 executable" and
        |  magic.type() contains "(console)" and
        |  magic.type() icontains "intel 80386" and
        |  magic.mime_type() == "application/x-dosexec" }""".stripMargin)
    val got = Yara.scan(rules, img).toSet
    assert(got == Set("yara:Secs", "yara:SecLoop", "yara:SecLoopAll",
      "yara:Imports", "yara:ImportsFn", "yara:Imphash", "yara:Magic",
      "yara:SecIter", "yara:SecIterAll", "yara:Exports", "yara:Matches",
      "yara:Overlay", "yara:Rich"),
      s"got $got")
    // appended payload past the last section = the overlay
    val img2 = img ++ ("E" * 16).getBytes("ISO-8859-1")
    assert(Yara.scan(rules, img2).contains("yara:Ovl16"))
    assert(!Yara.scan(rules, img2).contains("yara:Overlay"))
    // a malformed matches-regex fails the parse, not the scan
    intercept[IllegalArgumentException](Yara.parse(
      "rule B { condition: pe.dll_name matches /[unclosed/ }"))
    // OutOfRange absent: pe.sections[5] / [-1] are undefined = false,
    // never a throw or a wrapped index; non-PE payload leaves all cold
    assert(Yara.scan(rules, b("plain text")).isEmpty)
  }

  test("pe module: no import table yields imphash of the empty list") {
    val img = new Array[Byte](0x200)
    def w16(i: Int, v: Int): Unit = {
      img(i) = (v & 0xff).toByte; img(i + 1) = ((v >> 8) & 0xff).toByte
    }
    w16(0, 0x5a4d); w16(0x3c, 0x80)
    img(0x80) = 'P'; img(0x81) = 'E' // PE\0\0
    w16(0x84, 0x14c); w16(0x86, 0) // zero sections
    w16(0x94, 0xe0); w16(0x96, 0x0102)
    w16(0x98, 0x10b)
    val rules = Yara.parse(
      """rule NoImp { condition: pe.number_of_imports == 0 and
        |  pe.imphash() == "d41d8cd98f00b204e9800998ecf8427e" }"""
        .stripMargin)
    assert(Yara.scan(rules, img).nonEmpty)
  }

  test("pe module: version_info strings from the resource tree") {
    val img = new Array[Byte](0x600)
    def w16(i: Int, v: Int): Unit = {
      img(i) = (v & 0xff).toByte; img(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Long): Unit = {
      w16(i, (v & 0xffff).toInt); w16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    def ws(i: Int, s: String): Unit =
      s.getBytes("ISO-8859-1").zipWithIndex.foreach {
        case (c, k) => img(i + k) = c
      }
    w16(0, 0x5a4d); w32(0x3c, 0x80)
    w32(0x80, 0x4550)
    w16(0x84, 0x14c); w16(0x86, 1)
    w16(0x94, 0xe0); w16(0x96, 0x0102)
    val opt = 0x98
    w16(opt, 0x10b)
    w32(opt + 112, 0x1000) // DataDirectory[2]: resource tree RVA
    w32(opt + 116, 0x200)
    val s0 = opt + 0xe0
    ws(s0, ".rsrc")
    w32(s0 + 8, 0x1000); w32(s0 + 12, 0x1000)
    w32(s0 + 16, 0x200); w32(s0 + 20, 0x400)
    // resource tree: root → type 16 (RT_VERSION) → name id 1 → lang
    // 0x409 → data entry; subdir offsets carry the high bit
    w16(0x400 + 14, 1)
    w32(0x410, 16); w32(0x414, 0x80000018L)
    w16(0x418 + 14, 1)
    w32(0x428, 1); w32(0x42c, 0x80000030L)
    w16(0x430 + 14, 1)
    w32(0x440, 0x409); w32(0x444, 0x48)
    // VS_VERSIONINFO per the public VERSIONINFO layout
    def wstrz(s: String): Array[Byte] =
      (s + "\u0000").flatMap(c => Seq((c & 0xff).toByte,
        ((c >> 8) & 0xff).toByte)).toArray
    def pad4(n: Int): Int = (4 - n % 4) % 4
    def vsMember(key: String, wType: Int, value: Option[String],
        children: Seq[Array[Byte]]): Array[Byte] = {
      val k = wstrz(key)
      val padK = new Array[Byte](pad4(6 + k.length))
      val v = value.map(wstrz).getOrElse(Array.emptyByteArray)
      val kids = children.foldLeft(Array.emptyByteArray)(_ ++ _)
      val total = 6 + k.length + padK.length + v.length + kids.length
      val hdr = new Array[Byte](6)
      hdr(0) = (total & 0xff).toByte; hdr(1) = ((total >> 8) & 0xff).toByte
      val wvl = value.map(_.length + 1).getOrElse(0) // words incl NUL
      hdr(2) = (wvl & 0xff).toByte; hdr(3) = ((wvl >> 8) & 0xff).toByte
      hdr(4) = (wType & 0xff).toByte; hdr(5) = ((wType >> 8) & 0xff).toByte
      hdr ++ k ++ padK ++ v ++ kids
    }
    val blob = vsMember("VS_VERSION_INFO", 0, None, Seq(
      vsMember("StringFileInfo", 1, None, Seq(
        vsMember("040904b0", 1, None, Seq(
          vsMember("CompanyName", 1, Some("Evil Corp"), Nil),
          vsMember("ProductName", 1, Some("Implant"), Nil)))))))
    assert(blob.length % 4 == 0) // children land 4-aligned
    w32(0x448, 0x1060); w32(0x44c, blob.length)
    System.arraycopy(blob, 0, img, 0x460, blob.length)
    val rules = Yara.parse(
      """rule V1 { condition:
        |  pe.version_info["CompanyName"] == "Evil Corp" and
        |  pe.version_info["ProductName"] icontains "IMPLANT" and
        |  pe.version_info["CompanyName"] matches /corp$/i }
        |rule V2 { condition:
        |  pe.version_info["FileDescription"] == "Evil Corp" }
        |rule Res { condition: pe.number_of_resources == 1 and
        |  pe.resources[0].type == 16 and pe.resources[0].id == 1 and
        |  pe.resources[0].language == 0x409 and
        |  pe.resources[0].offset == 0x460 and
        |  pe.resources[0].length > 0 and
        |  uint16(pe.resources[0].offset + 6) == 0x56 }
        |rule ResStr { condition:
        |  pe.resources[0].name_string == "x" or
        |  pe.resources[1].type == 16 }""".stripMargin)
    // ResStr stays cold: numeric-named levels have no name_string and
    // index 1 is out of range — both undefined, never a throw.
    // uint16(offset+6) reads the 'V' of the blob's UTF-16 szKey.
    assert(Yara.scan(rules, img).toSet == Set("yara:V1", "yara:Res"))
    // missing key / non-PE payload: undefined, never a throw
    assert(Yara.scan(rules, b("plain")).isEmpty)
  }

  test("magic module signatures: text, png, pcap, gzip, elf") {
    val rules = Yara.parse(
      """rule Txt { condition: magic.type() == "ASCII text" and
        |  magic.mime_type() == "text/plain" }
        |rule Png { condition: magic.mime_type() == "image/png" }
        |rule Cap { condition:
        |  magic.type() contains "tcpdump capture" }
        |rule Gz { condition: magic.mime_type() == "application/gzip" }
        |rule SharedElf { condition:
        |  magic.type() contains "ELF 64-bit LSB shared object" and
        |  magic.mime_type() == "application/x-sharedlib" }"""
        .stripMargin)
    def only(bs: Array[Byte], want: String) =
      assert(Yara.scan(rules, bs).toSet == Set(want))
    only(b("hello, world\n"), "yara:Txt")
    only(Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10),
      "yara:Png")
    only(Array[Byte](0xd4.toByte, 0xc3.toByte, 0xb2.toByte, 0xa1.toByte),
      "yara:Cap")
    only(Array[Byte](0x1f, 0x8b.toByte, 8), "yara:Gz")
    val elf = new Array[Byte](64)
    elf(0) = 0x7f; elf(1) = 'E'; elf(2) = 'L'; elf(3) = 'F'
    elf(4) = 2; elf(5) = 1; elf(16) = 3; elf(18) = 62
    only(elf, "yara:SharedElf")
    // the rest of the signature table, pinned via mime_type
    def mime(bs: Array[Byte], want: String) = {
      val r = Yara.parse(
        s"""rule M { condition: magic.mime_type() == "$want" }""")
      assert(Yara.scan(r, bs).nonEmpty, want)
    }
    mime(b("%PDF-1.7 ..."), "application/pdf")
    mime(Array[Byte]('P', 'K', 3, 4, 9, 9), "application/zip")
    mime(b("BZh91AY&SY......"), "application/x-bzip2")
    mime(Array[Byte](0xfd.toByte, '7', 'z', 'X', 'Z', 0),
      "application/x-xz")
    mime(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte),
      "application/zstd")
    mime(Array[Byte]('7', 'z', 0xbc.toByte, 0xaf.toByte, 0x27, 0x1c),
      "application/x-7z-compressed")
    mime(b("Rar!....."), "application/x-rar")
    mime(b(" " * 257 + "ustar! something"), "application/x-tar")
    mime(b("RIFF....WAVEfmt "), "audio/x-wav")
    mime(b("OggS binary here "), "audio/ogg")
    mime(Array[Byte](0x0a, 0x0d, 0x0d, 0x0a), "application/x-pcapng")
    mime(b("BM") ++ new Array[Byte](20), "image/bmp")
    mime(b("GIF89a..."), "image/gif")
    mime(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte),
      "image/jpeg")
    mime(Array[Byte](1, 2, 3), "application/octet-stream")
    mime(b("#!/bin/sh\necho hi\n"), "text/plain")
    mime(b("MZ") ++ new Array[Byte](80), "application/x-dosexec")
  }

  test("elf module: header fields on a synthetic ELF64 image") {
    val img = new Array[Byte](64)
    img(0) = 0x7f
    img(1) = 'E'.toByte; img(2) = 'L'.toByte; img(3) = 'F'.toByte
    img(4) = 2 // 64-bit
    img(5) = 1 // little-endian
    img(16) = 3 // ET_DYN
    img(18) = 62 // EM_X86_64
    img(24) = 0x00; img(25) = 0x10; img(26) = 0x40 // entry 0x401000
    img(60) = 5 // e_shnum
    val rules = Yara.parse(
      """rule SharedObj { condition: elf.type == elf.ET_DYN and
        |  elf.machine == elf.EM_X86_64 and
        |  elf.entry_point == 0x401000 and
        |  elf.number_of_sections == 5 }""".stripMargin)
    assert(Yara.scan(rules, img).nonEmpty)
    assert(Yara.scan(rules, b("not an elf")).isEmpty)
  }

  test("elf module: section table with shstrtab names and segments") {
    val img = new Array[Byte](0x1c0)
    def w16(i: Int, v: Int): Unit = {
      img(i) = (v & 0xff).toByte; img(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Long): Unit = {
      w16(i, (v & 0xffff).toInt); w16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    img(0) = 0x7f; img(1) = 'E'; img(2) = 'L'; img(3) = 'F'
    img(4) = 2; img(5) = 1 // 64-bit LSB
    img(16) = 2 // ET_EXEC
    img(18) = 62 // x86-64
    w32(32, 0x140) // e_phoff (u64 low half)
    w32(40, 0x40) // e_shoff (u64 low half)
    w16(54, 56) // e_phentsize
    w16(56, 1) // e_phnum
    w16(58, 64) // e_shentsize
    w16(60, 3) // e_shnum
    w16(62, 2) // e_shstrndx
    // phdr[0]: PT_LOAD, R+X, off 0, vaddr 0x400000, filesz/memsz
    w32(0x140, 1); w32(0x144, 5)
    w32(0x150, 0x400000L)
    w32(0x160, 0x140); w32(0x168, 0x200)
    // shdr[1] (.text): name 1, type PROGBITS, flags AX, addr/off/size
    val s1 = 0x40 + 64
    w32(s1, 1); w32(s1 + 4, 1)
    w32(s1 + 8, 6) // sh_flags (u64 low)
    w32(s1 + 16, 0x401000L)
    w32(s1 + 24, 0x200)
    w32(s1 + 32, 0x80)
    // shdr[2] (.shstrtab): name 7, type STRTAB, offset of the strings
    val s2 = 0x40 + 128
    w32(s2, 7); w32(s2 + 4, 3)
    w32(s2 + 24, 0x100); w32(s2 + 32, 0x20)
    // "\0.text\0.shstrtab\0" -- spaces stand in for NULs, zeroed here
    " .text .shstrtab".getBytes("ISO-8859-1")
      .zipWithIndex.foreach { case (c, k) =>
        img(0x100 + k) = if (c == ' ') 0 else c
      }
    val rules = Yara.parse(
      """rule Seg { condition: elf.number_of_segments == 1 and
        |  elf.segments[0].type == 1 and elf.segments[0].flags == 5 and
        |  elf.segments[0].offset == 0 and
        |  elf.segments[0].virtual_address == 0x400000 and
        |  elf.segments[0].file_size == 0x140 and
        |  elf.segments[0].memory_size == 0x200 and
        |  not elf.segments[7].type == 1 }
        |rule Sec { condition: elf.number_of_sections == 3 and
        |  elf.sections[1].name == ".text" and
        |  elf.sections[2].name == ".shstrtab" and
        |  elf.sections[1].type == 1 and
        |  elf.sections[1].flags == 6 and
        |  elf.sections[1].address == 0x401000 and
        |  elf.sections[1].offset == 0x200 and
        |  elf.sections[1].size == 0x80 and
        |  elf.sections[0].name == "" }
        |rule SecLoop { condition:
        |  for any i in (0..elf.number_of_sections - 1) :
        |    ( elf.sections[i].name matches /shstr/ ) }
        |rule SecIter { condition:
        |  for any s in elf.sections :
        |    ( s.name == ".text" and s.size == 0x80 ) }
        |rule OutOfRange { condition: elf.sections[9].size == 0 }"""
        .stripMargin)
    assert(Yara.scan(rules, img).toSet ==
      Set("yara:Sec", "yara:SecLoop", "yara:SecIter", "yara:Seg"))
    assert(Yara.scan(rules, b("plain")).isEmpty)
  }
}
