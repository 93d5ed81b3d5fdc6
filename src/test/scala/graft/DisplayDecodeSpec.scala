package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DisplayDecode

class DisplayDecodeSpec extends AnyFunSuite {

  private def gzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes(StandardCharsets.UTF_8))
    gz.close()
    bos.toByteArray
  }

  test("uncompress gunzips on magic and passes through otherwise") {
    val body = "hello gzip body " * 20
    assert(new String(DisplayDecode.uncompress(gzip(body)),
      StandardCharsets.UTF_8) == body)
    val plain = "plain".getBytes(StandardCharsets.UTF_8)
    assert(DisplayDecode.uncompress(plain) sameElements plain)
    // truncated gzip: best-effort prefix, no throw
    val cut = gzip(body).dropRight(6)
    val partial = DisplayDecode.uncompress(cut)
    assert(new String(partial, StandardCharsets.UTF_8).startsWith("hello gzip"))
  }

  test("unbase64 decodes mime bodies") {
    val raw = "binary  body".getBytes(StandardCharsets.ISO_8859_1)
    val b64 = java.util.Base64.getMimeEncoder.encode(raw)
    assert(DisplayDecode.unbase64(b64) sameElements raw)
  }

  test("unxor with explicit key, skip, and head key") {
    val raw = "the secret payload".getBytes(StandardCharsets.UTF_8)
    val key = Array[Byte](0x13, 0x37)
    val xored = raw.zipWithIndex.map { case (b, i) =>
      (b ^ key(i % 2)).toByte }
    assert(DisplayDecode.unxor(xored, key) sameElements raw)
    // key carried in the first 2 body bytes
    val withKey = key ++ xored
    assert(DisplayDecode.unxor(withKey, null,
      keyFromBodyLength = 2) sameElements raw)
  }

  test("unxorBruteGzip recovers a xored gzip body") {
    val body = gzip("exfiltrated configuration data " * 10)
    val key = Array[Byte](0x5a, 0x21, 0x7e)
    val xored = body.zipWithIndex.map { case (b, i) =>
      (b ^ key(i % key.length)).toByte }
    val recovered = DisplayDecode.unxorBruteGzip(xored)
    assert(recovered sameElements body)
    // full viewer chain: brute-unxor then gunzip
    val chain = DisplayDecode.pipeline(
      Seq("BODY-UNXORBRUTEGZ", "BODY-UNCOMPRESS"))
    assert(new String(chain(xored), StandardCharsets.UTF_8)
      .startsWith("exfiltrated configuration"))
  }

  test("decodings settings mirror decode.js registrations") {
    val j = DisplayDecode.settingsJson
    // the three settings-carrying registrations (decode.js:720-732),
    // field keys verbatim
    assert(j.startsWith("""{"BODY-UNXORBRUTEGZ":{"name":"UnXOR Brute GZip Header"}"""))
    assert(j.contains(""""BODY-UNXOR":{"name":"UnXOR","title":"Only set keyLength or key","fields":["""))
    assert(j.contains(""""key":"keyLength","name":"Key is in data length","type":"text""""))
    assert(j.endsWith(""""BODY-UNBASE64":{"name":"Unbase64"}}"""))
    // parses as JSON (no escaping mistakes)
    assert(j.count(_ == '{') == j.count(_ == '}'))
    assert(DisplayDecode.settings("BODY-UNXOR").fields.map(_.key) ==
      Seq("skip", "keyLength", "key"))
  }

  test("hex view formats the classic gutter layout") {
    val v = DisplayDecode.hexView("0123456789abcdefGH".getBytes)
    val lines = v.split("\n")
    assert(lines(0).startsWith("00000000  30 31 32 33 34 35 36 37  38 39"))
    assert(lines(0).endsWith("0123456789abcdef"))
    assert(lines(1).startsWith("00000010  47 48"))
    assert(lines(1).endsWith("GH"))
  }
}
