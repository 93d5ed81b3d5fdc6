package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** E14: the viewer's display-decode pipeline (reference:
  * viewer/decode.js) re-expressed as byte-array transforms.
  *
  * The reference registers composable body streams — BODY-UNCOMPRESS
  * (gunzip on magic), BODY-UNBASE64, BODY-UNXOR (known key / key length
  * / skip), BODY-UNXORBRUTEGZ (brute-force a 1-4 byte XOR key against
  * the gzip header) — plus item formatters (hex view). Here each is a
  * pure function over the reassembled body bytes, composable with
  * `pipeline`, and exposed as codegen-adjacent UDFs for at-scale use
  * over a body column.
  */
object DisplayDecode {

  private val GzipMagic = Array[Byte](0x1f, 0x8b.toByte, 0x08)

  /** BODY-UNCOMPRESS (decode.js:139-160): gunzip when the gzip magic
    * leads, otherwise pass through. Truncated gzip yields the bytes
    * inflated so far (display is best-effort).
    */
  def uncompress(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 3 || b(0) != GzipMagic(0) ||
      b(1) != GzipMagic(1) || b(2) != GzipMagic(2)) return b
    val out = new ByteArrayOutputStream(b.length * 4)
    try {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(b))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => }
    // an immediately-corrupt gzip header inflates nothing: best-effort
    // display must return the ORIGINAL bytes, not destroy the body
    if (out.size() == 0) b else out.toByteArray
  }

  /** BODY-UNBASE64 (decode.js:163-167); non-base64 bytes are skipped
    * (MIME decoder), a fully-invalid body returns itself.
    */
  def unbase64(b: Array[Byte]): Array[Byte] = {
    if (b == null) return b
    try java.util.Base64.getMimeDecoder.decode(
      new String(b, java.nio.charset.StandardCharsets.US_ASCII)
        .filter(c => !c.isWhitespace))
    catch { case _: IllegalArgumentException => b }
  }

  /** BODY-UNXOR with an explicit key, optionally skipping a prefix and
    * reading the key from the body head (decode.js:170-205).
    */
  def unxor(b: Array[Byte], key: Array[Byte], skip: Int = 0,
      keyFromBodyLength: Int = 0): Array[Byte] = {
    if (b == null) return b
    var data = if (skip > 0) b.drop(math.min(skip, b.length)) else b.clone()
    val k =
      if (keyFromBodyLength > 0 && data.length >= keyFromBodyLength) {
        val kk = data.take(keyFromBodyLength)
        data = data.drop(keyFromBodyLength)
        kk
      } else key
    if (k == null || k.isEmpty) return data
    var i = 0
    while (i < data.length) {
      data(i) = (data(i) ^ k(i % k.length)).toByte
      i += 1
    }
    data
  }

  /** BODY-UNXORBRUTEGZ (decode.js:207-247): slide a 1-4 byte XOR key
    * hypothesis along the body until the gzip header
    * `1f8b08000000000002` appears; un-xor from that offset. Returns the
    * body unchanged when no key is found.
    */
  def unxorBruteGzip(b: Array[Byte]): Array[Byte] = {
    if (b == null) return b
    // both common 9-byte headers: XFL=2 (zlib/gzip -9, the reference's
    // literal 1f8b08000000000002) and XFL=0 (Java GZIPOutputStream) —
    // a take(9) of the XFL=2 form previously dropped the 02 and matched
    // neither shape as documented
    val needles = Seq(
      Array(0x1f, 0x8b, 0x08, 0, 0, 0, 0, 0, 2).map(_.toByte),
      Array(0x1f, 0x8b, 0x08, 0, 0, 0, 0, 0, 0).map(_.toByte))
    for (gz <- needles) {
    var klen = 1
    while (klen <= 4) {
      var d = 0
      while (d + gz.length <= b.length) {
        val key = new Array[Byte](klen)
        var k = 0
        while (k < klen) { key(k) = (b(d + k) ^ gz(k)).toByte; k += 1 }
        var j = 0
        while (j < gz.length &&
          ((b(d + j) ^ key(j % klen)).toByte == gz(j))) j += 1
        if (j == gz.length)
          return unxor(b.drop(d), key)
        d += 1
      }
      klen += 1
    }
    }
    b
  }

  /** ITEM-HEX (decode.js ItemHexFormaterStream): the classic
    * offset / hex / ascii gutter view.
    */
  def hexView(b: Array[Byte]): String = {
    if (b == null) return ""
    val sb = new StringBuilder
    var off = 0
    while (off < b.length) {
      val n = math.min(16, b.length - off)
      sb.append(f"$off%08x  ")
      var i = 0
      while (i < 16) {
        if (i < n) sb.append(f"${b(off + i) & 0xff}%02x ")
        else sb.append("   ")
        if (i == 7) sb.append(" ")
        i += 1
      }
      sb.append(" ")
      i = 0
      while (i < n) {
        val c = b(off + i) & 0xff
        sb.append(if (c >= 0x20 && c < 0x7f) c.toChar else '.')
        i += 1
      }
      sb.append("\n")
      off += n
    }
    sb.toString
  }

  /** Compose named transforms in order, as the viewer chains its
    * registered streams ("BODY-UNXORBRUTEGZ:BODY-UNCOMPRESS:...").
    */
  def pipeline(names: Seq[String]): Array[Byte] => Array[Byte] = {
    val fns: Seq[Array[Byte] => Array[Byte]] = names.map {
      case "BODY-UNCOMPRESS" => uncompress _
      case "BODY-UNBASE64" => unbase64 _
      case "BODY-UNXORBRUTEGZ" => unxorBruteGzip _
      case other => throw new IllegalArgumentException(
        s"unknown display-decode transform: $other")
    }
    b => fns.foldLeft(b)((acc, f) => f(acc))
  }

  /** `POST /api/sessions/decodings` (apiSessions.js:2962-2964 →
    * decode.js:716-718 `exports.settings`): the UI-configurable decode
    * registry entries, exactly the three the reference registers with
    * settings (decode.js:720-732) — the response body is this map as
    * JSON.
    */
  final case class DecodingField(key: String, name: String, fieldType: String)
  final case class DecodingSetting(name: String, title: Option[String],
      fields: Seq[DecodingField])

  val settings: Map[String, DecodingSetting] = Map(
    "BODY-UNXORBRUTEGZ" ->
      DecodingSetting("UnXOR Brute GZip Header", None, Nil),
    "BODY-UNXOR" -> DecodingSetting("UnXOR",
      Some("Only set keyLength or key"),
      Seq(DecodingField("skip", "Skip Bytes", "text"),
        DecodingField("keyLength", "Key is in data length", "text"),
        DecodingField("key", "Fixed key in hex", "text"))),
    "BODY-UNBASE64" -> DecodingSetting("Unbase64", None, Nil))

  /** The endpoint's JSON body (stable key order). */
  def settingsJson: String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    Seq("BODY-UNXORBRUTEGZ", "BODY-UNXOR", "BODY-UNBASE64").map { k =>
      val d = settings(k)
      val title = d.title.fold("")(t => s""","title":"${esc(t)}"""")
      val fields =
        if (d.fields.isEmpty) ""
        else d.fields.map(f =>
          s"""{"key":"${esc(f.key)}","name":"${esc(f.name)}"""" +
            s""","type":"${esc(f.fieldType)}"}""")
          .mkString(""","fields":[""", ",", "]")
      s""""$k":{"name":"${esc(d.name)}"$title$fields}"""
    }.mkString("{", ",", "}")
  }

  // ----- column forms for at-scale decode over a body column ----------
  val uncompressCol: Column => Column = {
    val u = udf(uncompress _)
    c => u(c)
  }
  val unbase64Col: Column => Column = {
    val u = udf(unbase64 _)
    c => u(c)
  }
  val hexViewCol: Column => Column = {
    val u = udf(hexView _)
    c => u(c)
  }
}
