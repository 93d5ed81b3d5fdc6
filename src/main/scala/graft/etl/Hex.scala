package graft.etl

/** Fast lowercase hex — the per-byte format-string idiom
  * (`f"$b%02x"`.mkString) costs a boxed `String.format` per byte and
  * showed at the top of the ingest profile (digest hex, ja3, payload8).
  */
object Hex {
  private val T = "0123456789abcdef".toCharArray

  def hex(b: Array[Byte]): String = hex(b, 0, b.length)

  def hex(b: Array[Byte], from: Int, len: Int): String = {
    val c = new Array[Char](len * 2)
    var i = 0
    while (i < len) {
      val v = b(from + i) & 0xff
      c(2 * i) = T(v >> 4)
      c(2 * i + 1) = T(v & 0xf)
      i += 1
    }
    new String(c)
  }

  /** Colon-separated form (cert serial/fingerprint display). */
  def hexColon(b: Array[Byte]): String = {
    if (b.isEmpty) return ""
    val c = new Array[Char](b.length * 3 - 1)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      c(3 * i) = T(v >> 4)
      c(3 * i + 1) = T(v & 0xf)
      if (i < b.length - 1) c(3 * i + 2) = ':'
      i += 1
    }
    new String(c)
  }
}
