package graft.functions

/** Real (non-stubbed) media container header parsing — pure byte-level,
  * no codec libraries: the metadata half of a multimodal decode stage.
  * Pixel/sample DECODE still needs native codecs and stays behind the
  * `Multimodal.decodePartition` seam, but format, dimensions, and audio
  * layout are plain header fields any 100 TB pipeline wants scan-side
  * without ever invoking a decoder:
  *
  *   - PNG   (IHDR width/height)
  *   - JPEG  (SOF0/1/2 frame header scan)
  *   - GIF   (87a/89a logical screen descriptor)
  *   - BMP   (BITMAPINFOHEADER, height may be negative = top-down)
  *   - WAV   (RIFF/WAVE fmt + data chunk walk → channels, rate, duration)
  */
object MediaHeaders {

  final case class MediaInfo(
      format: String,
      width: Int, height: Int, // images; 0 for audio
      channels: Int, sampleRate: Int, durationMs: Long) // audio; 0 for images

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  def parse(b: Array[Byte]): Option[MediaInfo] = {
    if (b == null || b.length < 12) return None
    if (u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
      u8(b, 7) == 0x0a && b.length >= 24)
      // 8-byte sig, 4-byte IHDR length, 4-byte "IHDR", then w/h
      Some(MediaInfo("png", be32(b, 16).toInt, be32(b, 20).toInt, 0, 0, 0L))
    else if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) parseJpeg(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(MediaInfo("gif", le16(b, 6), le16(b, 8), 0, 0, 0L))
    else if (b(0) == 'B' && b(1) == 'M' && b.length >= 26)
      Some(MediaInfo("bmp", le32(b, 18).toInt,
        math.abs(le32(b, 22).toInt), 0, 0, 0L))
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b.length >= 12 && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E') parseWav(b)
    else None
  }

  /** Walk JPEG markers to the first start-of-frame (SOF0 baseline, SOF1
    * extended sequential, SOF2 progressive): height/width live at fixed
    * offsets in the frame header.
    */
  private def parseJpeg(b: Array[Byte]): Option[MediaInfo] = {
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return None // lost marker sync
      val marker = u8(b, i + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        if (i + 9 > b.length) return None
        return Some(MediaInfo("jpeg",
          be16(b, i + 7), be16(b, i + 5), 0, 0, 0L))
      }
      else if (marker == 0xd9 || marker == 0xda) return None // EOI / scan data
      else i += 2 + be16(b, i + 2) // any other segment: skip by length
    }
    None
  }

  /** Parsed RIFF/WAVE layout — the single hardened chunk walk shared by
    * the header parse here and [[MediaDecode.wavFeatures]]' sample
    * decode (one walk, one place for the corrupt-length guards).
    * `dataOff` = -1 when no data chunk was seen; `dataLen` is the RAW
    * chunk size (may exceed the buffer — decoders clamp).
    */
  private[functions] final case class WavLayout(fmtCode: Int,
      channels: Int, rate: Int, byteRate: Long, bits: Int,
      dataOff: Int, dataLen: Long)

  private[functions] def wavLayout(b: Array[Byte]): Option[WavLayout] = {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
      b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmtCode = -1; var channels = 0; var rate = 0
    var byteRate = 0L; var bits = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length && (fmtCode < 0 || dataOff < 0)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(b, i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        fmtCode = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
      } else if (id == "data" && dataOff < 0) {
        dataOff = i + 8
        dataLen = len
      }
      // chunks are word-aligned. Advance in LONG math: the old
      // `len.toInt` on a corrupt 32-bit length (e.g. 0xFFFFFFF8)
      // stepped 0 or backwards and hung the scan-side walk forever.
      // step >= 8 always holds now; jump to the end when no further
      // chunk can fit (also guards int overflow of the add).
      val step = 8L + len + (len & 1L)
      if (i.toLong + step + 8L > b.length) i = b.length
      else i += step.toInt
    }
    if (fmtCode < 0) None
    else Some(WavLayout(fmtCode, channels, rate, byteRate, bits,
      dataOff, dataLen))
  }

  /** RIFF chunk walk: `fmt ` gives the sample layout, `data` gives the
    * payload size; duration follows from byteRate.
    */
  private def parseWav(b: Array[Byte]): Option[MediaInfo] =
    wavLayout(b).filter(_.channels != 0).map(w =>
      MediaInfo("wav", 0, 0, w.channels, w.rate,
        if (w.byteRate > 0 && w.dataLen >= 0) w.dataLen * 1000L / w.byteRate
        else 0L))
}
