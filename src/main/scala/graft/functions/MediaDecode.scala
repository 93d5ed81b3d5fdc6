package graft.functions

/** Real pure-JVM media decoding for the [[graft.ops.Multimodal]] seam —
  * the pixel/sample half that was previously a documented hash stand-in.
  *
  * Images decode through `javax.imageio.ImageIO`, whose standard JDK
  * plugins read BMP, PNG, JPEG, GIF and WBMP with no native codecs —
  * exactly the "one real pure-JVM decoder behind the seam" contract.
  * Audio decodes the RIFF/WAVE `data` chunk as integer PCM (8/16/24/32
  * bit). Formats neither handles (video containers, arbitrary blobs)
  * fall back to the deterministic payload-hash fake in
  * [[graft.ops.Multimodal.decodePartition]], keeping every existing
  * oracle hash stable for non-media payloads.
  *
  * The features are an 8-dim fingerprint, deliberately simple and
  * deterministic so tests can assert exact values:
  *   - image: mean luminance of a 2 (rows) × 4 (cols) grid, each in
  *     [0,1] — the same grid pooling a real embedding model's
  *     preprocessing would start from;
  *   - audio: RMS amplitude of 8 equal time slices, each in [0,1].
  */
object MediaDecode {

  val FeatureDim = 8

  /** Decode any ImageIO-readable payload to the 2×4 grid-mean-luminance
    * fingerprint. None = not an image ImageIO can read.
    */
  def imageFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val sums = new Array[Double](FeatureDim)
        val counts = new Array[Long](FeatureDim)
        var y = 0
        while (y < h) {
          val row = (y * 2 / h) min 1
          var x = 0
          while (x < w) {
            val cell = row * 4 + ((x * 4 / w) min 3)
            val rgb = img.getRGB(x, y)
            // ITU-R BT.601 luma from the sRGB bytes
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            sums(cell) += lum / 255.0
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        Some(Array.tabulate(FeatureDim)(i =>
          if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat))
      }
    } catch { case _: Exception => None }
  }

  /** Decode a RIFF/WAVE integer-PCM payload to 8 per-slice RMS values.
    * None = not a WAV, or a compressed/float encoding this pure-JVM
    * reader doesn't handle. The chunk walk is
    * [[MediaHeaders.wavLayout]] — the hardened shared one, so a corrupt
    * 32-bit chunk length can't hang an executor task here either.
    */
  def wavFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    try {
      MediaHeaders.wavLayout(payload).flatMap { w =>
        val b = payload
        // 1 = integer PCM; 0xFFFE (extensible) commonly wraps PCM too
        // but needs the sub-format GUID — treat as undecodable here
        val bytesPer = w.bits / 8
        val avail =
          if (w.dataOff < 0) 0
          else math.min(w.dataLen, (b.length - w.dataOff).toLong).toInt
        val n = if (bytesPer >= 1) avail / bytesPer else 0
        if (w.fmtCode != 1 || bytesPer < 1 || bytesPer > 4 || n <= 0) None
        else {
          val dataOff = w.dataOff
          val full = (1L << (w.bits - 1)).toDouble // full-scale amplitude
          val sums = new Array[Double](FeatureDim)
          val counts = new Array[Long](FeatureDim)
          var i = 0
          while (i < n) {
            val slice = ((i.toLong * FeatureDim) / n).toInt min (FeatureDim - 1)
            val v: Double = bytesPer match {
              case 1 => ((b(dataOff + i) & 0xff) - 128).toDouble / 128.0 // u8
              case 2 => le16s(b, dataOff + i * 2) / full
              case 3 => le24s(b, dataOff + i * 3) / full
              case _ => le32(b, dataOff + i * 4).toDouble / full
            }
            sums(slice) += v * v
            counts(slice) += 1
            i += 1
          }
          Some(Array.tabulate(FeatureDim)(s =>
            if (counts(s) == 0) 0f else math.sqrt(sums(s) / counts(s)).toFloat))
        }
      }
    } catch { case _: Exception => None }
  }

  private def le16s(b: Array[Byte], o: Int): Short =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort
  private def le24s(b: Array[Byte], o: Int): Int =
    (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16)) << 8) >> 8 // sign-extend
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
}
