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

  /** Full grayscale decode: (width, height, row-major luminance 0-255).
    * None = not an image ImageIO can read. The luma weights match
    * [[imageFeatures]] (BT.601), rounded to an int per pixel so every
    * downstream consumer (resample, dHash) is integer-deterministic.
    */
  def grayPixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            out(y * w + x) = math.round(lum).toInt min 255
            x += 1
          }
          y += 1
        }
        Some((w, h, out))
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic area-average resample of a grayscale grid. Each
    * output cell averages the source box `[x·w/outW, (x+1)·w/outW) ×
    * [y·h/outH, (y+1)·h/outH)` (boxes clamped non-empty), integer
    * accumulation with round-half-up — bit-identical on every JVM,
    * unlike Graphics2D scaling whose rasterizer hints may vary.
    * Upscales replicate source pixels (the boxes collapse to one cell).
    */
  def resampleGray(gray: Array[Int], w: Int, h: Int,
      outW: Int, outH: Int): Array[Int] = {
    require(w > 0 && h > 0 && outW > 0 && outH > 0 && gray.length >= w * h,
      "bad resample geometry")
    val out = new Array[Int](outW * outH)
    var oy = 0
    while (oy < outH) {
      val y0 = oy.toLong * h / outH
      val y1 = math.max(y0 + 1, (oy + 1).toLong * h / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox.toLong * w / outW
        val x1 = math.max(x0 + 1, (ox + 1).toLong * w / outW)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray((y * w + x).toInt); x += 1 }
          y += 1
        }
        val n = (y1 - y0) * (x1 - x0)
        out(oy * outW + ox) = ((sum + n / 2) / n).toInt
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Real perceptual dHash: decode → area-resample to the canonical
    * 9×8 grayscale thumbnail → 64 left-vs-right difference bits. Bit
    * layout matches [[graft.ops.Multimodal.dhashSignatures]]: bit
    * `i = r·8 + c` set iff `px[r·9+c] > px[r·9+c+1]`, band b =
    * bits [16b, 16b+16). None = payload isn't ImageIO-readable.
    */
  def dhash64(payload: Array[Byte]): Option[Long] =
    grayPixels(payload).map { case (w, h, gray) =>
      val px = resampleGray(gray, w, h, 9, 8)
      var bits = 0L
      var i = 0
      while (i < 64) {
        val r = i / 8; val c = i % 8
        if (px(r * 9 + c) > px(r * 9 + c + 1)) bits |= (1L << i)
        i += 1
      }
      bits
    }

  /** Encode a grayscale grid as PNG bytes (ImageIO's built-in writer).
    * Stored as equal-channel sRGB, NOT `TYPE_BYTE_GRAY`: Java's gray
    * type carries the linear CS_GRAY color space, whose `getRGB`
    * conversion applies a gamma transform — equal-channel RGB makes
    * encode→decode an exact identity on the luminance values.
    */
  def encodeGrayPng(gray: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = gray(y * w + x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
