package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaDecode
import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRow

/** The real pure-JVM decoders behind the Multimodal seam: ImageIO
  * pixels and WAV PCM samples produce exact, asserted feature vectors
  * through `decodePartition` itself (fixtures generated deterministically
  * in-test — a BMP written by ImageIO, a WAV built byte-by-byte), while
  * text payloads keep the payload-hash features the m1–m4 oracles pin.
  */
class MediaDecodeSpec extends AnyFunSuite with SparkSpecBase {

  /** 8×2 BMP, left half black, right half white: the 2×4 grid means
    * must be exactly (0,0,1,1) per row.
    */
  private def halfBmp(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", out))
    out.toByteArray
  }

  /** Mono 16-bit PCM, 800 samples: first half silence, second half a
    * full-scale square wave — slice RMS must be ~0 then ~1.
    */
  private def halfWav(): Array[Byte] = {
    val n = 800
    val data = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v = if (i % 2 == 0) 32767 else -32767
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + data.length)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("ISO-8859-1")).putInt(data.length)
      .put(data)
    bb.array()
  }

  test("imageFeatures: grid luminance means from real BMP pixels") {
    val feats = MediaDecode.imageFeatures(halfBmp()).get
    assert(feats.toSeq == Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f))
    assert(MediaDecode.imageFeatures("not an image".getBytes).isEmpty)
  }

  test("wavFeatures: per-slice RMS from real PCM samples") {
    val feats = MediaDecode.wavFeatures(halfWav()).get
    assert(feats.take(4).forall(_ < 0.001f), feats.toSeq)
    assert(feats.drop(4).forall(_ > 0.99f), feats.toSeq)
    assert(MediaDecode.wavFeatures("RIFFxxxxJUNK".getBytes).isEmpty)
    // corrupt 32-bit chunk length (0xFFFFFFF8 = -8 as Int) must
    // terminate, not hang the chunk walk (shared MediaHeaders guard)
    val corrupt = halfWav()
    corrupt(16) = 0xf8.toByte; corrupt(17) = 0xff.toByte
    corrupt(18) = 0xff.toByte; corrupt(19) = 0xff.toByte
    assert(MediaDecode.wavFeatures(corrupt).isEmpty)
  }

  /** Grayscale gradient image of the given size, v = x*255/(w-1). */
  private def gradientPng(w: Int, h: Int, reversed: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = x * 255 / (w - 1)
      val v = if (reversed) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("resampleGray: exact area-average boxes, hand-computed") {
    // 4×4 → 2×2: each output cell is the mean of a 2×2 box
    val src = Array(
      0, 10, 100, 110,
      20, 30, 120, 130,
      200, 210, 40, 50,
      220, 230, 60, 70)
    assert(MediaDecode.resampleGray(src, 4, 4, 2, 2).toSeq ==
      Seq(15, 115, 215, 55))
    // upscale replicates (boxes collapse to single pixels)
    assert(MediaDecode.resampleGray(Array(1, 2, 3, 4), 2, 2, 4, 4).toSeq ==
      Seq(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("dhash64: real pixels — gradient direction sets/clears every bit") {
    // increasing left→right: px[c] < px[c+1] everywhere → all bits clear
    assert(MediaDecode.dhash64(gradientPng(36, 16)).contains(0L))
    // decreasing: every difference bit set
    assert(MediaDecode.dhash64(gradientPng(36, 16, reversed = true))
      .contains(-1L))
    assert(MediaDecode.dhash64("not an image".getBytes).isEmpty)
  }

  test("dhash64 is scale-invariant for exact block replication") {
    // a 9×8 random gray grid and its 2× replication share the thumbnail
    val r = new scala.util.Random(5)
    val base = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = r.nextInt(256)
      base.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val big = new java.awt.image.BufferedImage(18, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 18)
      big.setRGB(x, y, base.getRGB(x / 2, y / 2))
    def png(i: java.awt.image.BufferedImage) = {
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", o); o.toByteArray
    }
    val (h1, h2) = (MediaDecode.dhash64(png(base)), MediaDecode.dhash64(png(big)))
    assert(h1.isDefined && h1 == h2)
  }

  test("resizeExec: real decode → plan-math dims → exact PNG round-trip") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", gradientPng(40, 20)),
      MediaRow(2L, "image", "opaque payload".getBytes("UTF-8")))
    val out = Multimodal.resizeExec(spark.createDataset(rows), 10)
      .collect().sortBy(_.media_id)

    val img = out(0)
    // real dims 40×20, long side 40 > 10 → (10, 5) by floor division
    assert(img.width == 40 && img.height == 20)
    assert(img.out_w == 10 && img.out_h == 5 && img.format == "png")
    // the emitted PNG decodes back to exactly the resampled grid
    val back = MediaDecode.grayPixels(img.out_png).get
    val expected = {
      val (w, h, gray) = MediaDecode.grayPixels(gradientPng(40, 20)).get
      MediaDecode.resampleGray(gray, w, h, 10, 5)
    }
    assert(back._1 == 10 && back._2 == 5 && back._3.toSeq == expected.toSeq)

    // opaque: stub dims (payload-hash), plan math applied, null bitmap
    val op = out(1)
    assert(op.format == "opaque" && op.out_png == null)
    assert(math.max(op.out_w, op.out_h) <= 10 ||
      math.max(op.width, op.height) <= 10)
  }

  test("dhashSignaturesReal: band packing matches dhash64 bit layout") {
    import spark.implicits._
    val pay = gradientPng(36, 16, reversed = true) // dhash = all ones
    val rows = Seq(MediaRow(7L, "image", pay))
    val sig = Multimodal.dhashSignaturesReal(spark.createDataset(rows))
      .collect().head
    assert(sig.getLong(0) == 7L)
    (1 to 4).foreach(i => assert(sig.getLong(i) == 0xffffL))
  }

  test("decodePartition routes real decoders by format and keeps the hash fake for opaque payloads") {
    import spark.implicits._
    val text = "just a document body".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "image", halfBmp()),
      MediaRow(2L, "audio", halfWav()),
      MediaRow(3L, "image", text))
    val out = Multimodal.decodePartition(spark.createDataset(rows))
      .collect().sortBy(_.media_id)

    val bmp = out(0)
    assert(bmp.format == "bmp" && bmp.width == 8 && bmp.height == 2)
    assert(bmp.features.toSeq == Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f))

    val wav = out(1)
    assert(wav.format == "wav" && wav.channels == 1 && wav.sample_rate == 8000)
    assert(wav.features.take(4).forall(_ < 0.001f))
    assert(wav.features.drop(4).forall(_ > 0.99f))

    // the oracle-pinned stand-in: text payloads still get payload-hash
    // features, bit-for-bit what m1–m4 hashed before the real decoders
    val opaque = out(2)
    val h = java.lang.Long.parseLong(org.apache.commons.codec.digest
      .DigestUtils.md5Hex(text).substring(0, 8), 16)
    assert(opaque.format == "opaque")
    assert(opaque.features.toSeq ==
      Seq.tabulate(8)(i => ((h >> i) % 256).toFloat / 255.0f))
  }
}
