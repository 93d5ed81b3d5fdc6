package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pcap

/** End-to-end check of the chunked big-file read path (planChunks +
  * readChunk): with an artificially small split size, the union of all
  * chunk reads must equal the single-pass whole-file walk packet for
  * packet — indices, timestamps, offsets, and reassembled fragment
  * groups spanning chunk boundaries included.
  */
class ChunkedReadSpec extends AnyFunSuite {

  private def frame(ipId: Int, fragOff: Int, mf: Boolean,
      payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(14 + 20 + payload.length)
    b.put(Array.fill[Byte](6)(0x02)).put(Array.fill[Byte](6)(0x04))
    b.putShort(0x0800.toShort)
    b.put(0x45.toByte).put(0.toByte)
    b.putShort((20 + payload.length).toShort)
    b.putShort(ipId.toShort)
    b.putShort((((if (mf) 0x2000 else 0) | (fragOff / 8)) & 0xffff).toShort)
    b.put(64.toByte).put(17.toByte).putShort(0.toShort)
    b.putInt(0x0a000001).putInt(0x0a000002)
    b.put(payload)
    b.array()
  }

  private def record(tsUs: Long, data: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt((tsUs / 1000000L).toInt).putInt((tsUs % 1000000L).toInt)
    b.putInt(data.length).putInt(data.length)
    b.put(data)
    b.array()
  }

  test("chunk-union equals the whole-file walk, spanning frags included") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Pcap.classicHeader(1, 65535))
    val base = 1700000000L * 1000000L
    // 400 packets, a 2-fragment group every 7th index (tail 2 later),
    // so several groups straddle the ~4 KiB chunk boundaries
    var i = 0
    val pendingTails = scala.collection.mutable.Queue[(Int, Array[Byte])]()
    var emitted = 0
    while (emitted < 400) {
      if (pendingTails.nonEmpty && pendingTails.head._1 <= emitted) {
        val (_, rec) = pendingTails.dequeue()
        out.write(rec)
      } else if (i % 7 == 3) {
        out.write(record(base + emitted * 1000L,
          frame(i, 0, mf = true, Array.tabulate[Byte](64)(j => (i + j).toByte))))
        pendingTails += ((emitted + 3, record(base + (emitted + 3) * 1000L,
          frame(i, 64, mf = false, Array.tabulate[Byte](16)(j => (i - j).toByte)))))
        i += 1
      } else {
        out.write(record(base + emitted * 1000L,
          frame(i, 0, mf = false, Array.fill[Byte](40 + i % 50)((i % 97).toByte))))
        i += 1
      }
      emitted += 1
    }
    val bytes = out.toByteArray
    val dir = java.nio.file.Files.createTempDirectory("graft-chunks")
    val f = dir.resolve("big.pcap")
    java.nio.file.Files.write(f, bytes)
    val path = f.toString
    val sconf = new Pcap.SerializableConf(
      new org.apache.hadoop.conf.Configuration())

    val chunks = Pcap.planChunks(path, bytes.length.toLong, sconf,
      splitBytes = 4096L)
    assert(chunks.length >= 5, s"want several chunks, got ${chunks.length}")
    // chunks tile the file exactly
    assert(chunks.head.start == 24L && chunks.last.end == bytes.length)
    chunks.sliding(2).foreach { case Seq(a, b) => assert(a.end == b.start)
      case _ => () }

    val viaChunks = chunks.flatMap(c => Pcap.readChunk(c, sconf).toSeq)
      .sortBy(_.index)
    val whole = Pcap.assembleFrags4(Pcap.parseFile(bytes, path)).toSeq
    assert(whole.exists(_.data.length == 14 + 20 + 80),
      "the whole walk must contain assembled 80-byte fragment groups")
    assert(viaChunks.map(_.index) == whole.map(_.index))
    viaChunks.zip(whole).foreach { case (a, b) =>
      assert(a.index == b.index && a.tsMicros == b.tsMicros &&
        a.fileOffset == b.fileOffset && a.prevTsMicros == b.prevTsMicros &&
        a.data.toSeq == b.data.toSeq, s"packet ${b.index}")
    }
  }

  test("a record clipped at the overlap-window edge drops, never corrupts") {
    // layout: [frag A0 | ~8 MiB filler | final frag A1], split so chunk 1
    // ends after A0 and A1's record STRADDLES chunk1.end + FragOverlapBytes
    // (8 MiB): the overlap read sees A1's headers but only part of its
    // payload. The truncated record must be skipped — assembling it would
    // emit a silently short packet — so group A drops entirely (the
    // documented >overlap-span degradation) and only the filler survives.
    val overlapBytes = 8L << 20
    val a0 = record(1000000L, frame(500, 0, mf = true,
      Array.tabulate[Byte](64)(_.toByte)))
    val a1 = record(9000000L, frame(500, 64, mf = false,
      Array.tabulate[Byte](16)(j => (100 + j).toByte)))
    val chunk1End = 24L + a0.length
    // A1's data must clip to >=34 bytes (parseable eth+ip headers, short
    // payload) — the worst case: a fragment that still LOOKS assemblable
    val clipAt = 44
    val a1Start = chunk1End + overlapBytes - (16 + clipAt)
    // pad with snaplen-bounded filler records up to exactly a1Start
    val span = (a1Start - chunk1End).toInt
    val full = span / 65050          // 16 hdr + 34 frame + 65000 payload
    val rem = span % 65050
    assert(rem >= 66, "remainder filler must fit a minimal record")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Pcap.classicHeader(1, 65535))
    out.write(a0)
    var t = 2000000L
    for (_ <- 0 until full) {
      out.write(record(t, frame(7, 0, mf = false, new Array[Byte](65000))))
      t += 1000
    }
    out.write(record(t, frame(8, 0, mf = false, new Array[Byte](rem - 50))))
    assert(out.size().toLong == a1Start,
      "fillers must place A1's record straddling the overlap edge")
    out.write(a1)
    val bytes = out.toByteArray
    val dir = java.nio.file.Files.createTempDirectory("graft-clip")
    val f = dir.resolve("clip.pcap")
    java.nio.file.Files.write(f, bytes)
    val sconf = new Pcap.SerializableConf(
      new org.apache.hadoop.conf.Configuration())
    val chunks = Pcap.planChunks(f.toString, bytes.length.toLong, sconf,
      splitBytes = 64L)
    assert(chunks.head.end == chunk1End, "chunk 1 must end right after A0")
    val got = chunks.flatMap(c => Pcap.readChunk(c, sconf).toSeq)
      .sortBy(_.index)
    val fillerCount = full + 1
    assert(got.map(_.index) == (1 to fillerCount),
      s"only fillers survive; got indices ${got.map(_.index).take(5)}... " +
        s"count ${got.size} (A truncated-assembled emit would add index 0)")
  }
}
