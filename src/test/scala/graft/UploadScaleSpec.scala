package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{SessionBuilder, SessionStore}
import graft.ops.{Hunt, Upload}

/** Multi-GB ingest: the reference's capture nodes rotate files at
  * maxFileSizeG (default 12G), so a posted capture beyond the 2 GiB JVM
  * array limit is the NORM at scale, not an edge. A whole-file
  * `readAllBytes` ingest throws on such a file no matter the heap
  * ("Required array size too large") — this spec passing at 2.3 GB is
  * itself the proof that the copy, the record-chunked decode, and the
  * packet reads all stream.
  */
class UploadScaleSpec extends AnyFunSuite with SparkSpecBase {

  test("upload ingests a 2.3 GB classic pcap; packet reads past 2 GiB resolve") {
    val dir = Files.createTempDirectory("graft-bigpcap")
    val big = dir.resolve("big.pcap")
    val payloadLen = 65000
    val needle = "GRAFTMARK".getBytes("US-ASCII")
    val dataLen = 14 + 20 + 8 + payloadLen
    val recLen = 16 + dataLen
    val nRec = (2300L * 1024 * 1024 / recLen).toInt + 1
    assert(nRec.toLong * recLen > (Int.MaxValue.toLong + (64 << 20)),
      "corpus must exceed the JVM array limit by a margin")

    // one record template: eth / ipv4 / udp, needle-prefixed payload
    val rec = new Array[Byte](recLen)
    val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1700000000).putInt(0).putInt(dataLen).putInt(dataLen)
    val b = ByteBuffer.wrap(rec, 16, dataLen).order(ByteOrder.BIG_ENDIAN)
    b.position(16 + 12)
    b.putShort(0x0800.toShort) // ethertype
    b.put(0x45.toByte).put(0.toByte) // v4, ihl 5
    b.putShort((20 + 8 + payloadLen).toShort) // ip total length
    b.putShort(0.toShort).putShort(0.toShort) // id, frag
    b.put(64.toByte).put(17.toByte).putShort(0.toShort) // ttl, udp, cksum
    b.putInt(0x0a000000) // src ip (patched per record)
    b.putInt(0xc0a80001) // dst ip 192.168.0.1
    b.putShort(1000.toShort).putShort(2000.toShort) // ports
    b.putShort((8 + payloadLen).toShort).putShort(0.toShort) // udp len, cksum
    System.arraycopy(needle, 0, rec, 16 + 14 + 28, needle.length)

    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(big), 1 << 20)
    try {
      out.write(graft.etl.Pcap.classicHeader(1, 65536))
      var i = 0
      while (i < nRec) {
        // distinct flow per record: src ip = 10.x.y.z from the index
        rec(16 + 14 + 13) = ((i >> 16) & 0xff).toByte
        rec(16 + 14 + 14) = ((i >> 8) & 0xff).toByte
        rec(16 + 14 + 15) = (i & 0xff).toByte
        out.write(rec)
        i += 1
      }
    } finally out.close()
    assert(Files.size(big) > Int.MaxValue.toLong)

    val store = dir.resolve("store").toString
    val pcapDir = dir.resolve("pcaps").toString
    try {
      val res = Upload.upload(spark, big.toString, store, pcapDir,
        tags = Seq("big"))
      assert(res.sessions == nRec.toLong) // one distinct flow per record
      assert(res.packets == nRec.toLong)

      // pick the FIRST and LAST flows: the last one's packet bytes sit
      // past the 2 GiB mark of the durable copy
      import spark.implicits._
      def ip(i: Int) = s"10.${(i >> 16) & 0xff}.${(i >> 8) & 0xff}.${i & 0xff}"
      val picked = SessionStore.read(spark, store)
        .drop("day")
        .as[SessionBuilder.SessionRow]
        .filter(r => r.srcIp == ip(0) || r.srcIp == ip(nRec - 1))
      val rows = picked.collect()
      assert(rows.length == 2)
      assert(rows.exists(_.packetPos.exists(_ > Int.MaxValue.toLong)),
        "the last flow's packetPos must exceed 2 GiB")
      val hunted = Hunt.run(picked,
        Hunt.HuntConfig(Hunt.AsciiNeedle("GRAFTMARK", caseSensitive = true)))
        .select("srcIp", "huntTag").collect()
      assert(hunted.length == 2 && hunted.forall(!_.isNullAt(1)),
        s"needle must hit both flows: ${hunted.mkString(",")}")
    } finally {
      // 2 × 2.3 GB on disk — clean up even on failure
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => try Files.delete(p) catch { case _: Exception => () })
    }
  }

  test("a literal filename with glob metacharacters reads as-is") {
    // upload names are user-controlled: `capture[1].pcap` must read the
    // named file, not be reinterpreted as a character class (which would
    // match only a nonexistent `capture1.pcap` and throw NotFound)
    val dir = Files.createTempDirectory("graft-globname")
    val f = dir.resolve("capture[1].pcap")
    val out = new java.io.ByteArrayOutputStream()
    out.write(graft.etl.Pcap.classicHeader(1, 65535))
    val data = new Array[Byte](60)
    val b = ByteBuffer.wrap(data)
    b.position(12); b.putShort(0x0800.toShort)
    b.put(0x45.toByte).put(0.toByte).putShort(46.toShort)
    b.putShort(1.toShort).putShort(0.toShort)
    b.put(64.toByte).put(17.toByte).putShort(0.toShort)
    b.putInt(0x0a000001).putInt(0x0a000002)
    val rec = ByteBuffer.allocate(16 + 60).order(ByteOrder.LITTLE_ENDIAN)
    rec.putInt(1700000000).putInt(0).putInt(60).putInt(60).put(data)
    out.write(rec.array())
    Files.write(f, out.toByteArray)
    val got = graft.etl.Pcap.readPackets(spark, f.toString).collect()
    assert(got.length == 1 && got.head.file.endsWith("capture[1].pcap"))
  }
}
