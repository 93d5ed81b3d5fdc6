package graft.etl

import java.io.RandomAccessFile
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Pcap byte-store backends.
  *
  * The reference writes capture files either as plain local files
  * (capture/writer-simple.c) or as S3 multipart objects
  * (capture/plugins/writer-s3.c): the capture buffer is flushed part by
  * part (writer-s3.c:574-581, partNumber up to 2000, :50), and readers
  * fetch slices with ranged GETs. Both stores serve the same access
  * pattern — `read(pos, len)` of a `(packetPos, packetLen)` slice — so
  * Hunt / PcapExport / display decode take a [[PcapStore.Store]] and
  * never care which backend holds the bytes.
  *
  * At 100 TB the only operations that may touch the store are ranged
  * reads bounded by the slices a task's sessions reference; nothing here
  * can read a whole capture file.
  */
object PcapStore {

  trait Blob extends AutoCloseable {
    /** Read exactly `len` bytes at absolute offset `pos`. */
    def read(pos: Long, len: Int): Array[Byte]
    def size: Long
  }

  /** A backend resolves a fileId/path to an open blob. Implementations
    * must be serializable — one instance is captured per task closure
    * and handles are cached per task (see Hunt.run).
    */
  trait Store extends Serializable {
    def open(path: String): Blob
  }

  /** Plain local capture files (writer-simple.c).
    *
    * A referenced file may be a pcapng a caller sessionized DIRECTLY
    * (without the Upload path that persists a classic transcode): the
    * stored `packetPos`/`packetLen` then address the deterministic
    * transcoded image ([[Pcap.parseFile]]), not the on-disk block
    * layout. Serving slices from the raw pcapng would silently return
    * block-header garbage, so detect the magic and serve from the same
    * in-memory transcode — correct offsets at the cost of holding that
    * one file's bytes (the documented trade of skipping Upload;
    * production stores are always classic records).
    */
  case object Local extends Store {
    def open(path: String): Blob = {
      val raf = new RandomAccessFile(path, "r")
      val magic = new Array[Byte](4)
      val n = raf.read(magic)
      if (n == 4 && Pcap.isPcapng(magic)) {
        try {
          // the in-memory transcode only serves files an int array can
          // hold; a >=2 GB pcapng must be ingested via Upload (persisted
          // classic transcode) — fail loudly, never a silent wrong read
          if (raf.length() > Int.MaxValue - 8)
            throw new java.io.IOException(
              s"pcapng $path too large for direct reads; ingest via Upload")
          raf.seek(0)
          val all = new Array[Byte](raf.length().toInt)
          raf.readFully(all)
          val classic = Pcap.pcapngToPcap(all).getOrElse(
            throw new java.io.IOException(s"unreadable pcapng $path"))
          new Blob {
            def read(pos: Long, len: Int): Array[Byte] = {
              // match RandomAccessFile.readFully semantics: a stale or
              // corrupt packetPos past the transcoded image must throw,
              // not zero-pad (copyOfRange pads silently)
              if (pos < 0 || len < 0 || pos + len > classic.length)
                throw new java.io.EOFException(
                  s"read [$pos,+$len) past transcoded pcapng of ${classic.length} bytes")
              java.util.Arrays.copyOfRange(classic, pos.toInt, pos.toInt + len)
            }
            def size: Long = classic.length.toLong
            def close(): Unit = ()
          }
        } finally raf.close()
      } else new Blob {
        def read(pos: Long, len: Int): Array[Byte] = {
          val b = new Array[Byte](len)
          raf.seek(pos); raf.readFully(b); b
        }
        def size: Long = raf.length()
        def close(): Unit = raf.close()
      }
    }
  }

  /** writer-s3.c layout: one logical capture file = an ordered series of
    * fixed-size parts (the multipart upload's flushed buffers). `path` is
    * the object prefix — here a directory holding `part-NNNNN` files, the
    * local stand-in for `s3://bucket/node/…-N.pcap`'s parts. A ranged
    * read opens only the ⌈len/partSize⌉+1 parts covering the slice — the
    * ranged-GET cost model of the real thing.
    */
  final case class Chunked(partSize: Long) extends Store {
    require(partSize > 0, "partSize must be positive")
    def open(path: String): Blob = new Blob {
      private val dir = Paths.get(path)
      private val nParts: Int = {
        var n = 0
        while (Files.exists(dir.resolve(f"part-$n%05d"))) n += 1
        n
      }
      // Trust the layout on disk, not the constructor: a store written
      // with a different part size would otherwise be silently misread
      // (offsets land in the wrong part; Hunt's catch-and-skip turns
      // that into silently missing matches). Derive the size from
      // part-00000 and fail fast if any interior part disagrees.
      private val effPartSize: Long =
        if (nParts == 0) partSize
        else if (nParts == 1)
          // one part: any stride ≥ its size routes every offset to it
          math.max(partSize, Files.size(dir.resolve("part-00000")))
        else {
          val p0 = Files.size(dir.resolve("part-00000"))
          var i = 1
          while (i < nParts - 1) {
            val s = Files.size(dir.resolve(f"part-$i%05d"))
            require(s == p0,
              s"chunked store $path: part-$i size $s != part-0 size $p0")
            i += 1
          }
          p0
        }
      private val lastSize: Long =
        if (nParts == 0) 0L
        else Files.size(dir.resolve(f"part-${nParts - 1}%05d"))
      // open part channels, lazily, cached for the blob's lifetime
      private val open = new java.util.HashMap[Int, RandomAccessFile]()
      private def part(i: Int): RandomAccessFile = {
        var r = open.get(i)
        if (r == null) {
          r = new RandomAccessFile(dir.resolve(f"part-$i%05d").toFile, "r")
          open.put(i, r)
        }
        r
      }
      def size: Long =
        if (nParts == 0) 0L else (nParts - 1).toLong * effPartSize + lastSize
      def read(pos: Long, len: Int): Array[Byte] = {
        if (pos < 0 || pos + len > size)
          throw new java.io.EOFException(s"read past end: $pos+$len > $size")
        val out = new Array[Byte](len)
        var off = 0
        var p = pos
        while (off < len) {
          val i = (p / effPartSize).toInt
          // stay in LONG math until after the min: a part size over
          // 2 GB (S3 allows 5 GB parts) would wrap the int casts and
          // make every read throw
          val inPart = p % effPartSize
          val take = math.min((len - off).toLong, effPartSize - inPart).toInt
          val raf = part(i)
          raf.seek(inPart)
          raf.readFully(out, off, take)
          off += take; p += take
        }
        out
      }
      def close(): Unit = {
        open.values.forEach(r => try r.close() catch { case _: Exception => () })
        open.clear()
      }
    }

    /** Writer side: split `src` into parts under `destDir` (the capture
      * node's multipart flush loop, writer-s3.c:560-581).
      */
    def writeParts(src: Array[Byte], destDir: String): Int = {
      val dir = Paths.get(destDir)
      Files.createDirectories(dir)
      var i = 0
      var off = 0L
      while (off < src.length || i == 0) {
        val take = math.min(partSize, src.length - off).toInt
        Files.write(dir.resolve(f"part-$i%05d"),
          java.util.Arrays.copyOfRange(src, off.toInt, off.toInt + take),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        off += take; i += 1
      }
      i
    }
  }
}
