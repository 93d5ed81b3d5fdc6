package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.etl.SessionBuilder.SessionRow

/** E13: Hunts — batch packet-content search jobs over stored pcap bytes
  * (reference: viewer/apiHunts.js:13-112 matchers, job runner 370-580).
  *
  * A hunt re-reads each matching session's raw packets (addressed by the
  * session's `fileId`/`packetPos`/`packetLen` arrays — the reference's
  * design, kept verbatim) and scans payload bytes for an ascii /
  * ascii-case-sensitive / hex / regex needle, optionally restricted to
  * one direction. Matching sessions get a tag added, like the reference
  * writes hunt tags back to matched sessions.
  *
  * Scale: sessions partition across executors; each task opens only the
  * pcap files its sessions reference (files are grouped per partition by
  * sorting on fileId), so the byte side-channel is read once per
  * task×file, never shuffled.
  */
object Hunt {

  sealed trait Needle { def matches(hay: Array[Byte]): Boolean }

  /** ASCII substring, optionally case-insensitive (reference `ascii` /
    * `asciicase` hunt types).
    */
  final case class AsciiNeedle(s: String, caseSensitive: Boolean) extends Needle {
    private val needle =
      (if (caseSensitive) s else s.toLowerCase).getBytes(StandardCharsets.ISO_8859_1)
    def matches(hay: Array[Byte]): Boolean = {
      val h = if (caseSensitive) hay else hay.map(b =>
        if (b >= 'A' && b <= 'Z') (b + 32).toByte else b)
      indexOf(h, needle) >= 0
    }
  }

  /** Raw byte-sequence needle from a hex string (reference `hex`). */
  final case class HexNeedle(hex: String) extends Needle {
    private val needle = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def matches(hay: Array[Byte]): Boolean = indexOf(hay, needle) >= 0
  }

  /** Regex over the latin-1 view of the payload (reference `regex` /
    * `hexregex`; uses re2j-style linear matching in the reference — Java
    * regex here, applied to bounded payloads).
    */
  final case class RegexNeedle(re: String) extends Needle {
    private val p = java.util.regex.Pattern.compile(re)
    def matches(hay: Array[Byte]): Boolean =
      p.matcher(new String(hay, StandardCharsets.ISO_8859_1)).find()
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    if (needle.isEmpty) return 0
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  final case class HuntConfig(
      needle: Needle,
      src: Boolean = true,
      dst: Boolean = true,
      tag: String = "hunt-match")

  /** Run a hunt over session rows; returns the sessions with a `huntTag`
    * column (null when unmatched) — the write-back analogue.
    */
  def run(sessions: Dataset[SessionRow], cfg: HuntConfig): DataFrame = {
    val spark = sessions.sparkSession
    import spark.implicits._
    val matched = sessions.mapPartitions { rows =>
      val fileCache = scala.collection.mutable.Map[String, Array[Byte]]()
      def bytesOf(f0: String): Array[Byte] = {
        // fileId may be a URI from the binaryFile source (file:/…)
        val f = if (f0.startsWith("file:")) new java.net.URI(f0).getPath else f0
        fileCache.getOrElseUpdate(f,
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))
      }
      rows.map { s =>
        // Scan every pcap file this session references — a long session's
        // packets can span files. The packetPos filter keeps only this
        // segment's packets within each file.
        val wanted = s.packetPos.toSet
        val hit = s.fileId.exists { f =>
          val all =
            try bytesOf(f)
            catch { case _: Exception => Array.empty[Byte] }
          if (all.isEmpty) false
          else {
            val packets = graft.etl.Pcap.parseFile(all, f)
              .filter(p => wanted.contains(p.fileOffset))
              .flatMap(graft.etl.Decode.decode(_))
              .toSeq
            def dirOf(p: graft.etl.Decode.DecodedPacket): Int =
              if (p.srcIp == s.srcIp && p.srcPort == s.srcPort) 0 else 1
            packets.exists { p =>
              p.payload.nonEmpty &&
                ((cfg.src && dirOf(p) == 0) || (cfg.dst && dirOf(p) == 1)) &&
                cfg.needle.matches(p.payload)
            }
          }
        }
        // Key on (sessionId, segmentSeq): segments of one long session
        // share sessionId, so joining back on sessionId alone would
        // cross-product n segments into n² rows.
        (s.sessionId, s.segmentSeq, hit)
      }
    }.toDF("sessionId", "segmentSeq", "hit")
    sessions.toDF().join(matched, Seq("sessionId", "segmentSeq"))
      .withColumn("huntTag", when(col("hit"), lit(cfg.tag)))
      .drop("hit")
  }
}
