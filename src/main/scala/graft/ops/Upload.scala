package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.etl.{SessionBuilder, SessionStore}
import graft.etl.SessionBuilder.SessionRow

/** PCAP upload ingest — the `/api/upload` endpoint (reference:
  * viewer/apiMisc.js:200-233): a posted capture file is handed to
  * `uploadCommand` (conventionally `capture --copy -n {NODE}
  * -r {TMPFILE} {TAGS}`), i.e. the batch sessionizer runs over the
  * file with the request's tags and the pcap is copied into the node's
  * pcap directory so later packet reads (detail, hunts, export) resolve.
  *
  * Spark-first: the sessionizer IS the existing batch pipeline
  * ([[SessionBuilder.sessionize]] — distributed decode + groupByKey
  * build); upload is glue that (a) copies the capture into the durable
  * pcap dir first so every stored `fileId` references the copy, not the
  * caller's temp file, and (b) appends the resulting SPI rows to the
  * day-partitioned store. An upload only ever appends new files to the
  * days it touches — at 100 TB it never rewrites existing data.
  */
object Upload {

  final case class Result(sessions: Long, packets: Long, pcapPath: String)

  /** Ingest `tmpFile` into `storePath`, with the durable pcap copy under
    * `pcapDir`. Returns counts and the copied path (the `{TMPFILE}` is
    * the caller's to delete, as the reference unlinks after the command).
    */
  def upload(spark: SparkSession, tmpFile: String, storePath: String,
      pcapDir: String, tags: Seq[String] = Nil,
      node: String = "upload"): Result = {
    val (sessions, dest) = ingestWithPath(spark, tmpFile, pcapDir, tags, node)
    // localCheckpoint: materialize before the store append so the rows
    // are computed once (count + write) and the write plan does not
    // depend on re-reading the temp file after the caller deletes it
    val rows = sessions.localCheckpoint()
    SessionStore.append(rows, storePath)
    import spark.implicits._
    val n = rows.count()
    val pkts = if (n == 0) 0L else rows.map(_.totPackets).reduce(_ + _)
    Result(n, pkts, dest)
  }

  /** The sessionize half, usable standalone: copy + decode + tag,
    * returning the rows without writing a store.
    */
  def ingest(spark: SparkSession, tmpFile: String, pcapDir: String,
      tags: Seq[String] = Nil, node: String = "upload"): Dataset[SessionRow] =
    ingestWithPath(spark, tmpFile, pcapDir, tags, node)._1

  /** [[ingest]] plus the durable copy's path. The copy is SINGLE-PASS:
    * the source streams through an MD5 digest while being copied
    * (classic) or transcoded (pcapng) into a dot-prefixed temp name —
    * invisible to [[graft.etl.Pcap.readPackets]]'s hidden-file filter —
    * and the finished digest names the durable file the temp renames
    * into. A multi-GB posted capture is read exactly once, where the
    * previous shape scanned it three times (name hash, copy, name hash
    * again for the result).
    */
  def ingestWithPath(spark: SparkSession, tmpFile: String, pcapDir: String,
      tags: Seq[String] = Nil,
      node: String = "upload"): (Dataset[SessionRow], String) = {
    val dir = java.nio.file.Paths.get(pcapDir)
    java.nio.file.Files.createDirectories(dir)
    val src = java.nio.file.Paths.get(tmpFile)
    val magic = new Array[Byte](4)
    val mIn = java.nio.file.Files.newInputStream(src)
    val mRead = try mIn.read(magic) finally mIn.close()
    val md = java.security.MessageDigest.getInstance("MD5")
    val tmpDest = dir.resolve(
      s".upload-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    // pcapng uploads are transcoded to classic pcap at copy time (the
    // reference accepts pcapng via libpcap but its store is always
    // classic records) — stored packetPos/packetLen then seek correctly
    // into the durable copy for hunts/export. Both paths STREAM with a
    // bounded buffer: a posted capture is routinely multi-GB (the
    // reference rotates at 12G) and a whole-file read caps at the 2 GiB
    // JVM array limit, doubling memory well before that.
    val isNg = mRead == 4 && graft.etl.Pcap.isPcapng(magic)
    // any failure from here until the rename must remove the temp: a
    // multi-GB `.upload-*.tmp` leaked per failed post (disk full, I/O
    // error mid-copy) would otherwise accumulate in the capture dir
    val destPath = try {
    val in = new java.security.DigestInputStream(
      new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(src), 1 << 20), md)
    var ngHeader: Option[(Int, Int)] = None
    try {
      val out = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(tmpDest), 1 << 20)
      try {
        if (isNg) {
          out.write(new Array[Byte](24)) // header backpatched below
          ngHeader = graft.etl.Pcap.pcapngToPcapStream(in, out)
        } else {
          val buf = new Array[Byte](1 << 20)
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        }
      } finally out.close()
      // the transcoder may stop before EOF on a truncated tail; drain so
      // the digest is always the FULL source content (the name contract)
      val drain = new Array[Byte](1 << 16)
      while (in.read(drain) > 0) ()
    } finally in.close()
    if (isNg && ngHeader.isEmpty) {
      java.nio.file.Files.deleteIfExists(tmpDest)
      throw new IllegalArgumentException(s"unreadable pcapng upload $tmpFile")
    }
    ngHeader.foreach { case (lt, snap) =>
      val raf = new java.io.RandomAccessFile(tmpDest.toFile, "rw")
      try {
        raf.seek(0)
        raf.write(graft.etl.Pcap.classicHeader(lt, snap))
      } finally raf.close()
    }
    val dp = durableName(tmpFile, pcapDir, node, md.digest())
    java.nio.file.Files.move(tmpDest, dp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dp
    } catch {
      case t: Throwable =>
        java.nio.file.Files.deleteIfExists(tmpDest)
        throw t
    }
    val dest = destPath.toString
    val cleanTags = sanitizeTags(tags)
    import spark.implicits._
    val rows = SessionBuilder.sessionize(spark, dest, node = node)
      .map(s => if (cleanTags.isEmpty) s
        else s.copy(tags = (s.tags ++ cleanTags).distinct))
    (rows, dest)
  }

  /** Deterministic durable name:
    * `<node>-<md5-8 of content>-<basename>.pcap` under `pcapDir` — the
    * `--copy` landing spot (the `.pcap` suffix is normalized; the pcap
    * reader and hunt path key on it). The content hash makes the name a
    * function of the BYTES: re-uploading the same capture overwrites
    * its own copy (idempotent), while two different captures that
    * happen to share a staged basename land side by side instead of the
    * second silently replacing the bytes the first upload's stored
    * offsets point into.
    */
  def copiedPath(tmpFile: String, pcapDir: String, node: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(tmpFile))
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    durableName(tmpFile, pcapDir, node, md.digest()).toString
  }

  /** The single source of the durable-name contract — [[copiedPath]]
    * (standalone, scans the file) and [[ingestWithPath]] (digest built
    * during the copy) must always agree.
    */
  private def durableName(tmpFile: String, pcapDir: String, node: String,
      digest: Array[Byte]): java.nio.file.Path = {
    val base0 = java.nio.file.Paths.get(tmpFile).getFileName.toString
    val base = if (base0.endsWith(".pcap")) base0 else s"$base0.pcap"
    val h = digest.take(4).map("%02x".format(_)).mkString
    java.nio.file.Paths.get(pcapDir, s"$node-$h-$base")
  }

  /** Reference tag sanitation (`apiMisc.js:206`): strip to
    * `[-a-zA-Z0-9_:,]`, split on commas, empties dropped — a caller's
    * HTTP-style "a,b" value yields tags [a, b], never a merged "ab".
    */
  def sanitizeTags(tags: Seq[String]): Seq[String] =
    tags.map(_.replaceAll("[^-a-zA-Z0-9_:,]", ""))
      .flatMap(_.split(","))
      .filter(_.nonEmpty)
}
