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
    val sessions = ingest(spark, tmpFile, pcapDir, tags, node)
    // localCheckpoint: materialize before the store append so the rows
    // are computed once (count + write) and the write plan does not
    // depend on re-reading the temp file after the caller deletes it
    val rows = sessions.localCheckpoint()
    SessionStore.append(rows, storePath)
    import spark.implicits._
    val n = rows.count()
    val pkts = if (n == 0) 0L else rows.map(_.totPackets).reduce(_ + _)
    Result(n, pkts, copiedPath(tmpFile, pcapDir, node))
  }

  /** The sessionize half, usable standalone: copy + decode + tag,
    * returning the rows without writing a store.
    */
  def ingest(spark: SparkSession, tmpFile: String, pcapDir: String,
      tags: Seq[String] = Nil, node: String = "upload"): Dataset[SessionRow] = {
    val dest = copiedPath(tmpFile, pcapDir, node)
    val destPath = java.nio.file.Paths.get(dest)
    java.nio.file.Files.createDirectories(destPath.getParent)
    val src = java.nio.file.Paths.get(tmpFile)
    val magic = new Array[Byte](4)
    val mIn = java.nio.file.Files.newInputStream(src)
    val mRead = try mIn.read(magic) finally mIn.close()
    // pcapng uploads are transcoded to classic pcap at copy time (the
    // reference accepts pcapng via libpcap but its store is always
    // classic records) — stored packetPos/packetLen then seek correctly
    // into the durable copy for hunts/export. Both paths STREAM with a
    // bounded buffer: a posted capture is routinely multi-GB (the
    // reference rotates at 12G) and a whole-file read caps at the 2 GiB
    // JVM array limit, doubling memory well before that.
    if (mRead == 4 && graft.etl.Pcap.isPcapng(magic)) {
      val in = new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(src), 1 << 20)
      val out = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(destPath), 1 << 20)
      val res =
        try {
          out.write(new Array[Byte](24)) // header backpatched below
          try graft.etl.Pcap.pcapngToPcapStream(in, out)
          finally out.close()
        } finally in.close()
      res match {
        case Some((lt, snap)) =>
          val raf = new java.io.RandomAccessFile(dest, "rw")
          try {
            raf.seek(0)
            raf.write(graft.etl.Pcap.classicHeader(lt, snap))
          } finally raf.close()
        case None =>
          java.nio.file.Files.deleteIfExists(destPath)
          throw new IllegalArgumentException(
            s"unreadable pcapng upload $tmpFile")
      }
    } else
      java.nio.file.Files.copy(src, destPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val cleanTags = sanitizeTags(tags)
    import spark.implicits._
    SessionBuilder.sessionize(spark, dest, node = node)
      .map(s => if (cleanTags.isEmpty) s
        else s.copy(tags = (s.tags ++ cleanTags).distinct))
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
    val base0 = java.nio.file.Paths.get(tmpFile).getFileName.toString
    val base = if (base0.endsWith(".pcap")) base0 else s"$base0.pcap"
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(tmpFile))
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    val h = md.digest().take(4).map("%02x".format(_)).mkString
    java.nio.file.Paths.get(pcapDir, s"$node-$h-$base").toString
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
