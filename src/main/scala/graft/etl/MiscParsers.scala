package graft.etl

import java.nio.charset.StandardCharsets

/** Small text/binary protocol extractors: IRC, PostgreSQL, MySQL.
  * Reference parsers: capture/parsers/{irc,postgresql,mysql}.c.
  */
object MiscParsers {

  final case class IrcInfo(nick: Seq[String], channel: Seq[String])

  def isIrc(src: Array[Byte]): Boolean = {
    val head = new String(src.take(512), StandardCharsets.ISO_8859_1)
    head.split("\r?\n").exists(l =>
      l.startsWith("NICK ") || l.startsWith("USER ") || l.startsWith("CAP "))
  }

  def parseIrc(src: Array[Byte]): Option[IrcInfo] = {
    val lines = new String(src, StandardCharsets.ISO_8859_1).split("\r?\n")
    val nicks = lines.collect { case l if l.startsWith("NICK ") =>
      l.substring(5).trim }
    val chans = lines.collect { case l if l.startsWith("JOIN ") =>
      l.substring(5).trim.split("[ ,]")(0) }.filter(_.startsWith("#"))
    if (nicks.isEmpty && chans.isEmpty) None
    else Some(IrcInfo(nicks.distinct.toSeq, chans.distinct.toSeq))
  }

  final case class PostgresInfo(user: String, db: String, app: String)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** PostgreSQL StartupMessage: int32 length, int32 protocol (3.0 =
    * 0x00030000), then "key\0value\0"... (an SSLRequest 80877103 may
    * precede it; the plaintext retry follows in the same stream).
    */
  def parsePostgres(src: Array[Byte]): Option[PostgresInfo] = {
    var off = 0
    // skip SSLRequest if present (length 8, code 80877103)
    if (src.length >= 8 && u32(src, 0) == 8 && u32(src, 4) == 80877103L) off = 8
    if (src.length < off + 8) return None
    val len = u32(src, off)
    if (len < 8 || len > 10000 || u32(src, off + 4) != 0x00030000L) return None
    val end = math.min(off + len, src.length.toLong).toInt
    var p = off + 8
    val kv = scala.collection.mutable.Map[String, String]()
    while (p < end && src(p) != 0) {
      val kEnd = src.indexWhere(_ == 0, p)
      if (kEnd < 0 || kEnd >= end) return None
      val vEnd = src.indexWhere(_ == 0, kEnd + 1)
      if (vEnd < 0 || vEnd > end) return None
      kv += new String(src, p, kEnd - p, StandardCharsets.UTF_8) ->
        new String(src, kEnd + 1, vEnd - kEnd - 1, StandardCharsets.UTF_8)
      p = vEnd + 1
    }
    if (!kv.contains("user")) None
    else Some(PostgresInfo(kv.getOrElse("user", ""),
      kv.getOrElse("database", ""), kv.getOrElse("application_name", "")))
  }

  def isPostgres(src: Array[Byte]): Boolean = parsePostgres(src).isDefined ||
    (src.length >= 8 && u32(src, 0) == 8 && u32(src, 4) == 80877103L)

  final case class MysqlInfo(version: String, user: String)

  /** MySQL: server greeting packet (seq 0, protocol 0x0a, NUL-terminated
    * version); client login packet (seq 1) carries the username after a
    * 32-byte fixed header.
    */
  def parseMysql(srcStream: Array[Byte], dstStream: Array[Byte]): Option[MysqlInfo] = {
    // server greeting
    val version =
      if (dstStream.length >= 6 && (dstStream(3) & 0xff) == 0 &&
          (dstStream(4) & 0xff) == 0x0a) {
        val end = dstStream.indexWhere(_ == 0, 5)
        if (end > 5) Some(new String(dstStream, 5, end - 5, StandardCharsets.ISO_8859_1))
        else None
      } else None
    if (version.isEmpty) return None
    // client login: 4-byte packet header (seq 1) + 4+4+1+23 fixed bytes
    val user =
      if (srcStream.length > 36 && (srcStream(3) & 0xff) == 1) {
        val start = 4 + 4 + 4 + 1 + 23
        val end = srcStream.indexWhere(_ == 0, start)
        if (end > start)
          Some(new String(srcStream, start, end - start, StandardCharsets.ISO_8859_1))
        else None
      } else None
    Some(MysqlInfo(version.getOrElse(""), user.getOrElse("")))
  }

  def isMysql(dstStream: Array[Byte]): Boolean =
    dstStream.length >= 6 && (dstStream(3) & 0xff) == 0 &&
      (dstStream(4) & 0xff) == 0x0a &&
      (((dstStream(0) & 0xff) | ((dstStream(1) & 0xff) << 8) |
        ((dstStream(2) & 0xff) << 16)) < 1000)
}
