package graft.etl

import java.nio.charset.StandardCharsets

/** Small text/binary protocol extractors: IRC, PostgreSQL, MySQL.
  * Reference parsers: capture/parsers/{irc,postgresql,mysql}.c.
  */
object MiscParsers {

  final case class IrcInfo(nick: Seq[String], channel: Seq[String])

  /** IRC classification (parsers/irc.c:95-138): needles `:`,
    * `NOTICE AUTH`, `NICK `, `USER `, `CAP REQ ` over either direction,
    * 8-byte floor, then two callback guards — a `:`-led server line must
    * carry ` NOTICE ` somewhere, and a `USER ` command must come with a
    * `\nNICK ` or ` +iw ` so plain FTP logins don't classify.
    */
  def isIrc(src: Array[Byte]): Boolean = {
    if (src.length < 8) return false
    val head = new String(src, 0, math.min(src.length, 512),
      StandardCharsets.ISO_8859_1)
    val needle = head.charAt(0) == ':' || head.startsWith("NOTICE AUTH") ||
      head.startsWith("NICK ") || head.startsWith("USER ") ||
      head.startsWith("CAP REQ ")
    if (!needle) return false
    if (head.charAt(0) == ':' && !head.contains(" NOTICE ")) return false
    if (head.charAt(0) == 'U' && !head.contains("\nNICK ") &&
      !head.contains(" +iw ")) return false
    true
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
    // any 3.x protocol minor is accepted (postgresql.c:52 version>>16==3);
    // a declared length under 16 or past the received bytes rejects
    // (postgresql.c:47 plen > len || plen < 16)
    if (len < 16 || len > src.length - off ||
      (u32(src, off + 4) >> 16) != 3L) return None
    val end = (off + len).toInt
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
    // client login: 4-byte packet header (seq 1) + 4+4+1+23 fixed bytes.
    // CLIENT_SSL (0x0800) in the capability flags means this is an
    // SSLRequest — the real login (and username) is inside TLS, so no
    // user is recorded (mysql-tls golden has version only)
    val user =
      if (srcStream.length > 36 && (srcStream(3) & 0xff) == 1 &&
          (((srcStream(4) & 0xff) | ((srcStream(5) & 0xff) << 8)) & 0x0800) == 0) {
        val start = 4 + 4 + 4 + 1 + 23
        val end = srcStream.indexWhere(_ == 0, start)
        if (end > start)
          Some(new String(srcStream, start, end - start, StandardCharsets.ISO_8859_1))
        else None
      } else None
    Some(MysqlInfo(version.getOrElse(""), user.getOrElse("")))
  }

  /** MySQL classification (parsers/mysql.c:30-117): the tag lands only
    * after BOTH sides pass — the server greeting matches the literal
    * needle `\x00\x00\x00\x0a` at offset 1 (so greetings over 255 bytes
    * never classify) and carries a non-empty printable NUL-terminated
    * version from 5; then the CLIENT packet must be a plausible login /
    * SSLRequest (packet length >= 35 or == 8, seq <= 2, a printable run
    * from 36 inside the declared packet). A greeting alone is not mysql.
    */
  def isMysql(srcStream: Array[Byte], dstStream: Array[Byte]): Boolean = {
    def printableTo(a: Array[Byte], from: Int, end: Int): Int = {
      // index of the first NUL in [from,end), or -1 when a non-printable
      // byte appears first / no NUL before end
      var i = from
      while (i < end) {
        if (a(i) == 0) return i
        val c = a(i) & 0xff
        if (c < 0x20 || c > 0x7e) return -1
        i += 1
      }
      -1
    }
    val d = dstStream
    val greeting = d.length >= 6 && d(1) == 0 && d(2) == 0 && d(3) == 0 &&
      (d(4) & 0xff) == 0x0a && printableTo(d, 5, d.length) > 5
    if (!greeting) return false
    val s = srcStream
    if (s.length < 8 || s(1) != 0 || s(2) != 0 || (s(3) & 0xff) > 2)
      return false
    val pktEnd = math.min(s.length, 4 + (s(0) & 0xff))
    if (pktEnd < 35 && pktEnd != 8) return false
    // printable run from 36 up to the first NUL or the packet end; a
    // non-printable byte inside the window rejects (mysql.c:48-57)
    var i = 36
    var ok = true
    while (ok && i < pktEnd && s(i) != 0) {
      val c = s(i) & 0xff
      if (c < 0x20 || c > 0x7e) ok = false
      i += 1
    }
    ok
  }

  /** BGP message types from marker-framed messages in both streams
    * (reference parsers/bgp.c: 16x 0xff marker, u16 length, type byte).
    */
  def parseBgpTypes(streams: Seq[Array[Byte]]): Seq[String] = {
    val names = Map(1 -> "OPEN", 2 -> "UPDATE", 3 -> "NOTIFICATION",
      4 -> "KEEPALIVE")
    val out = Seq.newBuilder[String]
    streams.foreach { st =>
      var p = 0
      var ok = true
      while (ok && p + 19 <= st.length) {
        var i = 0
        while (i < 16 && st(p + i) == -1) i += 1
        if (i < 16) ok = false
        else {
          val len = ((st(p + 16) & 0xff) << 8) | (st(p + 17) & 0xff)
          names.get(st(p + 18) & 0xff).foreach(out += _)
          if (len < 19) ok = false else p += len
        }
      }
    }
    out.result().distinct
  }

  /** `USER xxx` command (ftp/pop3) at stream start → lowercased user
    * (reference parsers/misc.c user_classify, with its IRC guards).
    */
  def parseUserCommand(stream: Array[Byte]): Option[String] = {
    if (stream.length <= 5 ||
      new String(stream.take(5), StandardCharsets.ISO_8859_1) != "USER ")
      return None
    val window = new String(stream.take(512), StandardCharsets.ISO_8859_1)
    if (window.contains("\nNICK ") || window.contains(" +iw ")) return None
    var i = 5
    while (i < stream.length && !Character.isWhitespace(stream(i).toChar)) i += 1
    if (i == 5) None
    else Some(new String(stream, 5, i - 5, StandardCharsets.ISO_8859_1).toLowerCase)
  }

  /** RDP negotiation: TPKT 03 00 + X.224 CR (0xe0); mstshash cookie →
    * user (reference misc.c rdp_classify).
    */
  def isRdp(stream: Array[Byte]): Boolean =
    stream.length > 5 && stream(0) == 3 && stream(1) == 0 &&
      (stream(3) & 0xff) <= stream.length && (stream(4) & 0xff) == (stream(3) & 0xff) - 5 &&
      (stream(5) & 0xff) == 0xe0

  def parseRdpUser(stream: Array[Byte]): Option[String] = {
    if (!isRdp(stream) || stream.length <= 30) return None
    val s = new String(stream.take(512), StandardCharsets.ISO_8859_1)
    if (!s.startsWith("Cookie: mstshash=", 11)) return None
    val end = s.indexOf("\r\n", 28)
    if (end < 0) None else Some(s.substring(28, end).toLowerCase)
  }

  final case class OracleInfo(user: String, host: String, service: String)

  /** Oracle TNS connect: header length fields frame a connect string with
    * (HOST=..)(USER=..)(SERVICE_NAME=..) items, lowercased (reference
    * parsers/oracle.c; first client data packet only).
    */
  def parseOracle(first: Array[Byte]): Option[OracleInfo] = {
    val len = first.length
    if (len <= 27 || len != (((first(0) & 0xff) << 8) | (first(1) & 0xff)) ||
      (first(25) & 0xff) + (first(27) & 0xff) != len) return None
    val start = first(27) & 0xff
    val window = new String(first, start, math.min(first(25) & 0xff, len - start),
      StandardCharsets.ISO_8859_1)
    def item(needle: String): String = {
      val i = window.indexOf(needle)
      if (i < 0) return null
      val j = window.indexOf(')', i)
      if (j < 0 || j == i + needle.length) return null
      window.substring(i + needle.length, j).toLowerCase
    }
    Some(OracleInfo(item("USER="), item("HOST="), item("SERVICE_NAME=")))
  }

  def isOracle(first: Array[Byte]): Boolean =
    first.length >= 8 && first(2) == 0 && first(3) == 0 && first(4) == 1 &&
      first(5) == 0 && first(6) == 0 && first(7) == 0 && parseOracle(first).isDefined

  /** Sybase/MSSQL TDS 5 login: user at offset 39, length byte at 69
    * (reference parsers/tds.c; client stream only, lowercased).
    */
  def isTds(stream: Array[Byte]): Boolean =
    stream.length >= 512 &&
      stream.take(8).sameElements(Array[Byte](2, 0, 2, 0, 0, 0, 1, 0))

  def parseTdsUser(stream: Array[Byte]): Option[String] = {
    if (!isTds(stream) || stream.length <= 598) return None
    val ulen = stream(69) & 0xff
    if (39 + ulen > stream.length) return None
    Some(new String(stream, 39, ulen, StandardCharsets.ISO_8859_1)
      .takeWhile(_ != 0).toLowerCase)
  }
}
