package graft.etl

import java.nio.charset.StandardCharsets

/** Application-protocol classification + minimal metadata extractors.
  *
  * Classification mirrors the reference's first-bytes/port classifier
  * registry (capture/parsers.c:959-1104): each classifier looks at the
  * first payload bytes of either direction once available.
  *
  * Extractors parse the per-direction reassembled byte streams (see
  * [[SessionBuilder.reassemble]]) — round 1 covers HTTP and DNS; the
  * remaining parsers under capture/parsers/ slot into the same seam.
  */
object AppProtocols {

  final case class HttpInfo(
      method: Seq[String], uri: Seq[String], host: Seq[String], path: Seq[String],
      statuscode: Seq[Int], useragent: Seq[String],
      clientVersion: Seq[String], serverVersion: Seq[String])

  final case class DnsInfo(
      qname: Seq[String], qtype: Seq[String], rcode: Seq[String])

  final case class SocksInfo(ip: String, port: Int, user: String)

  /** Detect and strip a SOCKS4/5 handshake from the two streams, returning
    * the tunneled inner streams plus the destination the client asked for
    * (reference parser: capture/parsers/socks.c). Returns None if the
    * streams don't start with a SOCKS handshake.
    */
  def peelSocks(src: Array[Byte], dst: Array[Byte]): Option[(Array[Byte], Array[Byte], SocksInfo)] = {
    if (src.length >= 9 && src(0) == 4 && (src(1) == 1 || src(1) == 2)) {
      // SOCKS4: VER CMD PORT(2) IP(4) USERID\0 ; reply: 8 bytes
      val port = ((src(2) & 0xff) << 8) | (src(3) & 0xff)
      val ip = s"${src(4) & 0xff}.${src(5) & 0xff}.${src(6) & 0xff}.${src(7) & 0xff}"
      var i = 8
      while (i < src.length && src(i) != 0) i += 1
      val user = new String(src, 8, i - 8, StandardCharsets.ISO_8859_1)
      // SOCKS4a: ip 0.0.0.x (x≠0) means a null-terminated domain follows
      val is4a = src(4) == 0 && src(5) == 0 && src(6) == 0 && src(7) != 0
      var addr = ip
      var end = i + 1
      if (is4a) {
        var j = end
        while (j < src.length && src(j) != 0) j += 1
        addr = new String(src, end, j - end, StandardCharsets.ISO_8859_1)
        end = j + 1
      }
      val innerSrc = src.drop(end)
      val innerDst = if (dst.length >= 8) dst.drop(8) else Array.empty[Byte]
      Some((innerSrc, innerDst, SocksInfo(addr, port, user)))
    } else if (src.length >= 2 && src(0) == 5 && src(1) > 0 && src.length >= 2 + src(1)) {
      // SOCKS5: VER NMETHODS METHODS… then VER CMD RSV ATYP ADDR PORT
      val reqOff = 2 + src(1)
      if (src.length < reqOff + 4 || src(reqOff) != 5) return None
      val atyp = src(reqOff + 3) & 0xff
      val (addr, addrLen) = atyp match {
        case 1 if src.length >= reqOff + 8 => // IPv4
          (s"${src(reqOff + 4) & 0xff}.${src(reqOff + 5) & 0xff}.${src(reqOff + 6) & 0xff}.${src(reqOff + 7) & 0xff}", 4)
        case 3 if src.length > reqOff + 4 => // domain
          val l = src(reqOff + 4) & 0xff
          if (src.length < reqOff + 5 + l) return None
          (new String(src, reqOff + 5, l, StandardCharsets.ISO_8859_1), l + 1)
        case 4 if src.length >= reqOff + 20 =>
          (graft.functions.IpUtil.canonical(
            java.util.Arrays.copyOfRange(src, reqOff + 4, reqOff + 20)), 16)
        case _ => return None
      }
      val portOff = reqOff + 4 + addrLen
      if (src.length < portOff + 2) return None
      val port = ((src(portOff) & 0xff) << 8) | (src(portOff + 1) & 0xff)
      val innerSrc = src.drop(portOff + 2)
      // server: VER METHOD, then VER REP RSV ATYP BND… (assume v4 bind = 10 bytes)
      val innerDst =
        if (dst.length >= 2 + 10 && dst(0) == 5 && dst(2) == 5) dst.drop(2 + 10)
        else if (dst.length >= 2) dst.drop(2) else Array.empty[Byte]
      Some((innerSrc, innerDst, SocksInfo(addr, port, "")))
    } else None
  }

  private val httpMethods = Seq("GET ", "POST ", "HEAD ", "PUT ", "DELETE ",
    "OPTIONS ", "PATCH ", "CONNECT ", "TRACE ")

  /** Protocol tags from payloads/ports — returns a sorted distinct list
    * like the reference's `protocol` field.
    */
  def classify(
      ipProtocol: Int, srcPort: Int, dstPort: Int,
      srcStream: Array[Byte], dstStream: Array[Byte]): Seq[String] = {
    val tags = scala.collection.mutable.LinkedHashSet[String]()
    ipProtocol match {
      case 6  => tags += "tcp"
      case 17 => tags += "udp"
      case 1  => tags += "icmp"
      case 58 => tags += "icmp"
      case _  =>
    }
    def startsWithAny(b: Array[Byte], prefixes: Seq[String]): Boolean =
      prefixes.exists(p => b.length >= p.length &&
        new String(b, 0, p.length, StandardCharsets.ISO_8859_1) == p)
    val streams = Seq(srcStream, dstStream)
    if (streams.exists(s => startsWithAny(s, httpMethods) ||
        startsWithAny(s, Seq("HTTP/")))) tags += "http"
    // SOCKS4: ver=4 cmd=1/2; SOCKS5: ver=5 nmethods>0 (parsers/socks.c)
    streams.headOption.foreach { s =>
      if (s.length >= 2 && s(0) == 4 && (s(1) == 1 || s(1) == 2)) tags += "socks"
      if (s.length >= 2 && s(0) == 5 && s(1) > 0 && s.length >= 2 + s(1)) tags += "socks"
    }
    if (ipProtocol == 17 && (srcPort == 53 || dstPort == 53)) tags += "dns"
    if (ipProtocol == 6 && (srcPort == 53 || dstPort == 53)) tags += "dns"
    if (ipProtocol == 17 && Seq(srcPort, dstPort).exists(p => p == 67 || p == 68))
      tags += "dhcp"
    if (streams.exists(s => startsWithAny(s, Seq("SSH-")))) tags += "ssh"
    if (SmtpParser.isSmtp(srcStream, dstStream)) tags += "smtp"
    if (ipProtocol == 6 && MiscParsers.isIrc(srcStream)) tags += "irc"
    if (ipProtocol == 6 && MiscParsers.isPostgres(srcStream)) tags += "postgresql"
    if (ipProtocol == 6 && MiscParsers.isMysql(dstStream)) tags += "mysql"
    if (streams.exists(s => s.length >= 3 && (s(0) & 0xff) == 0x16 &&
        (s(1) & 0xff) == 0x03)) tags += "tls"
    // SMB: NetBIOS frame then 0xff/0xfe 'SMB' (parsers/smb.c:582-595)
    if (ipProtocol == 6 && streams.exists(SmbParser.isSmb)) tags += "smb"
    // LDAP: BER SEQUENCE { messageID INTEGER, protocolOp [0..25] }
    // (parsers/ldap.c:147-178; TCP and UDP — CLDAP)
    if ((ipProtocol == 6 || ipProtocol == 17) &&
      streams.exists(LdapParser.isLdap)) tags += "ldap"
    tags.toSeq.sorted
  }

  /** Parse HTTP requests from the client stream and statuses from the
    * server stream (reference parser: capture/parsers/http.c).
    */
  def parseHttp(clientStream: Array[Byte], serverStream: Array[Byte]): Option[HttpInfo] = {
    val req = new String(clientStream, StandardCharsets.ISO_8859_1)
    val resp = new String(serverStream, StandardCharsets.ISO_8859_1)
    val reqLine = "(?m)^(GET|POST|HEAD|PUT|DELETE|OPTIONS|PATCH|CONNECT|TRACE) ([^ \r\n]+) HTTP/(\\d\\.\\d)\r?$".r
    val statusLine = "(?m)^HTTP/(\\d\\.\\d) (\\d{3})".r
    val hostHdr = "(?mi)^Host: *([^\r\n]+)\r?$".r
    val uaHdr = "(?mi)^User-Agent: *([^\r\n]+)\r?$".r
    val reqs = reqLine.findAllMatchIn(req).toSeq
    val resps = statusLine.findAllMatchIn(resp).toSeq
    if (reqs.isEmpty && resps.isEmpty) return None
    def distinctKeepOrder[T](xs: Seq[T]): Seq[T] = xs.distinct
    Some(HttpInfo(
      method = distinctKeepOrder(reqs.map(_.group(1))),
      uri = distinctKeepOrder(reqs.map(_.group(2))),
      host = distinctKeepOrder(hostHdr.findAllMatchIn(req).map(_.group(1).trim).toSeq),
      path = distinctKeepOrder(reqs.map(m => m.group(2).takeWhile(_ != '?'))),
      statuscode = distinctKeepOrder(resps.map(_.group(2).toInt)),
      useragent = distinctKeepOrder(uaHdr.findAllMatchIn(req).map(_.group(1).trim).toSeq),
      clientVersion = distinctKeepOrder(reqs.map(_.group(3))),
      serverVersion = distinctKeepOrder(resps.map(_.group(1)))))
  }

  /** Parse DNS query names/types from raw DNS messages (UDP payloads).
    * (reference parser: capture/parsers/dns.c)
    */
  def parseDnsMessage(msg: Array[Byte]): Option[DnsInfo] = {
    if (msg.length < 12) return None
    val qdCount = ((msg(4) & 0xff) << 8) | (msg(5) & 0xff)
    val rcode = msg(3) & 0x0f
    val isResponse = (msg(2) & 0x80) != 0
    var off = 12
    val names = Seq.newBuilder[String]
    val types = Seq.newBuilder[String]
    var q = 0
    while (q < qdCount && off < msg.length) {
      val sb = new StringBuilder
      var len = msg(off) & 0xff
      while (len > 0 && off + len + 1 <= msg.length) {
        if (sb.nonEmpty) sb.append('.')
        sb.append(new String(msg, off + 1, len, StandardCharsets.ISO_8859_1))
        off += len + 1
        len = if (off < msg.length) msg(off) & 0xff else 0
      }
      off += 1 // root label
      if (off + 4 <= msg.length) {
        val qtype = ((msg(off) & 0xff) << 8) | (msg(off + 1) & 0xff)
        types += dnsTypeName(qtype)
        off += 4
      }
      names += sb.toString.toLowerCase
      q += 1
    }
    Some(DnsInfo(names.result(), types.result(),
      if (isResponse) Seq(dnsRcodeName(rcode)) else Seq.empty))
  }

  def dnsTypeName(t: Int): String = t match {
    case 1 => "A"; case 2 => "NS"; case 5 => "CNAME"; case 6 => "SOA"
    case 12 => "PTR"; case 15 => "MX"; case 16 => "TXT"; case 28 => "AAAA"
    case 33 => "SRV"; case 255 => "ANY"; case other => other.toString
  }

  def dnsRcodeName(rc: Int): String = rc match {
    case 0 => "NOERROR"; case 1 => "FORMERR"; case 2 => "SERVFAIL"
    case 3 => "NXDOMAIN"; case 4 => "NOTIMP"; case 5 => "REFUSED"
    case other => other.toString
  }
}
