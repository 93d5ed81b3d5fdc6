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

  final case class DnsInfo(
      qname: Seq[String], qtype: Seq[String], rcode: Seq[String],
      opcode: Seq[String] = Nil, qclass: Seq[String] = Nil,
      ip: Seq[String] = Nil, mailserverHost: Seq[String] = Nil,
      nameserverHost: Seq[String] = Nil, nameserverIp: Seq[String] = Nil,
      mailserverIp: Seq[String] = Nil,
      // dns.puny: every dns_add_host'd name containing "xn--", lowered
      // (parsers/dns.c:160-166)
      puny: Seq[String] = Nil)

  /** Destination the client asked for: exactly one of `ip` (connect-by
    * address, SOCKS4 / v5 atyp 1+4) or `host` (connect-by-name, SOCKS4a /
    * v5 atyp 3 — kept raw, even when it looks like a dotted literal,
    * as socks.c stores it) is set.
    */
  final case class SocksInfo(ip: String, host: String, port: Int, user: String,
      // SOCKS5 username/password sub-negotiation used (socks.c:142 tag)
      password: Boolean = false)

  /** Detect and strip a SOCKS4/5 handshake from the two streams, returning
    * the tunneled inner streams plus the destination the client asked for
    * (reference parser: capture/parsers/socks.c). Returns None if the
    * streams don't start with a SOCKS handshake.
    */
  /** SOCKS5 username/password sub-negotiation (RFC 1929) scan, usable
    * even when the CONNECT request never completes (socks-http-pass has
    * a session that authenticates but whose tunnel setup is cut short —
    * the reference still records socks.user and tags socks:password).
    */
  def socks5AuthUser(src: Array[Byte]): Option[String] = {
    if (src.length < 3 || src(0) != 5) return None
    val reqOff = 2 + (src(1) & 0xff)
    if (src.length <= reqOff + 2 || src(reqOff) != 1) return None
    val ulen = src(reqOff + 1) & 0xff
    if (ulen == 0 || src.length < reqOff + 2 + ulen + 1) return None
    val plen = src(reqOff + 2 + ulen) & 0xff
    if (src.length < reqOff + 3 + ulen + plen) return None
    Some(new String(src, reqOff + 2, ulen, StandardCharsets.ISO_8859_1))
  }

  def peelSocks(src: Array[Byte], dst: Array[Byte],
      allowSocks4: Boolean = true): Option[(Array[Byte], Array[Byte], SocksInfo)] = {
    // In the forward orientation the server side must answer like a
    // SOCKS server (reply version 0 for v4, 5 for v5) — without this,
    // protocols whose first byte happens to be 4/5 (TDS replies) would
    // mis-peel. Reverse-socks peels (allowSocks4=false) skip the guard:
    // the other side may carry a banner before its method choice.
    if (allowSocks4) {
      if (dst.nonEmpty && src.nonEmpty && src(0) == 4 && dst(0) != 0) return None
      if (dst.nonEmpty && src.nonEmpty && src(0) == 5 && dst(0) != 5) return None
    }
    if (allowSocks4 && src.length >= 9 && src(0) == 4 && (src(1) == 1 || src(1) == 2)) {
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
      Some((innerSrc, innerDst,
        SocksInfo(if (is4a) null else addr, if (is4a) addr else null,
          port, user)))
    } else if (src.length >= 2 && src(0) == 5 && src(1) > 0 && src.length >= 2 + src(1)) {
      // SOCKS5: VER NMETHODS METHODS… [username auth: 01 ulen user plen pass]
      // then VER CMD RSV ATYP ADDR PORT
      var reqOff = 2 + src(1)
      var user = ""
      var dstExtra = 0
      if (src.length > reqOff + 2 && src(reqOff) == 1 && src(reqOff + 1) > 0) {
        val ulen = src(reqOff + 1) & 0xff
        if (src.length >= reqOff + 2 + ulen + 1) {
          val plen = src(reqOff + 2 + ulen) & 0xff
          if (src.length >= reqOff + 3 + ulen + plen &&
              src.length > reqOff + 3 + ulen + plen &&
              src(reqOff + 3 + ulen + plen) == 5) {
            user = new String(src, reqOff + 2, ulen, StandardCharsets.ISO_8859_1)
            reqOff += 3 + ulen + plen
            dstExtra = 2 // server auth status: 01 00
          }
        }
      }
      if (src.length < reqOff + 4 || src(reqOff) != 5) return None
      val atyp = src(reqOff + 3) & 0xff
      val byName = atyp == 3
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
      // server: [banner…] VER METHOD [auth status], then the reply
      // VER REP RSV ATYP BND.ADDR BND.PORT. Reverse-socks servers can
      // prefix a banner (socks5-reverse golden), so locate the reply by
      // shape in the stream head instead of assuming a fixed offset.
      val innerDst = {
        var j = -1
        var k = 0
        val lim = math.min(dst.length - 4, 64)
        while (j < 0 && k <= lim) {
          if (dst(k) == 5 && (dst(k + 1) & 0xff) <= 8 && dst(k + 2) == 0 &&
            (dst(k + 3) == 1 || dst(k + 3) == 3 || dst(k + 3) == 4)) j = k
          k += 1
        }
        if (j >= 0) {
          val alen = dst(j + 3) match {
            case 1 => 4
            case 3 => if (dst.length > j + 4) 1 + (dst(j + 4) & 0xff) else 1
            case _ => 16
          }
          if (dst.length >= j + 4 + alen + 2) dst.drop(j + 4 + alen + 2)
          else Array.empty[Byte]
        } else if (dst.length >= 2 + dstExtra) dst.drop(2 + dstExtra)
        else Array.empty[Byte]
      }
      Some((innerSrc, innerDst,
        SocksInfo(if (byName) null else addr, if (byName) addr else null,
          port, user, password = user.nonEmpty)))
    } else None
  }

  /** The reference registers every http_parser method as a BARE needle
    * (strlen, no trailing separator — "GETX…" classifies as http) plus
    * bare "HTTP" (parsers/http.c:1038-1042, thirdparty/http_parser.h:79
    * HTTP_METHOD_MAP: the 8 RFC methods + webdav/subversion/upnp/
    * RFC-5789 extensions).
    */
  private val httpMethods =
    Seq("DELETE", "GET", "HEAD", "POST", "PUT", "CONNECT", "OPTIONS",
      "TRACE", "COPY", "LOCK", "MKCOL", "MOVE", "PROPFIND", "PROPPATCH",
      "SEARCH", "UNLOCK", "REPORT", "MKACTIVITY", "CHECKOUT", "MERGE",
      "M-SEARCH", "NOTIFY", "SUBSCRIBE", "UNSUBSCRIBE", "PATCH", "PURGE")

  /** Protocol tags from payloads/ports — returns a sorted distinct list
    * like the reference's `protocol` field.
    */
  def classify(
      ipProtocol: Int, srcPort: Int, dstPort: Int,
      srcStream: Array[Byte], dstStream: Array[Byte],
      srcFirst: Array[Byte] = Array.emptyByteArray,
      dstFirst: Array[Byte] = Array.emptyByteArray,
      isV6: Boolean = false): Seq[String] = {
    val tags = scala.collection.mutable.LinkedHashSet[String]()
    ipProtocol match {
      case 6   => tags += "tcp"
      case 17  => tags += "udp"
      case 1   => tags += "icmp"
      case 58  => tags += "icmp"
      case 2   => tags += "igmp"
      case 50  => tags += "esp"
      case 89  => tags += "ospf"
      case 103 => tags += "pim"
      case 132 => tags += "sctp"
      case _   =>
    }
    // direct byte compare (prefixes are ASCII): the old per-prefix
    // `new String(b, 0, len)` allocated up to 27 short strings per
    // stream per session just for the HTTP method check
    def startsWithAny(b: Array[Byte], prefixes: Seq[String]): Boolean =
      prefixes.exists { p =>
        b.length >= p.length && {
          var i = 0
          var ok = true
          while (ok && i < p.length) {
            if (b(i) != p.charAt(i).toByte) ok = false
            i += 1
          }
          ok
        }
      }
    val streams = Seq(srcStream, dstStream)
    // first packet per direction when the caller has them, else the
    // stream prefix — the unit several per-packet reference classifiers
    // are defined over
    val firsts = Seq(
      if (srcFirst.nonEmpty) srcFirst else srcStream,
      if (dstFirst.nonEmpty) dstFirst else dstStream)
    // TCP only: the reference registers the method/"HTTP" needles via
    // classifier_register_tcp exclusively (http.c:1038-1042) — a UDP
    // payload that happens to start with NOTIFY/M-SEARCH is not http
    if (ipProtocol == 6 &&
      streams.exists(s => startsWithAny(s, httpMethods) ||
        startsWithAny(s, Seq("HTTP")))) tags += "http"
    // SOCKS: tag when the handshake PROGRESSES past method negotiation
    // (full peel, or a username-auth/request message follows) — a bare
    // aborted method offer stays plain tcp, like the reference's
    // state-machine tagging (parsers/socks.c)
    if (ipProtocol == 6) {
      def progressed(cli: Array[Byte]): Boolean =
        cli.length >= 2 && cli(0) == 5 && cli(1) > 0 && {
          val n = 2 + cli(1)
          cli.length > n && (cli(n) == 1 || cli(n) == 5)
        }
      if (peelSocks(srcStream, dstStream).isDefined ||
        peelSocks(dstStream, srcStream, allowSocks4 = false).isDefined ||
        (progressed(srcStream) && (dstStream.isEmpty || dstStream(0) == 5)))
        tags += "socks"
    }
    // dns over tcp: DST port 53 alone tags (dns.c:498-504 — the tcp
    // classify adds the protocol before any parse; src-side 53 with an
    // ephemeral dst is not registered)
    if (ipProtocol == 6 && dstPort == 53) tags += "dns"
    // dns over udp tags only when a datagram passes the parser's header
    // gate (dns.c:211-245: 17-byte floor, opcode <= 5, 1..10 questions) —
    // never on port alone
    if (ipProtocol == 17 && (srcPort == 53 || dstPort == 53) &&
      firsts.exists(dnsHeaderOk))
      tags += "dns"
    // port-based DNS variants; suppressed when port 53 is one endpoint
    // (parsers/dns.c:509,688-690), same header gate as dns
    if (ipProtocol == 17 && srcPort != 53 && dstPort != 53 &&
      firsts.exists(dnsHeaderOk)) {
      if (srcPort == 5353 || dstPort == 5353) tags += "mdns"
      if (srcPort == 5355 || dstPort == 5355) tags += "llmnr"
    }
    // dhcp: port 67 on either side (the reference registers only 67, not
    // 68), v4 only, a full 256+-byte BOOTP request/reply with the magic
    // cookie at 236 (parsers/dhcp.c:134-142,187)
    if (ipProtocol == 17 && !isV6 && (srcPort == 67 || dstPort == 67) &&
      firsts.exists(f => f.length >= 256 && (f(0) == 1 || f(0) == 2) &&
          (f(236) & 0xff) == 0x63 && (f(237) & 0xff) == 0x82 &&
          (f(238) & 0xff) == 0x53 && (f(239) & 0xff) == 0x63))
      tags += "dhcp"
    // bare "SSH" needle, unconditional callback (ssh.c:213-223,251)
    if (ipProtocol == 6 &&
      streams.exists(s => startsWithAny(s, Seq("SSH")))) tags += "ssh"
    if (SmtpParser.isSmtp(srcStream, dstStream)) tags += "smtp"
    // either direction: the irc needles include server-side banners
    // (":server NOTICE ...", "NOTICE AUTH", irc.c:134-138)
    if (ipProtocol == 6 && streams.exists(MiscParsers.isIrc)) tags += "irc"
    if (ipProtocol == 6 && MiscParsers.isPostgres(srcStream)) tags += "postgresql"
    if (ipProtocol == 6 && MiscParsers.isMysql(srcStream, dstStream))
      tags += "mysql"
    // tls: needle \x16\x03 then version minor <= 3 and a CLIENT/SERVER
    // HELLO handshake type at 5 — a stream opening on any other record
    // (mid-capture certificate, alert) does not classify (tls.c:749-763)
    if (streams.exists(s => s.length >= 6 && (s(0) & 0xff) == 0x16 &&
        (s(1) & 0xff) == 0x03 && (s(2) & 0xff) <= 3 &&
        (s(5) == 1 || s(5) == 2))) tags += "tls"
    // SMB: NetBIOS frame then 0xff/0xfe 'SMB' (parsers/smb.c:582-595)
    if (ipProtocol == 6 && streams.exists(SmbParser.isSmb)) tags += "smb"
    // LDAP: BER SEQUENCE { messageID INTEGER, protocolOp [0..25] }
    // (parsers/ldap.c:147-178; TCP and UDP — CLDAP)
    if ((ipProtocol == 6 || ipProtocol == 17) &&
      streams.exists(LdapParser.isLdap)) tags += "ldap"

    // --- misc first-bytes classifiers (parsers/misc.c:380-450) ---------
    def win(b: Array[Byte], n: Int = 512): String =
      new String(b, 0, math.min(n, b.length), StandardCharsets.ISO_8859_1)
    def u(b: Array[Byte], i: Int): Int = b(i) & 0xff
    // tacacs: first-bytes (c0|c1).(01|02|03).(01|02) AND port 49 on either
    // side, both transports (parsers/misc.c:185-189,470-476)
    if ((ipProtocol == 6 || ipProtocol == 17) &&
      (srcPort == 49 || dstPort == 49) &&
      firsts.exists { f =>
        f.length >= 3 && {
          val k = (u(f, 0) << 16) | (u(f, 1) << 8) | u(f, 2)
          k == 0xc00101 || k == 0xc00102 || k == 0xc00201 ||
          k == 0xc00301 || k == 0xc00302 || k == 0xc10101 || k == 0xc10102
        }
      }) tags += "tacacs"
    if (ipProtocol == 6) {
      if (streams.exists(st => (st.length >= 20 && u(st, 0) == 0x13 &&
        win(st, 20).substring(1) == "BitTorrent protocol") ||
        (st.length >= 6 && win(st, 5) == "BSYNC" && st(5) == 0)))
        tags += "bittorrent"
      if (streams.exists(MiscParsers.isRdp)) tags += "rdp"
      if (streams.exists(st => startsWithAny(st, Seq("* OK ")) &&
        win(st).contains("IMAP"))) tags += "imap"
      if (streams.exists(st => startsWithAny(st, Seq("+OK ")))) tags += "pop3"
      // the reference classifies each direction's first data independently
      // (misc.c other220_classify runs per matching packet), so BOTH "220 "
      // banners are inspected, not just the first
      streams.filter(st => startsWithAny(st, Seq("220 "))).foreach { st =>
        val w = win(st)
        if (w.contains("LMTP")) tags += "lmtp"
        else if (!w.contains("SMTP") && !w.contains(" TLS")) tags += "ftp"
      }
      if (streams.exists(st => startsWithAny(st, Seq("RFB 0")) &&
        st.length >= 12 && st(7) == '.' && u(st, 11) == 0x0a)) tags += "vnc"
      if (streams.exists(st => startsWithAny(st, Seq("<?xml")) &&
        win(st).contains("jabber"))) tags += "jabber"
      if (streams.exists(st => startsWithAny(st, Seq("+PONG", "-NOAUTH ")) ||
        (st.length >= 5 && st(0) == '*' && st(1) >= '1' && st(1) <= '5' &&
          st(2) == '\r' && st(3) == '\n' && st(4) == '$'))) tags += "redis"
      // needle at offset 8, matchlen 8 -> dispatch gate remaining >= 16
      // exactly (parsers.c:1084), not 17
      if (streams.exists(st => st.length >= 16 &&
        ((st(8) == 0 && st(9) == 0 && st(10) == 0 && st(11) == 0) ||
          (st(8) == -1 && st(9) == -1 && st(10) == -1 && st(11) == -1)) &&
        u(st, 12) == 0xd4 && st(13) == 7 && st(14) == 0 && st(15) == 0))
        tags += "mongo"
      // aerospike: 02 01 00x5 (4e|23) 'node' (misc.c:420-421)
      if (streams.exists(st => st.length >= 12 && st(0) == 2 && st(1) == 1 &&
        st(2) == 0 && st(3) == 0 && st(4) == 0 && st(5) == 0 && st(6) == 0 &&
        (u(st, 7) == 0x4e || u(st, 7) == 0x23) &&
        win(st, 12).substring(8) == "node")) tags += "aerospike"
      // thrift: 80 01 00 01 00 00 00 prefix, or framed 00 00 len + 80 01 00
      if (streams.exists(st => (st.length >= 7 && u(st, 0) == 0x80 &&
        st(1) == 1 && st(2) == 0 && st(3) == 1 && st(4) == 0 && st(5) == 0 &&
        st(6) == 0) ||
        (st.length > 20 && st(0) == 0 && st(1) == 0 && u(st, 4) == 0x80 &&
          st(5) == 1 && st(6) == 0))) tags += "thrift"
      // cassandra: framed thrift set_/desc calls — exact 16-byte needles
      // incl. the method-name length pairing (misc.c:424-425)
      if (streams.exists(st => startsWithAny(st, Seq(
        "\u0000\u0000\u0000\u0025\u0080\u0001\u0000\u0001" +
          "\u0000\u0000\u0000\u000cset_",
        "\u0000\u0000\u0000\u001d\u0080\u0001\u0000\u0001" +
          "\u0000\u0000\u0000\u0010desc")))) tags += "cassandra"
      if (dstPort == 23 && streams.exists(st => st.length >= 3 &&
        u(st, 0) == 0xff && u(st, 1) >= 0xfa)) tags += "telnet"
      // the \x00\x00 needle (the high half of the 32-bit frame length)
      // gates before the callback (misc.c:490 CLASSIFY_TCP kafka)
      if (firsts.exists(f => f.length >= 10 && f(0) == 0 && f(1) == 0 &&
        f(4) == 0 && u(f, 5) <= 6 &&
        f(7) == 0 && f.length == 4 + ((u(f, 2) << 8) | u(f, 3))))
        tags += "kafka"
      if (MiscParsers.isTds(srcStream)) tags += "tds"
      if (MiscParsers.isOracle(if (srcFirst.nonEmpty) srcFirst else srcStream))
        tags += "oracle"
      // the needle is the FULL 24-byte connection preface incl. the
      // "SM\r\n\r\n" tail (http2.c:493)
      if (startsWithAny(srcStream, Seq("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n")))
        tags += "http2"
      // --- remaining misc.c TCP first-bytes classifiers (misc.c:380-556)
      if (streams.exists(st => st.length >= 4 && u(st, 0) == 0xf9 &&
        u(st, 1) == 0xbe && u(st, 2) == 0xb4 &&
        (u(st, 3) == 0xd9 || u(st, 3) == 0xfe))) tags += "bitcoin"
      // gh0st: zlib header at 13 with frame-length sanity (misc.c:42-56)
      if (firsts.exists(f => f.length >= 15 && u(f, 13) == 0x78 &&
        ((f(8) == 0 && f(7) == 0 && ((u(f, 6) << 8 | u(f, 5)) == f.length)) ||
          (f(5) == 0 && f(6) == 0 && ((u(f, 7) << 8 | u(f, 8)) == f.length)) ||
          (f(7) == 0 && f(8) == 0 && f(11) == 0 && f(12) == 0 &&
            u(f, 14) == 0x9c)))) tags += "gh0st"
      // flap (OSCAR): '*' frames chained to payload end (misc.c:205-218)
      if (firsts.exists { f =>
        f.length >= 6 && u(f, 0) == 0x2a && f(1) == 1 && {
          val flen = 6 + ((u(f, 4) << 8) | u(f, 5))
          f.length == flen || (f.length > flen && u(f, flen) == '*')
        }
      }) tags += "flap"
      if (streams.exists(st => startsWithAny(st, Seq("NSClient", "None&"))))
        tags += "nsclient"
      if (streams.exists(st => startsWithAny(st, Seq("ZBXD\u0001"))))
        tags += "zabbix"
      if (streams.exists(st => startsWithAny(st, Seq("JRMI\u0000"))))
        tags += "rmi"
      if (streams.exists(st => startsWithAny(st, Seq("<policy-file-request/>"))))
        tags += "flash-policy"
      if (streams.exists(st => startsWithAny(st,
        Seq("\u00a4\u0000\u0000\u0000VT01")))) tags += "stream-ihscp"
      if (streams.exists(st => startsWithAny(st,
        Seq("CBKPPR\u0005P")))) tags += "honeywell-tcc"
      if (streams.exists(st => startsWithAny(st,
        Seq("\u001b%-12345", "@PJL ")))) tags += "pjl"
      if (streams.exists(st => startsWithAny(st,
        Seq("\u0005\u0000\u000b")))) tags += "dcerpc"
      if (streams.exists(st => startsWithAny(st,
        Seq("\u0000\u0000\u0000\u0008\u0000\u0001\u0000\u0003"))))
        tags += "nzsql"
      if (streams.exists(st => startsWithAny(st, Seq("--splunk-cooked-mode"))))
        tags += "splunk"
      // splunk-replication: pattern at stream offset 6 (misc.c:529)
      if (streams.exists(st => st.length >= 16 &&
        new String(st, 6, 10, StandardCharsets.ISO_8859_1) ==
          "\u0000\u0006\u0000\u0000\u0000\u0005_raw"))
        tags += "splunk-replication"
      if (streams.exists(st => startsWithAny(st,
        Seq("l\u0000\u000b\u0000")))) tags += "x11"
      if (streams.exists(st => startsWithAny(st,
        Seq("flush_all", "STORED\r\n", "END\r\n", "VALUE ")))) tags += "memcached"
      if (streams.exists(st => startsWithAny(st, Seq("HBas\u0000"))))
        tags += "hbase"
      if (streams.exists(st => startsWithAny(st, Seq("hrpc\u0009"))))
        tags += "hadoop"
      // hdfs: 00 1c 5x with protobuf marker 0x0a at 5 (misc.c:311-316)
      if (firsts.exists(f => f.length >= 10 && f(0) == 0 && u(f, 1) == 0x1c &&
        Seq(0x50, 0x51, 0x55).contains(u(f, 2)) && u(f, 5) == 0x0a))
        tags += "hdfs"
      if (streams.exists(st => startsWithAny(st, Seq("zk_version", "mntr\n",
        "\u0000\u0000\u0000\u002c\u0000\u0000\u0000\u0000",
        "\u0000\u0000\u0000\u002d\u0000\u0000\u0000\u0000"))))
        tags += "zookeeper"
      if (streams.exists(st => startsWithAny(st, Seq("ES\u0000\u0000"))))
        tags += "elasticsearch"
      if (streams.exists(st => startsWithAny(st, Seq("RTSP/1.0 "))))
        tags += "rtsp"
      // mqtt CONNECT: 0x10 + "MQ" in the protocol name (misc.c:262-267)
      if (firsts.exists(f => f.length >= 30 && u(f, 0) == 0x10 &&
        new String(f, 4, 2, StandardCharsets.ISO_8859_1) == "MQ")) tags += "mqtt"
      // sccp: dst port 2000, len byte + 7 zero bytes (misc.c:237-242)
      if (dstPort == 2000 && firsts.exists(f => f.length > 20 &&
        f.length >= u(f, 0) + 8 && (1 to 7).forall(f(_) == 0))) tags += "sccp"
      // wudo: dst port 7680 (misc.c:245-255)
      if (dstPort == 7680 && firsts.exists(f => f.length >= 15 &&
        ((0 to 3).forall(f(_) == 0) ||
          new String(f, 0, 15, StandardCharsets.ISO_8859_1) ==
            "\u000eSwarm protocol"))) tags += "wudo"
      // the tcp classify dispatcher refuses payloads under 2 bytes
      // before any port classifier runs (parsers.c:1114-1115)
      if (dstPort == 43 && streams.exists(_.length >= 2)) tags += "whois"
      // nfs over tcp: record mark + RPC call v2 prog 100003 (nfs.c:39 —
      // the needle carries the \x00\x01 program-number high bytes too)
      if (firsts.exists(f => f.length >= 20 && rpcCallAt(f, 8) &&
        f(16) == 0 && f(17) == 1 &&
        u(f, 18) == 0x86 && u(f, 19) == 0xa3)) tags += "nfs"
    }
    if (ipProtocol == 17) {
      if (streams.exists(st => startsWithAny(st, Seq("d1:a", "d1:r", "d1:q"))))
        tags += "bittorrent"
      if ((srcPort == 123 || dstPort == 123) && firsts.exists(f =>
        f.length >= 48 && u(f, 1) <= 16 &&
          Seq(0x13, 0x19, 0x1a, 0x1b, 0x1c, 0x21, 0x23, 0x24, 0xd9, 0xdb, 0xe3)
            .contains(u(f, 0)))) tags += "ntp"
      if (firsts.exists(isSnmp)) tags += "snmp"
      if (Seq(srcPort, dstPort).exists(pt => (pt >= 1812 && pt <= 1813) ||
        (pt >= 1645 && pt <= 1646)) && firsts.exists(f =>
        f.length >= 4 && f(0) >= 1 && f(0) <= 5 &&
          f.length == ((u(f, 2) << 8) | u(f, 3)))) tags += "radius"
      if (firsts.exists(isStun)) tags += "stun"
      // DTLS hello: 16 01 00 / 16 fe ff|fe|fd, len>=100, handshake
      // type 1 at offset 13 (parsers/dtls.c:314-327)
      if (firsts.exists(f => f.length >= 100 && u(f, 0) == 0x16 &&
        ((u(f, 1) == 0x01 && u(f, 2) == 0x00) ||
          (u(f, 1) == 0xfe && Seq(0xff, 0xfe, 0xfd).contains(u(f, 2)))) &&
        u(f, 13) == 1)) tags += "dtls"
      // --- remaining misc.c / rpc.c / nfs.c / dhcp.c UDP classifiers ----
      if (streams.exists(st => startsWithAny(st,
        Seq("M-SEARCH ", "NOTIFY * ")))) tags += "ssdp"
      if (streams.exists(st => startsWithAny(st, Seq("BJNP"))))
        tags += "bjnp"
      if (streams.exists(st => startsWithAny(st, Seq("VS01"))))
        tags += "steam-friends"
      if (streams.exists(st => startsWithAny(st,
        Seq("\u00ff\u00ff\u00ff\u00ffTSou")))) tags += "valve-a2s"
      // rip: first-bytes 01|02 01|02 00 00 on port 520 (misc.c:220-226)
      if ((srcPort == 520 || dstPort == 520) && firsts.exists(f =>
        f.length >= 4 && (f(0) == 1 || f(0) == 2) && (f(1) == 1 || f(1) == 2) &&
          f(2) == 0 && f(3) == 0)) tags += "rip"
      // netflow v5/7/9 header sanity (misc.c:343-364)
      if (srcPort != 53 && dstPort != 53 && firsts.exists { f =>
        f.length >= 24 && f(0) == 0 && Seq(5, 7, 9).contains(f(1).toInt) && {
          val count = (u(f, 2) << 8) | u(f, 3)
          val systime = ((u(f, 8).toLong << 24) | (u(f, 9) << 16) |
            (u(f, 10) << 8) | u(f, 11))
          count > 0 && count <= 200 && count * 16 <= f.length &&
            systime >= 1000000000L
        }
      }) tags += "netflow"
      // udp memcached: needle "\x00\x00stats"/"\x00\x00gets " at OFFSET 6
      // (misc.c:510-511) — the reserved half of the 8-byte frame header
      // is bytes 6-7 and the command starts at 8; minlen 6+7=13
      if (firsts.exists(f => f.length >= 13 && f(6) == 0 && f(7) == 0 &&
        (new String(f, 8, 5, StandardCharsets.ISO_8859_1) == "stats" ||
          new String(f, 8, 5, StandardCharsets.ISO_8859_1) == "gets ")))
        tags += "memcached"
      // nfs/rpc over udp: RPC call v2 at offset 4 (nfs.c:38, rpc.c:69 —
      // both needles include the \x00\x01 program-number high bytes)
      if (firsts.exists(f => f.length >= 16 && rpcCallAt(f, 4) &&
        f(12) == 0 && f(13) == 1 && u(f, 14) == 0x86)) {
        if (f16(firsts) == 0xa3) tags += "nfs"
        else rpcProgramNames.get(f16(firsts)).foreach(tags += _)
      }
      // dhcpv6: udp 547 on either side (the reference registers only the
      // server port, dhcp.c:186), msg-type SOLICIT(1)/INFO-REQUEST(11),
      // v6 only; the dispatcher's 2-byte floor applies (parsers.c:1066)
      if (isV6 && (srcPort == 547 || dstPort == 547) &&
        firsts.exists(f => f.length >= 2 && (f(0) == 1 || f(0) == 11)))
        tags += "dhcpv6"
      // isakmp: udp 500/4500, exchange type + version (misc.c:224-232)
      if (Seq(srcPort, dstPort).exists(p => p == 500 || p == 4500) &&
        firsts.exists(f => f.length >= 18 &&
          Seq(1, 8, 33, 46).contains(u(f, 16)) &&
          Seq(0x10, 0x20, 0x02).contains(u(f, 17)))) tags += "isakmp"
      if (Seq(srcPort, dstPort).contains(8211) && firsts.exists(f =>
        f.length >= 20 && u(f, 0) == 0x49 && u(f, 1) == 0x72))
        tags += "aruba-papi"
      // hsrp v1/v2: udp 1985/2029 with equal ports (misc.c:318-327)
      if (srcPort == dstPort && Seq(1985, 2029).contains(dstPort) &&
        firsts.exists(f => f.length >= 3)) {
        if (firsts.exists(f => f.length >= 3 && f(0) == 0 && f(1) == 3))
          tags += "hsrp"
        else if (firsts.exists(f => f.length >= 3 && f(0) == 1 &&
          u(f, 1) == 40 && f(2) == 2)) tags += "hsrpv2"
      }
      // safet: udp 23294, length byte echo (misc.c:329-334)
      if (Seq(srcPort, dstPort).contains(23294) && firsts.exists(f =>
        f.length >= 24 && u(f, 2) == f.length)) tags += "safet"
      // dropbox-lan-sync: udp 17500 + "host_int" (misc.c:226-232)
      if (Seq(srcPort, dstPort).contains(17500) && streams.exists(st =>
        new String(st, 0, math.min(st.length, 256),
          StandardCharsets.ISO_8859_1).indexOf("host_int", 1) >= 1))
        tags += "dropbox-lan-sync"
    }
    if (ipProtocol == 6 || ipProtocol == 17) {
      if (streams.exists(st => startsWithAny(st,
        Seq("SIP/2.0", "REGISTER sip:", "NOTIFY sip:")))) tags += "sip"
      if (firsts.exists(isSyslog)) tags += "syslog"
      // memstr(data+7, len-7, "STUN"): minimum hit is STUN at 7..10 in an
      // 11-byte payload (misc.c:164-168)
      if (streams.exists(st => st.length >= 11 && startsWithAny(st, Seq("RSP/")) &&
        win(st).indexOf("STUN", 7) >= 0)) tags += "stun"
    }
    tags.toSeq.sorted
  }

  /** ONC-RPC call header at `off`: xid then msg-type CALL(0), rpcvers 2
    * (the shared 8-byte tail of the nfs.c/rpc.c classifier patterns).
    */
  private def rpcCallAt(f: Array[Byte], off: Int): Boolean =
    f.length >= off + 8 && f(off) == 0 && f(off + 1) == 0 && f(off + 2) == 0 &&
      f(off + 3) == 0 && f(off + 4) == 0 && f(off + 5) == 0 &&
      f(off + 6) == 0 && f(off + 7) == 2

  /** Last byte of the RPC program number for the udp rpc classifier. */
  private def f16(firsts: Seq[Array[Byte]]): Int =
    firsts.collectFirst {
      case f if f.length >= 16 && rpcCallAt(f, 4) && f(12) == 0 &&
          f(13) == 1 && (f(14) & 0xff) == 0x86 =>
        f(15) & 0xff
    }.getOrElse(-1)

  /** rpc.c:27-58 program-number suffix -> protocol tag (prog 0x186xx). */
  private val rpcProgramNames: Map[Int, String] = Map(
    0xa0 -> "portmap", 0xa1 -> "rstat", 0xa2 -> "rusers", 0xa4 -> "ypprog",
    0xa5 -> "mount", 0xa7 -> "ypbind", 0xa8 -> "wall", 0xa9 -> "yppasswd",
    0xab -> "rquota", 0xb1 -> "rexec", 0xc5 -> "tfs")

  /** dns_parser's tag gate (dns.c:211-245): 17-byte floor, opcode <= 5,
    * question count 1..10 — udp dns/mdns/llmnr tag only when a datagram
    * passes this, never on port alone.
    */
  private def dnsHeaderOk(f: Array[Byte]): Boolean =
    f.length >= 17 && ((f(2) >> 3) & 0xf) <= 5 && {
      val qd = ((f(4) & 0xff) << 8) | (f(5) & 0xff)
      qd >= 1 && qd <= 10
    }

  /** SNMP: BER SEQ { INTEGER version <= 3 ... } (misc.c snmp_classify).
    * The dispatcher's needle is the literal first byte \x30 (universal
    * constructed SEQUENCE — an application-class tag 16 does NOT
    * classify); the callback then checks only tag/len on the inner TLV,
    * never the constructed bit (misc.c:112-130).
    */
  private def isSnmp(f: Array[Byte]): Boolean =
    f.length >= 2 && (f(0) & 0xff) == 0x30 &&
      (Asn1.getTlv(f, 0, f.length) match {
        case Some((outer, _)) if outer.tag == 16 && outer.len >= 16 =>
          Asn1.getTlv(outer.buf, outer.off, outer.off + outer.len) match {
            case Some((v, _)) => v.tag == 2 && v.len == 1 && v.lastByte <= 3
            case None => false
          }
        case _ => false
      })

  /** Classic/RFC5389 STUN binding checks (misc.c stun_classify). */
  private def isStun(f: Array[Byte]): Boolean = {
    val sig = f.length >= 3 &&
      ((f(0) == 0 && (f(1) == 1 || f(1) == 3) && f(2) == 0) ||
        (f(0) == 1 && f(1) == 1 && f(2) == 0))
    if (!sig || f.length < 20 || 20 + (f(3) & 0xff) != f.length) false
    else if ((f(4) & 0xff) == 0x21 && (f(5) & 0xff) == 0x12 &&
      (f(6) & 0xff) == 0xa4 && (f(7) & 0xff) == 0x42) true
    else f(1) == 1 && f.length > 25 && (f(23) & 0xff) + 24 == f.length
  }

  /** syslog: `<N...>` priority prefix, digits only (misc.c syslog_classify). */
  private def isSyslog(f: Array[Byte]): Boolean = {
    if (f.length < 3 || f(0) != '<' || f(1) < '1' || f(1) > '9') return false
    var i = 2
    while (i < f.length) {
      if (f(i) == '>') return true
      if (f(i) < '0' || f(i) > '9') return false
      i += 1
    }
    false
  }

  /** Parse one raw DNS message (fresh session state). The walker lives
    * in [[DnsParser]] — a byte-exact transcription of the reference's
    * dns.c/bsb.h machine, differentially fuzzed in
    * DnsDifferentialFuzzSpec. Session-spanning host attribution
    * (dns_find_host state across datagrams) threads through
    * [[DnsParser.parseMessage]] with a shared [[DnsParser.State]].
    */
  def parseDnsMessage(msg: Array[Byte]): Option[DnsInfo] =
    DnsParser.parseMessage(msg, new DnsParser.State)

  def dnsOpcodeName(c: Int): String = c match {
    case 0 => "QUERY"; case 1 => "IQUERY"; case 2 => "STATUS"
    case 4 => "NOTIFY"; case 5 => "UPDATE"; case other => other.toString
  }

  def dnsClassName(c: Int): String = c match {
    case 1 => "IN"; case 2 => "CS"; case 3 => "CH"; case 4 => "HS"
    case 255 => "ANY"; case _ => null
  }

  /** The reference's qtypes table (parsers/dns.c:622-683); an id without
    * an entry is skipped, never emitted numerically.
    */
  private val dnsTypeNames: Map[Int, String] = Map(
    1 -> "A", 2 -> "NS", 3 -> "MD", 4 -> "MF", 5 -> "CNAME", 6 -> "SOA",
    7 -> "MB", 8 -> "MG", 9 -> "MR", 10 -> "NULL", 11 -> "WKS", 12 -> "PTR",
    13 -> "HINFO", 14 -> "MINFO", 15 -> "MX", 16 -> "TXT", 17 -> "RP",
    18 -> "AFSDB", 19 -> "X25", 20 -> "ISDN", 21 -> "RT", 22 -> "NSAP",
    23 -> "NSAPPTR", 24 -> "SIG", 25 -> "KEY", 26 -> "PX", 27 -> "GPOS",
    28 -> "AAAA", 29 -> "LOC", 30 -> "NXT", 31 -> "EID", 32 -> "NIMLOC",
    33 -> "SRV", 34 -> "ATMA", 35 -> "NAPTR", 36 -> "KX", 37 -> "CERT",
    38 -> "A6", 39 -> "DNAME", 40 -> "SINK", 41 -> "OPT", 42 -> "APL",
    43 -> "DS", 44 -> "SSHFP", 46 -> "RRSIG", 47 -> "NSEC", 48 -> "DNSKEY",
    49 -> "DHCID", 50 -> "NSEC3", 51 -> "NSEC3PARAM", 52 -> "TLSA",
    55 -> "HIP", 99 -> "SPF", 249 -> "TKEY", 250 -> "TSIG", 252 -> "AXFR",
    253 -> "MAILB", 254 -> "MAILA", 255 -> "ANY")

  def dnsTypeName(t: Int): String = dnsTypeNames.getOrElse(t, null)

  /** Reference status strings verbatim (dns.c:21 statuses[16]). */
  private val dnsStatuses = Array(
    "NOERROR", "FORMERR", "SERVFAIL", "NXDOMAIN", "NOTIMPL", "REFUSED",
    "YXDOMAIN", "YXRRSET", "NXRRSET", "NOTAUTH", "NOTZONE",
    "11", "12", "13", "14", "15")

  def dnsRcodeName(rc: Int): String =
    if (rc >= 0 && rc < 16) dnsStatuses(rc) else rc.toString
}
