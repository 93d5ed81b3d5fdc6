package graft.model

/** Field kind taxonomy, mirroring the reference's query-side kinds
  * (reference: capture/field.c:190-219, viewer/internals.js:48-54).
  *
  * `lo`/`up` variants case-fold the operand before matching
  * (reference: viewer/molochparser.jison:498-518).
  */
sealed trait FieldKind
object FieldKind {
  case object IntegerK   extends FieldKind // integer
  case object SecondsK   extends FieldKind // epoch seconds
  case object DateK      extends FieldKind // timestamp column
  case object IpK        extends FieldKind // ip (string, CIDR-matchable)
  case object TermK      extends FieldKind // termfield (exact/keyword)
  case object LoTermK    extends FieldKind // lotermfield
  case object UpTermK    extends FieldKind // uptermfield
  case object TextK      extends FieldKind // textfield (tokenized)
  case object FloatK     extends FieldKind // numeric double (extension)
}

/** One registered queryable field.
  *
  * Mirrors the reference's field registry entries stored in the ES `fields`
  * index (reference: capture/field.c:254-344 moloch_field_define):
  * user-facing `expression` name, storage column `dbField`, query `kind`,
  * whether the storage column is an array (reference *_ARRAY/_HASH types →
  * membership semantics), an optional paired port field (reference
  * `portField`), and an optional operand transform applied at query time
  * (reference: viewer/molochparser.jison:752-762).
  */
final case class FieldDef(
    expression: String,
    dbField: String,
    kind: FieldKind,
    multiValued: Boolean = false,
    portField: Option[String] = None,
    transform: Option[String => String] = None,
    // FLAG_CNT companion (field.c:300-316): the queryable value is the
    // stored array's size, exposed as "<expression>.cnt"
    cnt: Boolean = false,
    // permission gate: querying this field requires the user right named
    // here (db.pl marks email fields requiredRight=emailSearch; enforced
    // at molochparser.jison:308-310/351-353 — lacking it throws
    // "<field> - permission denied", and regex meta-field fan-out skips
    // the field silently)
    requiredRight: Option[String] = None,
    // storage kind for multi-valued fields: the reference distinguishes
    // *_ARRAY (append-order list, duplicates allowed — field.c:561-565
    // g_ptr_array_add unconditionally) from *_HASH/*_GHASH (set — dup
    // insert returns NULL, field.c:566-581). Almost every multi-valued
    // field is a set; only the hasheader VALUE fields are arrays
    // (http.c:891-909, smtp.c:1035-1042). Rule field-ops consult this:
    // set-kinded adds canonicalize (sort+dedup), array-kinded append.
    arrayKind: Boolean = false)

/** One row of the files dimension (the reference's `files` index): the
  * user-facing capture file name, the capture node that wrote it, and the
  * id stored in sessions' `fileId` column. Drives the Q16 `file ==`
  * rewrite (reference: viewer/viewerUtils.js:139-190 lookupQueryItems,
  * viewer/db.js:1645-1680 fileNameToFiles).
  */
final case class FileEntry(name: String, node: String, id: String)

/** Expression-name → field metadata lookup driving the query compiler.
  *
  * Also models the reference's regex meta-fields (`port`, `country`, `asn`,
  * `rir`, `host`, `ip`) which fan out to an OR over every column whose
  * dbField matches a pattern (reference: db/db.pl:749-788, expansion at
  * viewer/molochparser.jison:356-375).
  */
final case class FieldRegistry(
    fields: Seq[FieldDef],
    metaFields: Map[String, Seq[String]] = Map.empty,
    aliases: Map[String, String] = Map.empty) {

  private val byExpr: Map[String, FieldDef] = {
    // every multi-valued field gets its FLAG_CNT companion
    // "<expression>.cnt" (reference field.c:300-316 registers
    // "<dbField>Cnt" with expression "<exp>.cnt")
    val withCnt = fields.flatMap { f =>
      if (f.multiValued)
        Seq(f, FieldDef(f.expression + ".cnt", f.dbField,
          FieldKind.IntegerK, cnt = true, requiredRight = f.requiredRight))
      else Seq(f)
    }
    val primary = withCnt.map(f => f.expression -> f).toMap
    primary ++ aliases.flatMap { case (alias, target) =>
      primary.get(target).map(alias -> _)
    }
  }

  def get(expression: String): Option[FieldDef] = byExpr.get(expression)

  def apply(expression: String): FieldDef =
    byExpr.getOrElse(expression,
      throw new IllegalArgumentException(s"unknown field: $expression"))

  /** Expand a meta-field to its member expressions, if registered. */
  def expand(expression: String): Seq[FieldDef] =
    metaFields.get(expression) match {
      case Some(members) => members.map(apply)
      case None          => Seq(apply(expression))
    }

  def isMeta(expression: String): Boolean = metaFields.contains(expression)
}

object FieldRegistry {
  import FieldKind._

  /** Registry over the driver's synthetic `events` table, used by the
    * oracle-checked expression-compiler queries.
    */
  val events: FieldRegistry = FieldRegistry(Seq(
    FieldDef("id",         "event_id",   IntegerK),
    FieldDef("ts",         "ts",         DateK),
    FieldDef("user",       "user_id",    IntegerK),
    FieldDef("type",       "event_type", TermK),
    FieldDef("type.lower", "event_type", LoTermK),
    FieldDef("value",      "value",      FloatK),
    FieldDef("props",      "props",      TermK)
  ))

  private val protocols = Map(
    "icmp" -> 1, "igmp" -> 2, "tcp" -> 6, "udp" -> 17, "gre" -> 47,
    "esp" -> 50, "icmp6" -> 58, "icmpv6" -> 58, "ospf" -> 89, "pim" -> 103,
    "sctp" -> 132)

  /** The reference's `ipProtocolLookup` operand transform
    * (viewer/molochparser.jison:722-749): protocol name → number.
    */
  val ipProtocolLookup: String => String = s =>
    protocols.get(s.toLowerCase).map(_.toString).getOrElse(s)

  /** Q12 operand transforms (viewer/molochparser.jison:712-762). */
  val utf8ToHex: String => String = s =>
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02x").mkString
      .replace("2a", "*") // keep wildcards wildcards, as the reference does
  val dash2Colon: String => String = _.replace('-', ':')
  val removeProtocol: String => String =
    _.replaceFirst("(?i)^[a-z]+://", "")
  val removeProtocolAndURI: String => String = s =>
    removeProtocol(s).replaceFirst("/.*$", "")

  /** Registry over [[graft.etl.SessionBuilder.SessionRow]] tables —
    * expression names follow the reference's field naming
    * (db/db.pl:740-1100). Meta-fields `ip`/`port` fan out across both
    * endpoints as in the reference (db.pl:740-788).
    */
  val sessions: FieldRegistry = FieldRegistry(
    Seq(
      FieldDef("ip.src",       "srcIp",        IpK, portField = Some("srcPort")),
      FieldDef("ip.dst",       "dstIp",        IpK, portField = Some("dstPort")),
      FieldDef("port.src",     "srcPort",      IntegerK),
      FieldDef("port.dst",     "dstPort",      IntegerK),
      FieldDef("ip.protocol",  "ipProtocol",   IntegerK,
        transform = Some(ipProtocolLookup)),
      FieldDef("packets.src",  "srcPackets",   IntegerK),
      FieldDef("packets.dst",  "dstPackets",   IntegerK),
      FieldDef("packets",      "totPackets",   IntegerK),
      FieldDef("bytes.src",    "srcBytes",     IntegerK),
      FieldDef("bytes.dst",    "dstBytes",     IntegerK),
      FieldDef("bytes",        "totBytes",     IntegerK),
      FieldDef("databytes.src", "srcDataBytes", IntegerK),
      FieldDef("databytes.dst", "dstDataBytes", IntegerK),
      FieldDef("databytes",    "totDataBytes", IntegerK),
      FieldDef("starttime",    "firstPacketSec", SecondsK),
      FieldDef("stoptime",     "lastPacketSec",  SecondsK),
      FieldDef("session.length", "length",     IntegerK),
      FieldDef("session.segments", "segmentCnt", IntegerK),
      FieldDef("tcpflags.syn", "tcpflagsSyn",  IntegerK),
      FieldDef("tcpflags.syn-ack", "tcpflagsSynAck", IntegerK),
      FieldDef("tcpflags.ack", "tcpflagsAck",  IntegerK),
      FieldDef("tcpflags.psh", "tcpflagsPsh",  IntegerK),
      FieldDef("tcpflags.rst", "tcpflagsRst",  IntegerK),
      FieldDef("tcpflags.fin", "tcpflagsFin",  IntegerK),
      FieldDef("tcpflags.urg", "tcpflagsUrg",  IntegerK),
      FieldDef("protocols",    "protocol",     TermK, multiValued = true),
      FieldDef("tags",         "tags",         TermK, multiValued = true),
      FieldDef("rir.src",      "srcRIR",       TermK),
      FieldDef("rir.dst",      "dstRIR",       TermK),
      FieldDef("oui.src",      "srcOui",       TermK, multiValued = true),
      FieldDef("oui.dst",      "dstOui",       TermK, multiValued = true),
      FieldDef("country.src",  "srcCountry",   TermK),
      FieldDef("country.dst",  "dstCountry",   TermK),
      FieldDef("asn.src",      "srcAsn",       LoTermK),
      FieldDef("asn.dst",      "dstAsn",       LoTermK),
      FieldDef("mac.src",      "srcMac",       LoTermK, multiValued = true,
        transform = Some(dash2Colon)),
      FieldDef("mac.dst",      "dstMac",       LoTermK, multiValued = true,
        transform = Some(dash2Colon)),
      FieldDef("file",         "fileId",       TermK, multiValued = true),
      FieldDef("node",         "node",         TermK),
      FieldDef("id",           "sessionId",    TermK),
      FieldDef("community.id", "communityId",  TermK),
      FieldDef("payload8.src.hex", "srcPayload8", LoTermK),
      FieldDef("payload8.dst.hex", "dstPayload8", LoTermK),
      FieldDef("http.method",  "httpMethod",   TermK, multiValued = true),
      FieldDef("http.uri",     "httpUri",      LoTermK, multiValued = true,
        transform = Some(removeProtocol)),
      FieldDef("http.host",    "httpHost",     LoTermK, multiValued = true),
      FieldDef("http.statuscode", "httpStatuscode", IntegerK, multiValued = true),
      FieldDef("http.user-agent", "httpUseragent", TermK, multiValued = true),
      FieldDef("http.version.src", "httpClientVersion", TermK, multiValued = true),
      FieldDef("http.version.dst", "httpServerVersion", TermK, multiValued = true),
      FieldDef("http.bodymagic",   "httpBodyMagic",     TermK, multiValued = true),
      FieldDef("http.uri.path", "httpPath",      LoTermK, multiValued = true),
      FieldDef("http.uri.key", "httpKey",        LoTermK, multiValued = true),
      FieldDef("http.uri.value", "httpValue",    LoTermK, multiValued = true),
      FieldDef("http.hasheader.src", "httpRequestHeader", LoTermK, multiValued = true),
      FieldDef("http.hasheader.dst", "httpResponseHeader", LoTermK, multiValued = true),
      // the hasheader VALUE fields are STR_ARRAY (append-order,
      // duplicates allowed), not sets — http.c:894-898/906-909
      FieldDef("http.hasheader.src.value", "httpRequestHeaderValue",
        LoTermK, multiValued = true, arrayKind = true),
      FieldDef("http.hasheader.dst.value", "httpResponseHeaderValue",
        LoTermK, multiValued = true, arrayKind = true),
      FieldDef("http.referer", "httpReferer",    LoTermK, multiValued = true),
      FieldDef("http.location", "httpLocation",  LoTermK, multiValued = true),
      FieldDef("http.cookie.key", "httpCookieKey", LoTermK, multiValued = true),
      FieldDef("http.cookie.value", "httpCookieValue", LoTermK, multiValued = true),
      FieldDef("http.md5",     "httpMd5",        LoTermK, multiValued = true),
      FieldDef("dns.host",     "dnsQname",     LoTermK, multiValued = true),
      FieldDef("dns.query.type", "dnsQtype",   UpTermK, multiValued = true),
      FieldDef("dns.status",   "dnsRcode",     UpTermK, multiValued = true),
      FieldDef("dns.opcode",   "dnsOpcode",    UpTermK, multiValued = true),
      FieldDef("dns.query.class", "dnsQclass", UpTermK, multiValued = true),
      FieldDef("ip.dns",       "dnsIp",        IpK, multiValued = true),
      FieldDef("dns.mailserver.host", "dnsMailserverHost", LoTermK,
        multiValued = true),
      FieldDef("dns.nameserver.host", "dnsNameserverHost", LoTermK,
        multiValued = true),
      FieldDef("ip.dns.nameserver", "dnsNameserverIp", IpK,
        multiValued = true),
      // the reference's primary expressions are ip.socks/port.socks
      // (parsers/socks.c:296-322); the db-style socks.* spellings stay
      // usable through aliases below
      FieldDef("ip.socks",     "socksIp",      IpK, portField = Some("socksPort")),
      FieldDef("host.socks",   "socksHost",    LoTermK),
      FieldDef("port.socks",   "socksPort",    IntegerK),
      FieldDef("tls.version",  "tlsVersion",   TermK, multiValued = true),
      FieldDef("tls.cipher",   "tlsCipher",    UpTermK, multiValued = true),
      FieldDef("tls.ja3",      "tlsJa3",       LoTermK, multiValued = true),
      FieldDef("tls.ja3s",     "tlsJa3s",      LoTermK, multiValued = true),
      FieldDef("tls.sessionid.src", "tlsSrcSessionId", LoTermK, multiValued = true),
      FieldDef("tls.sessionid.dst", "tlsDstSessionId", LoTermK, multiValued = true),
      FieldDef("ssh.ver",      "sshVersion",   LoTermK, multiValued = true),
      FieldDef("ssh.hassh",    "sshHassh",     LoTermK, multiValued = true),
      FieldDef("ssh.hasshServer", "sshHasshServer", LoTermK, multiValued = true),
      FieldDef("ssh.key",      "sshKey",       TermK, multiValued = true),
      FieldDef("dhcp.id",      "dhcpId",       LoTermK, multiValued = true),
      FieldDef("dhcp.mac",     "dhcpMac",      LoTermK, multiValued = true,
        transform = Some(dash2Colon)),
      FieldDef("dhcp.type",    "dhcpType",     UpTermK, multiValued = true),
      FieldDef("dhcp.host",    "dhcpHost",     LoTermK, multiValued = true),
      FieldDef("dhcp.host.tokens", "dhcpHost", TextK, multiValued = true),
      FieldDef("email.smtp-hello", "smtpHello", LoTermK, multiValued = true),
      FieldDef("email.src",    "emailSrc",     LoTermK, multiValued = true),
      FieldDef("email.dst",    "emailDst",     LoTermK, multiValued = true),
      FieldDef("email.subject", "emailSubject", TermK, multiValued = true),
      FieldDef("email.content-type", "emailContentType", LoTermK, multiValued = true),
      FieldDef("email.message-id", "emailId", TermK, multiValued = true),
      FieldDef("email.host",   "emailHost",    LoTermK, multiValued = true),
      FieldDef("ip.email",     "emailIp",      IpK, multiValued = true),
      FieldDef("email.x-mailer", "emailUseragent", TermK, multiValued = true),
      // STR_ARRAY like the http hasheader values (smtp.c:1038-1042)
      FieldDef("email.has-header.value", "emailHeaderValue", TermK,
        multiValued = true, arrayKind = true),
      FieldDef("vlan",         "vlanId",       IntegerK, multiValued = true),
      // cert.* fields over the struct array: scalar-per-cert extracts
      // directly; nested arrays (CN/ON/alt) flatten via sessionCol
      FieldDef("cert.serial",  "cert.serial",  LoTermK, multiValued = true),
      FieldDef("cert.hash",    "cert.hash",    LoTermK, multiValued = true),
      FieldDef("cert.issuer.cn", "certIssuerCN", LoTermK, multiValued = true),
      FieldDef("cert.subject.cn", "certSubjectCN", LoTermK, multiValued = true),
      FieldDef("cert.issuer.on", "certIssuerON", TermK, multiValued = true),
      FieldDef("cert.subject.on", "certSubjectON", TermK, multiValued = true),
      FieldDef("cert.alt",     "certAlt",      LoTermK, multiValued = true),
      FieldDef("cert.notbefore", "certNotBeforeSec", SecondsK, multiValued = true),
      FieldDef("cert.notafter", "certNotAfterSec", SecondsK, multiValued = true),
      FieldDef("cert.validfor", "cert.validDays", IntegerK, multiValued = true),
      FieldDef("cert.publicAlgorithm", "cert.publicAlgorithm", TermK,
        multiValued = true),
      FieldDef("cert.curve",   "cert.curve",   TermK, multiValued = true),
      FieldDef("irc.nick",     "ircNick",      TermK, multiValued = true),
      FieldDef("irc.channel",  "ircChannel",   TermK, multiValued = true),
      FieldDef("postgresql.user", "pgUser",    TermK),
      FieldDef("postgresql.db", "pgDb",        TermK),
      FieldDef("postgresql.app", "pgApp",      TermK),
      FieldDef("mysql.user",   "mysqlUser",    TermK),
      FieldDef("mysql.ver",    "mysqlVersion", LoTermK),
      FieldDef("krb5.realm",   "krb5Realm",    TermK, multiValued = true),
      FieldDef("krb5.cname",   "krb5Cname",    TermK, multiValued = true),
      FieldDef("krb5.sname",   "krb5Sname",    TermK, multiValued = true),
      FieldDef("ldap.authtype", "ldapAuthtype", TermK, multiValued = true),
      FieldDef("ldap.bindname", "ldapBindname", TermK, multiValued = true),
      FieldDef("host.quic",    "quicHost",     LoTermK, multiValued = true),
      // lotextfield `.tokens` companions (FLAG_FAKE twins of the host/
      // uri fields — http.c:838-842, dns.c, smtp.c:928-933, quic.c,
      // socks.c:313-318, oracle.c): same stored column, analyzed-phrase
      // semantics
      FieldDef("host.http.tokens", "httpHost",  TextK, multiValued = true),
      FieldDef("http.uri.tokens",  "httpUri",   TextK, multiValued = true),
      FieldDef("host.dns.tokens",  "dnsQname",  TextK, multiValued = true),
      FieldDef("host.quic.tokens", "quicHost",  TextK, multiValued = true),
      FieldDef("host.socks.tokens", "socksHost", TextK),
      FieldDef("host.email.tokens", "emailHost", TextK, multiValued = true),
      FieldDef("oracle.host.tokens", "oracleHost", TextK),
      FieldDef("quic.user-agent", "quicUseragent", TermK, multiValued = true),
      FieldDef("quic.version", "quicVersion",  TermK, multiValued = true),
      FieldDef("smb.domain",   "smbDomain",    TermK, multiValued = true),
      FieldDef("smb.user",     "smbUser",      TermK, multiValued = true),
      FieldDef("host.smb",     "smbHost",      TermK, multiValued = true),
      FieldDef("smb.os",       "smbOs",        TermK, multiValued = true),
      FieldDef("smb.ver",      "smbVersion",   TermK, multiValued = true),
      FieldDef("smb.share",    "smbShare",     TermK, multiValued = true),
      FieldDef("smb.fn",       "smbFilename",  TermK, multiValued = true),
      FieldDef("icmp.type",    "icmpType",     IntegerK, multiValued = true),
      FieldDef("icmp.code",    "icmpCode",     IntegerK, multiValued = true),
      FieldDef("bgp.type",     "bgpType",      UpTermK, multiValued = true),
      FieldDef("user",         "user",         LoTermK, multiValued = true),
      FieldDef("oracle.user",  "oracleUser",   LoTermK),
      FieldDef("oracle.host",  "oracleHost",   LoTermK),
      FieldDef("oracle.service", "oracleService", LoTermK),
      FieldDef("radius.user",  "radiusUser",   TermK, multiValued = true),
      FieldDef("radius.framed-ip", "radiusFramedIp", IpK, multiValued = true),
      FieldDef("radius.mac",   "radiusMac",    LoTermK, multiValued = true),
      // round-4 surfaces: tunnel/header addresses, attachment digests,
      // punycode, FLAG_CNT-free per-address enrichment companions
      FieldDef("gre.ip",       "greIp",        IpK, multiValued = true),
      FieldDef("ip.xff",       "httpXffIp",    IpK, multiValued = true),
      FieldDef("ip.dns.mailserver", "dnsMailserverIp", IpK, multiValued = true),
      FieldDef("dns.puny",     "dnsPuny",      LoTermK, multiValued = true),
      FieldDef("dhcp.oui",     "dhcpOui",      TermK, multiValued = true),
      FieldDef("isis.msgType", "isisMsgType",  LoTermK, multiValued = true),
      FieldDef("http.sha256",  "httpSha256",   LoTermK, multiValued = true),
      FieldDef("http.reqbody", "httpRequestBody", TermK, multiValued = true),
      FieldDef("email.fn",     "emailFilename", TermK, multiValued = true),
      FieldDef("email.md5",    "emailMd5",     LoTermK, multiValued = true),
      FieldDef("email.sha256", "emailSha256",  LoTermK, multiValued = true),
      FieldDef("email.bodymagic", "emailBodyMagic", TermK, multiValued = true),
      FieldDef("tls.ja3string", "tlsJa3String", LoTermK, multiValued = true),
      FieldDef("tls.ja3sstring", "tlsJa3sString", LoTermK, multiValued = true),
      FieldDef("country.dns",  "dnsGeo",       TermK, multiValued = true),
      FieldDef("asn.dns",      "dnsAsn",       LoTermK, multiValued = true),
      FieldDef("rir.dns",      "dnsRir",       TermK, multiValued = true),
      FieldDef("country.dns.nameserver", "dnsNameserverGeo", TermK, multiValued = true),
      FieldDef("asn.dns.nameserver", "dnsNameserverAsn", LoTermK, multiValued = true),
      FieldDef("rir.dns.nameserver", "dnsNameserverRir", TermK, multiValued = true),
      FieldDef("country.dns.mailserver", "dnsMailserverGeo", TermK, multiValued = true),
      FieldDef("asn.dns.mailserver", "dnsMailserverAsn", LoTermK, multiValued = true),
      FieldDef("rir.dns.mailserver", "dnsMailserverRir", TermK, multiValued = true),
      FieldDef("country.email", "emailGeo",    TermK, multiValued = true),
      FieldDef("asn.email",    "emailAsn",     LoTermK, multiValued = true),
      FieldDef("rir.email",    "emailRir",     TermK, multiValued = true),
      FieldDef("country.socks", "socksGeo",    TermK),
      FieldDef("asn.socks",    "socksAsn",     LoTermK),
      FieldDef("rir.socks",    "socksRir",     TermK),
      FieldDef("country.xff",  "httpXffGeo",   TermK, multiValued = true),
      FieldDef("asn.xff",      "httpXffAsn",   LoTermK, multiValued = true),
      FieldDef("rir.xff",      "httpXffRir",   TermK, multiValued = true),
      FieldDef("country.gre",  "greGeo",       TermK, multiValued = true),
      FieldDef("asn.gre",      "greAsn",       LoTermK, multiValued = true),
      FieldDef("rir.gre",      "greRir",       TermK, multiValued = true)
      // email fields carry requiredRight=emailSearch, as db.pl marks
      // every email* field (enforced by Compiler when rights are set)
    ).map(f => if (f.expression.startsWith("email.") ||
      f.dbField.startsWith("email"))
      f.copy(requiredRight = Some("emailSearch")) else f),
    metaFields = Map(
      // `ip` is the viewer's ipall special: EVERY ip-typed field
      // (molochparser.js:311-330 getIpInfoList — with a `:port` operand
      // only the portField carriers stay, enforced in the Compiler)
      "ip"   -> Seq("ip.src", "ip.dst", "ip.dns", "ip.dns.nameserver",
        "ip.dns.mailserver", "ip.socks", "ip.email", "ip.xff",
        "radius.framed-ip", "gre.ip"),
      // port regex `^port\.|\.port$` over expressions (db/db.pl:755)
      "port" -> Seq("port.src", "port.dst", "port.socks"),
      // `host` fans out over every hostname expression — the reference
      // defines it by the dbField regex (^host\..*|\.host$, minus
      // .cnt/.tokens) in db/db.pl:781-788, expanded to an OR at
      // molochparser.jison:356-375.
      "host" -> Seq("http.host", "dns.host", "dns.mailserver.host",
        "dns.nameserver.host", "host.quic", "host.smb", "host.socks",
        // the `\.host$` half of the regex also sweeps dhcp.host and
        // oracle.host (db.pl:787)
        "dhcp.host", "oracle.host",
        // db.pl's ^host\. regex sweeps the email host too (dbField
        // host.email); it carries requiredRight=emailSearch, so a
        // rights-bearing compiler silently drops it from the fan-out
        // (jison:318-321)
        "email.host"),
      // the reference's country/asn/rir regex meta-fields fan out over
      // every GEO/AS/RIR-typed column (db/db.pl:749-780)
      // db.pl's regexes sweep EVERY *GEO/*ASN/*RIR dbField
      "country" -> Seq("country.src", "country.dst", "country.dns",
        "country.dns.nameserver", "country.dns.mailserver",
        "country.email", "country.socks", "country.xff", "country.gre"),
      "asn" -> Seq("asn.src", "asn.dst", "asn.dns", "asn.dns.nameserver",
        "asn.dns.mailserver", "asn.email", "asn.socks", "asn.xff",
        "asn.gre"),
      "rir" -> Seq("rir.src", "rir.dst", "rir.dns", "rir.dns.nameserver",
        "rir.dns.mailserver", "rir.email", "rir.socks", "rir.xff",
        "rir.gre")),
    // the reference's primary expression names are host.<proto> with
    // <proto>.host aliases (db/db.pl "aliases" entries); accept both
    aliases = Map(
      "host.http" -> "http.host",
      "host.dns" -> "dns.host",
      "host.dns.mailserver" -> "dns.mailserver.host",
      "host.dns.nameserver" -> "dns.nameserver.host",
      // db-style spellings of the socks/email primaries
      "socks.ip" -> "ip.socks",
      "socks.port" -> "port.socks",
      "email.ip" -> "ip.email",
      // smtp.c:932 registers this alias for the tokens twin
      "email.host.tokens" -> "host.email.tokens",
      // per-parser "aliases" registrations: both spellings of every
      // host field resolve (smtp.c host.email↔email.host, smb.c,
      // socks.c, quic.c, dhcp.c:158, oracle.c:57)
      "host.email" -> "email.host",
      "smb.host" -> "host.smb",
      "socks.host" -> "host.socks",
      "quic.host" -> "host.quic",
      "host.dhcp" -> "dhcp.host",
      "host.oracle" -> "oracle.host"))

  /** Column resolver for session tables: derived epoch-second views of the
    * millisecond timestamp columns.
    */
  def sessionCol(name: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    name match {
      case "firstPacketSec" => floor(col("firstPacket") / 1000).cast("long")
      case "lastPacketSec"  => floor(col("lastPacket") / 1000).cast("long")
      // nested per-cert string arrays → one flat array per session
      case "certIssuerCN"   => flatten(col("cert.issuerCN"))
      case "certSubjectCN"  => flatten(col("cert.subjectCN"))
      case "certIssuerON"   => flatten(col("cert.issuerON"))
      case "certSubjectON"  => flatten(col("cert.subjectON"))
      case "certAlt"        => flatten(col("cert.alt"))
      // per-cert epoch-ms validity bounds → epoch-second views
      case "certNotBeforeSec" =>
        transform(col("cert.notBefore"), e => floor(e / 1000).cast("long"))
      case "certNotAfterSec" =>
        transform(col("cert.notAfter"), e => floor(e / 1000).cast("long"))
      case other => col(other)
    }
  }
}
