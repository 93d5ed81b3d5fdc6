package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** Corpus-wide FIELD fidelity floor, one level deeper than
  * CorpusFidelitySpec's (packets, bytes) signatures: for every reference
  * pcap golden, compare the multiset over sessions of each extracted
  * field's sorted-distinct value set against the reference's sessions3
  * dump. Pins the achieved per-field level so extractor regressions fail
  * loudly, field by field.
  */
class FieldFidelitySpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()

  private def goldenVals(body: JsonNode, group: String, key: String): Seq[String] = {
    // key may be a '/'-separated path for nested goldens (network.vlan.id);
    // "" = the group itself is a top-level field (length, totDataBytes…)
    val node =
      if (key.isEmpty) body.get(group)
      else key.split("/").foldLeft(body.get(group): JsonNode) {
        (n, k) => if (n == null) null else n.get(k)
      }
    if (node == null) Nil
    else if (node.isArray)
      node.elements().asScala.map(_.asText()).toSeq.distinct.sorted
    else Seq(node.asText()) // scalar fields (socks.ip, mysql.version, …)
  }

  // (field label, golden (group, key), our extractor)
  private val fields: Seq[(String, (String, String),
      SessionBuilder.SessionRow => Seq[String])] = Seq(
    ("source.packets", ("source", "packets"), r => Seq(r.srcPackets.toString)),
    ("source.bytes", ("source", "bytes"), r => Seq(r.srcBytes.toString)),
    ("destination.packets", ("destination", "packets"), r =>
      Seq(r.dstPackets.toString)),
    ("destination.bytes", ("destination", "bytes"), r =>
      Seq(r.dstBytes.toString)),
    ("client.bytes", ("client", "bytes"), r => Seq(r.srcDataBytes.toString)),
    ("server.bytes", ("server", "bytes"), r => Seq(r.dstDataBytes.toString)),
    ("network.community_id", ("network", "community_id"), r =>
      Option(r.communityId).filter(_.nonEmpty).toSeq),
    ("source.mac", ("source", "mac"), _.srcMac),
    ("destination.mac", ("destination", "mac"), _.dstMac),
    ("tcpflags.syn", ("tcpflags", "syn"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsSyn.toString) else Nil),
    ("tcpflags.syn-ack", ("tcpflags", "syn-ack"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsSynAck.toString) else Nil),
    ("tcpflags.ack", ("tcpflags", "ack"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsAck.toString) else Nil),
    ("tcpflags.psh", ("tcpflags", "psh"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsPsh.toString) else Nil),
    ("tcpflags.rst", ("tcpflags", "rst"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsRst.toString) else Nil),
    ("tcpflags.fin", ("tcpflags", "fin"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsFin.toString) else Nil),
    ("tcpflags.urg", ("tcpflags", "urg"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsUrg.toString) else Nil),
    ("http.key", ("http", "key"), _.httpKey),
    ("http.value", ("http", "value"), _.httpValue),
    ("http.cookieKey", ("http", "cookieKey"), _.httpCookieKey),
    ("http.cookieValue", ("http", "cookieValue"), _.httpCookieValue),
    ("http.method", ("http", "method"), _.httpMethod),
    ("http.host", ("http", "host"), _.httpHost),
    ("http.path", ("http", "path"), _.httpPath),
    ("http.uri", ("http", "uri"), _.httpUri),
    ("http.statuscode", ("http", "statuscode"), _.httpStatuscode.map(_.toString)),
    ("http.requestHeader", ("http", "requestHeader"), _.httpRequestHeader),
    ("http.responseHeader", ("http", "responseHeader"), _.httpResponseHeader),
    ("http.request-referer", ("http", "request-referer"), _.httpReferer),
    ("http.md5", ("http", "md5"), _.httpMd5),
    ("http.useragent", ("http", "useragent"), _.httpUseragent),
    ("dns.host", ("dns", "host"), _.dnsQname),
    ("dns.qt", ("dns", "qt"), _.dnsQtype),
    ("dns.qc", ("dns", "qc"), _.dnsQclass),
    ("dns.opcode", ("dns", "opcode"), _.dnsOpcode),
    ("dns.status", ("dns", "status"), _.dnsRcode),
    ("dns.ip", ("dns", "ip"), _.dnsIp),
    ("dns.nameserverHost", ("dns", "nameserverHost"), _.dnsNameserverHost),
    ("tls.ja3", ("tls", "ja3"), _.tlsJa3),
    ("tls.ja3s", ("tls", "ja3s"), _.tlsJa3s),
    ("tls.cipher", ("tls", "cipher"), _.tlsCipher),
    ("tls.version", ("tls", "version"), _.tlsVersion),
    ("icmp.type", ("icmp", "type"), _.icmpType.map(_.toString)),
    ("icmp.code", ("icmp", "code"), _.icmpCode.map(_.toString)),
    ("network.vlan", ("network", "vlan/id"), _.vlanId.map(_.toString)),
    ("email.smtpHello", ("email", "smtpHello"), _.smtpHello),
    ("email.src", ("email", "src"), _.emailSrc),
    ("email.dst", ("email", "dst"), _.emailDst),
    ("email.subject", ("email", "subject"), _.emailSubject),
    ("email.id", ("email", "id"), _.emailId),
    ("email.host", ("email", "host"), _.emailHost),
    ("email.ip", ("email", "ip"), _.emailIp),
    ("email.useragent", ("email", "useragent"), _.emailUseragent),
    ("email.contentType", ("email", "contentType"), _.emailContentType),
    ("email.mimeVersion", ("email", "mimeVersion"), _.emailMimeVersion),
    ("email.header", ("email", "header"), _.emailHeader),
    ("quic.host", ("quic", "host"), _.quicHost),
    ("quic.version", ("quic", "version"), _.quicVersion),
    ("quic.useragent", ("quic", "useragent"), _.quicUseragent),
    ("ssh.version", ("ssh", "version"), _.sshVersion),
    ("ssh.hassh", ("ssh", "hassh"), _.sshHassh),
    ("ssh.hasshServer", ("ssh", "hasshServer"), _.sshHasshServer),
    ("smb.share", ("smb", "share"), _.smbShare),
    ("smb.os", ("smb", "os"), _.smbOs),
    ("smb.domain", ("smb", "domain"), _.smbDomain),
    ("smb.user", ("smb", "user"), _.smbUser),
    ("smb.version", ("smb", "version"), _.smbVersion),
    ("smb.filename", ("smb", "filename"), _.smbFilename),
    ("http.bodyMagic", ("http", "bodyMagic"), _.httpBodyMagic),
    ("http.clientVersion", ("http", "clientVersion"), _.httpClientVersion),
    ("http.serverVersion", ("http", "serverVersion"), _.httpServerVersion),
    ("tls.dstSessionId", ("tls", "dstSessionId"), _.tlsDstSessionId),
    ("tls.srcSessionId", ("tls", "srcSessionId"), _.tlsSrcSessionId),
    ("dns.mailserverHost", ("dns", "mailserverHost"), _.dnsMailserverHost),
    ("dns.nameserverIp", ("dns", "nameserverIp"), _.dnsNameserverIp),
    ("irc.nick", ("irc", "nick"), _.ircNick),
    ("irc.channel", ("irc", "channel"), _.ircChannel),
    ("krb5.realm", ("krb5", "realm"), _.krb5Realm),
    ("krb5.cname", ("krb5", "cname"), _.krb5Cname),
    ("krb5.sname", ("krb5", "sname"), _.krb5Sname),
    ("ldap.authtype", ("ldap", "authtype"), _.ldapAuthtype),
    ("ldap.bindname", ("ldap", "bindname"), _.ldapBindname),
    ("mysql.version", ("mysql", "version"), r =>
      Option(r.mysqlVersion).filter(_.nonEmpty).toSeq),
    ("mysql.user", ("mysql", "user"), r =>
      Option(r.mysqlUser).filter(_.nonEmpty).toSeq),
    ("postgresql.user", ("postgresql", "user"), r =>
      Option(r.pgUser).filter(_.nonEmpty).toSeq),
    ("postgresql.db", ("postgresql", "db"), r =>
      Option(r.pgDb).filter(_.nonEmpty).toSeq),
    ("postgresql.app", ("postgresql", "app"), r =>
      Option(r.pgApp).filter(_.nonEmpty).toSeq),
    ("socks.ip", ("socks", "ip"), r => Option(r.socksIp).toSeq),
    ("socks.host", ("socks", "host"), r => Option(r.socksHost).toSeq),
    ("socks.port", ("socks", "port"), r =>
      if (r.socksPort >= 0) Seq(r.socksPort.toString) else Nil),
    ("dhcp.id", ("dhcp", "id"), _.dhcpId),
    ("dhcp.mac", ("dhcp", "mac"), _.dhcpMac),
    ("dhcp.type", ("dhcp", "type"), _.dhcpType),
    ("dhcp.host", ("dhcp", "host"), _.dhcpHost),
    ("length", ("length", ""), r => Seq(r.length.toString)),
    ("totDataBytes", ("totDataBytes", ""), r => Seq(r.totDataBytes.toString)),
    ("segmentCnt", ("segmentCnt", ""), r => Seq(r.segmentCnt.toString)),
    ("protocol", ("protocol", ""), _.protocol),
    ("tcpflags.srcZero", ("tcpflags", "srcZero"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsSrcZero.toString) else Nil),
    ("tcpflags.dstZero", ("tcpflags", "dstZero"), r =>
      if (r.ipProtocol == 6) Seq(r.tcpflagsDstZero.toString) else Nil),
    ("srcPayload8", ("srcPayload8", ""), r =>
      Option(r.srcPayload8).filter(_.nonEmpty).toSeq),
    ("dstPayload8", ("dstPayload8", ""), r =>
      Option(r.dstPayload8).filter(_.nonEmpty).toSeq),
    ("initRTT", ("initRTT", ""), r =>
      if (r.initRTT >= 0) Seq(r.initRTT.toString) else Nil),
    ("user", ("user", ""), _.user),
    ("http.response-location", ("http", "response-location"), _.httpLocation),
    ("ssh.key", ("ssh", "key"), _.sshKey),
    ("bgp.type", ("bgp", "type"), _.bgpType),
    ("oracle.user", ("oracle", "user"), r =>
      Option(r.oracleUser).filter(_.nonEmpty).toSeq),
    ("oracle.host", ("oracle", "host"), r =>
      Option(r.oracleHost).filter(_.nonEmpty).toSeq),
    ("oracle.service", ("oracle", "service"), r =>
      Option(r.oracleService).filter(_.nonEmpty).toSeq),
    ("radius.user", ("radius", "user"), _.radiusUser),
    ("radius.framedIp", ("radius", "framedIp"), _.radiusFramedIp),
    ("radius.mac", ("radius", "mac"), _.radiusMac),
    ("smb.host", ("smb", "host"), _.smbHost),
    ("http.requestHeaderField", ("http", "requestHeaderField"), _.httpRequestHeaderField),
    ("http.requestHeaderValue", ("http", "requestHeaderValue"), _.httpRequestHeaderValue),
    ("http.responseHeaderField", ("http", "responseHeaderField"), _.httpResponseHeaderField),
    ("http.responseHeaderValue", ("http", "responseHeaderValue"), _.httpResponseHeaderValue),
    ("http.user", ("http", "user"), _.httpUser),
    ("http.authType", ("http", "authType"), _.httpAuthType),
    ("http.request-authorization", ("http", "request-authorization"), _.httpAuthorization),
    ("email.headerField", ("email", "headerField"), _.emailHeaderField),
    ("email.headerValue", ("email", "headerValue"), _.emailHeaderValue),
    ("email.header-x-elnk-trace", ("email", "header-x-elnk-trace"), _.emailHeaderTrace),
    ("tags", ("tags", ""), _.tags),
    ("srcOui", ("srcOui", ""), _.srcOui),
    ("dstOui", ("dstOui", ""), _.dstOui),
    ("socks.user", ("socks", "user"), _.socksUser),
    ("test.ip", ("test", "ip"), _.testIp),
    ("test.number", ("test", "number"), _.testNumber.map(_.toString)),
    ("test.string.snow", ("test", "string.snow"), _.testString),
    ("test.ASN", ("test", "ASN"), _.testAsn),
    ("test.GEO", ("test", "GEO"), _.testGeo),
    ("test.RIR", ("test", "RIR"), _.testRir),
    ("source.as.full", ("source", "as/full"), r => Option(r.srcAsn).toSeq),
    ("destination.as.full", ("destination", "as/full"), r =>
      Option(r.dstAsn).toSeq),
    ("source.geo", ("source", "geo/country_iso_code"), r =>
      Option(r.srcCountry).toSeq),
    ("destination.geo", ("destination", "geo/country_iso_code"), r =>
      Option(r.dstCountry).toSeq),
    ("srcRIR", ("srcRIR", ""), r => Option(r.srcRIR).toSeq),
    ("dstRIR", ("dstRIR", ""), r => Option(r.dstRIR).toSeq),
    ("dns.ASN", ("dns", "ASN"), _.dnsAsn),
    ("dns.GEO", ("dns", "GEO"), _.dnsGeo),
    ("dns.RIR", ("dns", "RIR"), _.dnsRir),
    ("dns.nameserverASN", ("dns", "nameserverASN"), _.dnsNameserverAsn),
    ("dns.nameserverGEO", ("dns", "nameserverGEO"), _.dnsNameserverGeo),
    ("dns.nameserverRIR", ("dns", "nameserverRIR"), _.dnsNameserverRir),
    ("dns.mailserverIp", ("dns", "mailserverIp"), _.dnsMailserverIp),
    ("dns.mailserverASN", ("dns", "mailserverASN"), _.dnsMailserverAsn),
    ("dns.mailserverGEO", ("dns", "mailserverGEO"), _.dnsMailserverGeo),
    ("dns.mailserverRIR", ("dns", "mailserverRIR"), _.dnsMailserverRir),
    ("email.ASN", ("email", "ASN"), _.emailAsn),
    ("email.GEO", ("email", "GEO"), _.emailGeo),
    ("email.RIR", ("email", "RIR"), _.emailRir),
    ("socks.ASN", ("socks", "ASN"), r => Option(r.socksAsn).toSeq),
    ("socks.GEO", ("socks", "GEO"), r => Option(r.socksGeo).toSeq),
    ("socks.RIR", ("socks", "RIR"), r => Option(r.socksRir).toSeq),
    ("radius.framedASN", ("radius", "framedASN"), _.radiusFramedAsn),
    ("radius.framedGEO", ("radius", "framedGEO"), _.radiusFramedGeo),
    ("radius.framedRIR", ("radius", "framedRIR"), _.radiusFramedRir),
    ("tls.ja3string", ("tls", "ja3string"), _.tlsJa3String),
    ("tls.ja3sstring", ("tls", "ja3sstring"), _.tlsJa3sString),
    ("greIp", ("greIp", ""), _.greIp),
    ("greASN", ("greASN", ""), _.greAsn),
    ("greGEO", ("greGEO", ""), _.greGeo),
    ("greRIR", ("greRIR", ""), _.greRir),
    ("http.xffIp", ("http", "xffIp"), _.httpXffIp),
    ("http.xffASN", ("http", "xffASN"), _.httpXffAsn),
    ("http.xffGEO", ("http", "xffGEO"), _.httpXffGeo),
    ("http.xffRIR", ("http", "xffRIR"), _.httpXffRir),
    ("dns.puny", ("dns", "puny"), _.dnsPuny),
    ("dhcp.oui", ("dhcp", "oui"), _.dhcpOui),
    ("isis.msgType", ("isis", "msgType"), _.isisMsgType),
    ("http.sha256", ("http", "sha256"), _.httpSha256),
    ("http.requestBody", ("http", "requestBody"), _.httpRequestBody),
    ("email.md5", ("email", "md5"), _.emailMd5),
    ("email.sha256", ("email", "sha256"), _.emailSha256),
    ("email.filename", ("email", "filename"), _.emailFilename),
    ("email.bodyMagic", ("email", "bodyMagic"), _.emailBodyMagic),
    // ether-keyed sessions (ipProtocol 0: lldp/isis/arp) carry no
    // ip/port; port-less ip protocols render port 0 (db.c uint16)
    ("source.ip", ("source", "ip"), r =>
      if (r.ipProtocol == 0) Nil
      else Option(r.srcIp).filter(_.nonEmpty).toSeq),
    ("destination.ip", ("destination", "ip"), r =>
      if (r.ipProtocol == 0) Nil
      else Option(r.dstIp).filter(_.nonEmpty).toSeq),
    ("source.port", ("source", "port"), r =>
      if (r.ipProtocol == 0) Nil else Seq(math.max(0, r.srcPort).toString)),
    ("destination.port", ("destination", "port"), r =>
      if (r.ipProtocol == 0) Nil else Seq(math.max(0, r.dstPort).toString)),
    ("ipProtocol", ("ipProtocol", ""), r => Seq(r.ipProtocol.toString)),
    ("firstPacket", ("firstPacket", ""), r => Seq(r.firstPacket.toString)),
    ("lastPacket", ("lastPacket", ""), r => Seq(r.lastPacket.toString)),
    ("network.bytes", ("network", "bytes"), r => Seq(r.totBytes.toString)),
    ("network.packets", ("network", "packets"), r =>
      Seq(r.totPackets.toString)),
    ("packetLen", ("packetLen", ""), r =>
      r.packetLen.map(_.toString).distinct),
    // full-field census additions (r13): every remaining comparable key
    // the 145 goldens carry. Excluded as canonicalized-away by the
    // reference's own harness, each re-verified against the cited lines
    // (r14 re-read): @timestamp/timestamp → literal "SET"
    // (tests/tests.pl:172-176 fix()), rootId → "SET" (tests.pl:169-171;
    // its PRESENCE is compared in its own block below), and fileId →
    // always [] because --tests forces dryRun (main.c:222-224), the
    // null writer never registers a file, and db.c:898-905 then emits
    // an empty fileNumArray — a vacuous compare, not a hidden field.
    ("node", ("node", ""), r => Option(r.node).filter(_.nonEmpty).toSeq),
    // byte offset of each packet's record header in the capture file
    // (db.c packetPos; 24 = first record after the pcap global header)
    ("packetPos", ("packetPos", ""), r =>
      r.packetPos.map(_.toString).distinct),
    // as.full "AS36459 GitHub, Inc." splits into number + organization
    // (db.c:903-918 LLmsearch asn split)
    ("source.as.number", ("source", "as/number"), r =>
      Option(r.srcAsn).toSeq
        .map(_.stripPrefix("AS").takeWhile(_.isDigit)).filter(_.nonEmpty)),
    ("destination.as.number", ("destination", "as/number"), r =>
      Option(r.dstAsn).toSeq
        .map(_.stripPrefix("AS").takeWhile(_.isDigit)).filter(_.nonEmpty)),
    ("source.as.organization", ("source", "as/organization/name"), r =>
      Option(r.srcAsn).toSeq.map(_.split(" ", 2)).collect {
        case Array(_, org) => org }),
    ("destination.as.organization", ("destination", "as/organization/name"),
      r => Option(r.dstAsn).toSeq.map(_.split(" ", 2)).collect {
        case Array(_, org) => org }))

  test("per-field fidelity floors across the golden corpus") {
    val dir = new java.io.File("/root/reference/tests/pcap")
    val match_ = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val seen = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val misses = scala.collection.mutable.Map[String, List[String]]()
      .withDefaultValue(Nil)
    dir.listFiles().filter(_.getName.endsWith(".pcap")).map(_.getPath).sorted
      .foreach { p =>
        val name = new java.io.File(p).getName.stripSuffix(".pcap")
        val goldenFile = new java.io.File(s"$dir/$name.test")
        if (goldenFile.exists()) {
          try {
            val bodies = mapper.readTree(goldenFile).get("sessions3")
              .elements().asScala.map(_.get("body")).toSeq
            val rows = SessionBuilder.sessionizeRef(spark, p).collect()
            for ((label, (g, k), ours) <- fields) {
              val want = bodies.map(goldenVals(_, g, k)).filter(_.nonEmpty)
                .map(_.mkString("")).sorted
              val got = rows.map(ours(_).distinct.sorted)
                .filter(_.nonEmpty).toSeq.map(_.mkString("")).sorted
              if (want.nonEmpty || got.nonEmpty) {
                seen(label) += 1
                if (want == got) match_(label) += 1
                else misses(label) ::= name
              }
            }
            // FLAG_CNT companions: the reference stores <field>Cnt
            // alongside every counted field (capture/db.c FLAG_CNT, with
            // -cnt spelling for ECS dotted names); pin our stored-array
            // size against the golden count corpus-wide so the compiler's
            // <field>.cnt queries stay exact. Deliberately NOT distinct:
            // a duplicate the reference's set-semantics would have
            // collapsed must fail here.
            for ((label, (g, k), ours) <- fields) {
              val cands =
                if (k.isEmpty) Seq((g + "Cnt", ""))
                else Seq((g, k + "Cnt"), (g, k + "-cnt"))
              val want = bodies.map { b =>
                cands.iterator.map { case (cg, ck) => goldenVals(b, cg, ck) }
                  .find(_.nonEmpty).getOrElse(Nil)
              }.filter(_.nonEmpty).map(_.mkString("")).sorted
              if (want.nonEmpty) {
                val got = rows.map(ours(_)).filter(_.nonEmpty)
                  .map(_.length.toString).toSeq.sorted
                seen(label + ".cnt") += 1
                if (want == got) match_(label + ".cnt") += 1
                else misses(label + ".cnt") ::= name
              }
            }
            // cert chains are objects — rendered through a shared
            // canonical string (remainingDays excluded: it is relative
            // to the reference's capture-run wall clock)
            {
              def goldCert(c: JsonNode): String = {
                def arr(k: String): Seq[String] =
                  Option(c.get(k)).toSeq.flatMap(
                    _.elements().asScala.map(_.asText()).toSeq).sorted
                def str(k: String): String =
                  Option(c.get(k)).map(_.asText()).getOrElse("")
                Seq(str("hash"), str("serial"),
                  arr("issuerCN").mkString(","), arr("issuerON").mkString(","),
                  arr("subjectCN").mkString(","), arr("subjectON").mkString(","),
                  str("notBefore"), str("notAfter"), str("validDays"),
                  str("publicAlgorithm"), str("curve"),
                  arr("alt").mkString(",")).mkString("|")
              }
              def ourCert(c: graft.etl.CertParser.CertInfo): String =
                Seq(Option(c.hash).getOrElse(""),
                  Option(c.serial).getOrElse(""),
                  c.issuerCN.sorted.mkString(","),
                  c.issuerON.sorted.mkString(","),
                  c.subjectCN.sorted.mkString(","),
                  c.subjectON.sorted.mkString(","),
                  c.notBefore.toString, c.notAfter.toString,
                  c.validDays.toString,
                  Option(c.publicAlgorithm).getOrElse(""),
                  Option(c.curve).getOrElse(""),
                  c.alt.sorted.mkString(",")).mkString("|")
              val want = bodies.map { b =>
                Option(b.get("cert")).toSeq
                  .flatMap(_.elements().asScala.map(goldCert).toSeq)
                  .distinct.sorted
              }.filter(_.nonEmpty).map(_.mkString(";;")).sorted
              val got = rows.map(_.cert.map(ourCert).distinct.sorted)
                .filter(_.nonEmpty).toSeq.map(_.mkString(";;")).sorted
              if (want.nonEmpty || got.nonEmpty) {
                seen("cert") += 1
                if (want == got) match_("cert") += 1
                else misses("cert") ::= name
              }
              val wantCnt = bodies.flatMap(b =>
                Option(b.get("certCnt")).map(_.asText())).sorted
              if (wantCnt.nonEmpty) {
                val gotCnt = rows.map(_.cert).filter(_.nonEmpty)
                  .map(_.length.toString).toSeq.sorted
                seen("cert.cnt") += 1
                if (wantCnt == gotCnt) match_("cert.cnt") += 1
                else misses("cert.cnt") ::= name
              }
            }
            // rootId: the value is canonicalized to "SET" by tests.pl,
            // but its PRESENCE marks every save of a multi-save session
            // (db.c rootId on mid-saved sessions) — compare the count of
            // rootId-bearing bodies against our rows whose sessionId has
            // more than one emitted segment
            {
              val want = bodies.count(_.has("rootId"))
              val perSession = rows.groupBy(_.sessionId)
                .view.mapValues(_.length).toMap
              val got = rows.count(r => perSession(r.sessionId) > 1)
              if (want > 0 || got > 0) {
                seen("rootId") += 1
                if (want == got) match_("rootId") += 1
                else misses("rootId") ::= name
              }
            }
          } catch { case _: Exception => () }
        }
      }
    // pinned floors = the achieved level at round 3: every field fully
    // matches its golden except http.uri on socks5-reverse, where the
    // reference's hand-redacted .test disagrees with its own pcap
    // (golden says Sheepskin%20Boots, capture bytes only ever contain
    // sheepskin%20boots) — unmatchable without hardcoding.
    val floors = Map(
      "network.community_id" -> 134,
      "source.packets" -> 145, "source.bytes" -> 145,
      "destination.packets" -> 145, "destination.bytes" -> 145,
      "client.bytes" -> 145, "server.bytes" -> 145,
      "source.mac" -> 137, "destination.mac" -> 137,
      "tcpflags.syn" -> 108, "tcpflags.syn-ack" -> 108,
      "tcpflags.ack" -> 108, "tcpflags.psh" -> 108,
      "tcpflags.rst" -> 108, "tcpflags.fin" -> 108, "tcpflags.urg" -> 108,
      "http.key" -> 5, "http.value" -> 5,
      "http.cookieKey" -> 10, "http.cookieValue" -> 10,
      "http.method" -> 30, "http.host" -> 36, "http.path" -> 28,
      "http.uri" -> 28, "http.statuscode" -> 29,
      "http.requestHeader" -> 30, "http.responseHeader" -> 28,
      "http.request-referer" -> 12, "http.md5" -> 24,
      "http.useragent" -> 29,
      "dns.host" -> 19, "dns.qt" -> 18, "dns.qc" -> 18,
      "dns.opcode" -> 19, "dns.status" -> 16, "dns.ip" -> 9,
      "dns.nameserverHost" -> 8,
      "tls.ja3" -> 18, "tls.ja3s" -> 22, "tls.cipher" -> 22,
      "tls.version" -> 22,
      "icmp.type" -> 13, "icmp.code" -> 13, "network.vlan" -> 24,
      "email.smtpHello" -> 18, "email.src" -> 17, "email.dst" -> 17,
      "email.subject" -> 15, "email.id" -> 9, "email.host" -> 9,
      "email.ip" -> 8, "email.useragent" -> 7, "email.contentType" -> 11,
      "email.mimeVersion" -> 11, "email.header" -> 15,
      "quic.host" -> 5, "quic.version" -> 4, "quic.useragent" -> 3,
      "ssh.version" -> 4, "ssh.hassh" -> 3, "ssh.hasshServer" -> 3,
      "smb.share" -> 4, "smb.os" -> 4, "smb.domain" -> 4,
      "smb.user" -> 3, "smb.version" -> 4, "smb.filename" -> 2,
      "http.clientVersion" -> 29, "http.serverVersion" -> 28,
      "http.bodyMagic" -> 18,
      "tls.dstSessionId" -> 13, "tls.srcSessionId" -> 4,
      "dns.mailserverHost" -> 3, "dns.nameserverIp" -> 7,
      "irc.nick" -> 2, "irc.channel" -> 2,
      "krb5.realm" -> 2, "krb5.cname" -> 2, "krb5.sname" -> 2,
      "ldap.authtype" -> 2, "ldap.bindname" -> 2,
      "mysql.version" -> 4, "mysql.user" -> 3,
      "postgresql.user" -> 3, "postgresql.db" -> 3, "postgresql.app" -> 2,
      "socks.ip" -> 5, "socks.host" -> 6, "socks.port" -> 9,
      "dhcp.id" -> 1, "dhcp.mac" -> 1, "dhcp.type" -> 1,
      // round 4 additions: session-level scalars (uint32-wrapped length,
      // mid-save-surviving firstPacket/firstBytes, save-ordinal
      // segmentCnt, anchored payload8) and the remaining parser fields
      "length" -> 145, "totDataBytes" -> 145, "segmentCnt" -> 145,
      "protocol" -> 145,
      "tcpflags.srcZero" -> 108, "tcpflags.dstZero" -> 108,
      "srcPayload8" -> 129, "dstPayload8" -> 112,
      "initRTT" -> 104, "user" -> 5,
      "http.response-location" -> 5, "ssh.key" -> 2, "bgp.type" -> 1,
      "oracle.user" -> 1, "oracle.host" -> 1, "oracle.service" -> 1,
      "radius.user" -> 1, "radius.framedIp" -> 1, "radius.mac" -> 1,
      "smb.host" -> 2,
      // parseHTTPHeaderAll / parseSMTPHeaderAll capture-all header
      // fields+values (raw-direction attribution incl. the socks5-reverse
      // swap and http2 PUSH_PROMISE sides), auth fields, [headers-email]
      "http.requestHeaderField" -> 28, "http.requestHeaderValue" -> 28,
      "http.responseHeaderField" -> 28, "http.responseHeaderValue" -> 28,
      "http.user" -> 2, "http.authType" -> 2,
      "http.request-authorization" -> 2,
      "email.headerField" -> 10, "email.headerValue" -> 10,
      "email.header-x-elnk-trace" -> 1,
      // session tags replay ([override-ips], filenameOps, dontSaveBPFs /
      // esp stopSaving, parser tags, tcp anomaly queue replay, yara) and
      // the remaining ip-side fields
      "tags" -> 72, "srcOui" -> 132, "dstOui" -> 129, "socks.user" -> 2,
      // tests/plugins/test.c pre-save fields (LE int addrs, signed in
      // string.snow, override-ips enrichment of test.ip)
      "test.ip" -> 46, "test.number" -> 46, "test.string.snow" -> 46,
      "test.ASN" -> 46, "test.GEO" -> 46, "test.RIR" -> 46,
      // per-address enrichment (db.c geo_lookup merge) over the bundled
      // snapshot of the harness's doctored GeoLite2/rirFile fixtures;
      // aligned arrays re-derived via constraint propagation since .test
      // arrays are independently sorted
      "source.as.full" -> 66, "destination.as.full" -> 76,
      "source.geo" -> 86, "destination.geo" -> 94,
      "srcRIR" -> 35, "dstRIR" -> 89,
      "dns.ASN" -> 9, "dns.GEO" -> 9, "dns.RIR" -> 9,
      "dns.nameserverASN" -> 7, "dns.nameserverGEO" -> 7,
      "dns.nameserverRIR" -> 7,
      "dns.mailserverIp" -> 2, "dns.mailserverASN" -> 2,
      "dns.mailserverGEO" -> 2, "dns.mailserverRIR" -> 2,
      "email.ASN" -> 8, "email.GEO" -> 8, "email.RIR" -> 8,
      "socks.ASN" -> 5, "socks.GEO" -> 5, "socks.RIR" -> 4,
      "radius.framedASN" -> 1, "radius.framedGEO" -> 1,
      "radius.framedRIR" -> 1,
      "tls.ja3string" -> 18, "tls.ja3sstring" -> 22,
      // GRE carrier endpoints (packet.c:339-343) and X-Forwarded-For
      // (inet_aton member parse, http.c:131-139), each with enrichment
      "greIp" -> 3, "greASN" -> 3, "greGEO" -> 3, "greRIR" -> 3,
      "http.xffIp" -> 1, "http.xffASN" -> 1, "http.xffGEO" -> 1,
      "http.xffRIR" -> 1,
      // raw-punycode hosts, dhcp mac OUI, isis frame-type labels,
      // http body sha256 (supportSha256) + small UTF-8 request bodies.
      // http.requestBody floor is 5/6: on http-tcp-seq-issue the
      // reference's once-only first-chunk gate burned on out-of-order
      // arrival (its md5 equals ours, so the bytes are identical)
      "dns.puny" -> 1, "dhcp.oui" -> 1, "isis.msgType" -> 2,
      "http.sha256" -> 24, "http.requestBody" -> 5,
      // base64 MIME part digests, 4095-capped RFC2047 filenames,
      // first-decoded-chunk magic
      "email.md5" -> 3, "email.sha256" -> 3, "email.filename" -> 2,
      "email.bodyMagic" -> 1,
      // session 5-tuple + totals (inet_ntop-compressed v6, port-0 for
      // portless protocols), ms timestamps, store layout lengths
      "source.ip" -> 143, "destination.ip" -> 143,
      "source.port" -> 143, "destination.port" -> 143,
      "ipProtocol" -> 145, "firstPacket" -> 145, "lastPacket" -> 145,
      "network.bytes" -> 145, "network.packets" -> 145,
      "packetLen" -> 145,
      // full cert chains (lenient ASN.1 fallback for JDK-rejected certs,
      // dtls.c's reduced field set)
      "cert" -> 21,
      // FLAG_CNT companions: stored-array sizes (duplicates kept for
      // STR_ARRAY fields) vs golden <field>Cnt, all at 100%
      "cert.cnt" -> 21, "destination.mac.cnt" -> 137, "dhcp.id.cnt" -> 1,
      "dhcp.mac.cnt" -> 1, "dhcp.oui.cnt" -> 1, "dhcp.type.cnt" -> 1,
      "dns.host.cnt" -> 19, "dns.ip.cnt" -> 9, "dns.mailserverHost.cnt" -> 3,
      "dns.mailserverIp.cnt" -> 2, "dns.nameserverHost.cnt" -> 8, "dns.nameserverIp.cnt" -> 7,
      "dns.opcode.cnt" -> 19, "dns.puny.cnt" -> 1, "dns.qc.cnt" -> 18,
      "dns.qt.cnt" -> 18, "dns.status.cnt" -> 16, "dstOui.cnt" -> 129,
      "email.bodyMagic.cnt" -> 1, "email.contentType.cnt" -> 11, "email.dst.cnt" -> 17,
      "email.filename.cnt" -> 2, "email.header.cnt" -> 15, "email.headerValue.cnt" -> 10,
      "email.host.cnt" -> 9, "email.id.cnt" -> 9, "email.ip.cnt" -> 8,
      "email.md5.cnt" -> 3, "email.mimeVersion.cnt" -> 11, "email.sha256.cnt" -> 3,
      "email.smtpHello.cnt" -> 18, "email.src.cnt" -> 17, "email.subject.cnt" -> 15,
      "email.useragent.cnt" -> 7, "greIp.cnt" -> 3, "http.authType.cnt" -> 2,
      "http.bodyMagic.cnt" -> 18, "http.clientVersion.cnt" -> 29, "http.cookieKey.cnt" -> 10,
      "http.cookieValue.cnt" -> 10, "http.host.cnt" -> 36, "http.key.cnt" -> 5,
      "http.md5.cnt" -> 24, "http.method.cnt" -> 30, "http.path.cnt" -> 28,
      "http.request-authorization.cnt" -> 2, "http.request-referer.cnt" -> 12, "http.requestHeader.cnt" -> 30,
      "http.requestHeaderValue.cnt" -> 28, "http.responseHeader.cnt" -> 28, "http.responseHeaderValue.cnt" -> 28,
      "http.serverVersion.cnt" -> 28, "http.sha256.cnt" -> 24, "http.statuscode.cnt" -> 29,
      "http.uri.cnt" -> 29, "http.user.cnt" -> 2, "http.useragent.cnt" -> 29,
      "http.value.cnt" -> 5, "http.xffIp.cnt" -> 1, "irc.channel.cnt" -> 2,
      "irc.nick.cnt" -> 2, "krb5.cname.cnt" -> 2, "krb5.realm.cnt" -> 2,
      "krb5.sname.cnt" -> 2, "ldap.authtype.cnt" -> 2, "ldap.bindname.cnt" -> 2,
      "network.vlan.cnt" -> 24, "protocol.cnt" -> 145, "quic.host.cnt" -> 5,
      "quic.useragent.cnt" -> 3, "quic.version.cnt" -> 4, "radius.framedIp.cnt" -> 1,
      "radius.mac.cnt" -> 1, "smb.domain.cnt" -> 4, "smb.filename.cnt" -> 2,
      "smb.host.cnt" -> 2, "smb.os.cnt" -> 4, "smb.share.cnt" -> 4,
      "smb.user.cnt" -> 3, "smb.version.cnt" -> 4, "source.mac.cnt" -> 137,
      "srcOui.cnt" -> 132, "ssh.hassh.cnt" -> 3, "ssh.hasshServer.cnt" -> 3,
      "ssh.key.cnt" -> 2, "ssh.version.cnt" -> 4, "tags.cnt" -> 72,
      "tls.cipher.cnt" -> 22, "tls.ja3.cnt" -> 18, "tls.ja3s.cnt" -> 22,
      "tls.ja3sstring.cnt" -> 22, "tls.ja3string.cnt" -> 18, "tls.version.cnt" -> 22,
      "user.cnt" -> 5,
      // r13 full-census additions: node, store positions (after the
      // stopSaving truncation fix for ESP), the as.number/organization
      // components, and multi-save rootId presence — the census over all
      // 290 golden keys is now either compared here or excluded with a
      // written tests.pl canonicalization reason (@timestamp, fileId)
      "node" -> 145, "packetPos" -> 145,
      "source.as.number" -> 66, "destination.as.number" -> 76,
      "source.as.organization" -> 66, "destination.as.organization" -> 76,
      "rootId" -> 2)
    val allLabels = (fields.map(_._1) ++ Seq("cert", "rootId"))
      .flatMap(l => Seq(l, l + ".cnt")).filter(l => seen(l) > 0)
    for (label <- allLabels) {
      info(f"$label%-16s ${match_(label)}%3d / ${seen(label)}%3d" +
        (if (misses(label).nonEmpty)
           s"  missed: ${misses(label).take(6).mkString(", ")}" else ""))
      assert(match_(label) >= floors.getOrElse(label, 0),
        s"$label fidelity regressed: ${match_(label)} < ${floors.getOrElse(label, 0)}")
    }
    // r15: the census is ZERO-SLACK on top of the floors — every
    // (label, golden) miss must appear in this exclusion table with its
    // citation, so the two known artifacts can never silently absorb a
    // NEW miss on the same label. These are the only golden values in
    // the 290-key corpus the engine deliberately does not reproduce:
    //  - http.uri @ socks5-reverse: the hand-redacted golden
    //    (tests/pcap/socks5-reverse.test) says "Sheepskin%20Boots"
    //    while the pcap's own capture bytes only ever contain
    //    "sheepskin%20boots" — unmatchable without hardcoding the
    //    golden's casing over the wire bytes.
    //  - http.requestBody @ http-tcp-seq-issue: the reference's
    //    once-only first-chunk save gate (http.c:307) burned on a
    //    per-packet out-of-order arrival that a fully-reassembled
    //    stream never sees; the body BYTES are identical (http.md5
    //    matches on the same session).
    val excludedMisses: Map[String, Set[String]] = Map(
      "http.uri" -> Set("socks5-reverse"),
      "http.requestBody" -> Set("http-tcp-seq-issue"))
    for (label <- allLabels) {
      val unexplained =
        misses(label).toSet -- excludedMisses.getOrElse(label, Set.empty)
      assert(unexplained.isEmpty,
        s"$label has misses outside the exclusion table: " +
          unexplained.toSeq.sorted.mkString(", ") +
          " — fix the extraction or add an entry WITH a citation")
    }
    // and the table itself must stay honest: every excluded miss is a
    // real, still-present miss (an entry that stops missing must be
    // deleted, keeping compared-or-excluded exact at 290/290)
    for ((label, names) <- excludedMisses; n <- names)
      assert(misses(label).contains(n),
        s"exclusion ($label, $n) no longer misses — remove the entry")
  }
}
