package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** Golden-field fidelity for the Kerberos/LDAP/QUIC/SMB extractors vs the
  * reference's committed session dumps (tests/pcap/<name>.test).
  */
class Krb5LdapQuicSmbSpec extends AnyFunSuite with SparkSpecBase {

  private val mapper = new ObjectMapper()
  private def body(name: String) =
    mapper.readTree(new java.io.File(s"/root/reference/tests/pcap/$name.test"))
      .get("sessions3").elements().asScala.next().get("body")
  private def strs(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
    if (n == null) Nil else n.elements().asScala.map(_.asText()).toSeq.sorted

  test("krb5 tcp and udp: realm/cname/sname") {
    for (name <- Seq("krb5-tcp", "krb5-udp")) {
      val got = SessionBuilder.sessionizeRef(spark,
        s"/root/reference/tests/pcap/$name.pcap").collect()
        .filter(_.protocol.contains("krb5"))
      assert(got.nonEmpty, name)
      val g = got.head
      val w = body(name).get("krb5")
      assert(g.krb5Realm.sorted == strs(w.get("realm")), s"$name realm")
      assert(g.krb5Cname.sorted == strs(w.get("cname")), s"$name cname")
      assert(g.krb5Sname.sorted == strs(w.get("sname")), s"$name sname")
    }
  }

  test("ldap: authtype + bindname") {
    for (name <- Seq("ldap-simpleauth", "ldap-and-search")) {
      val got = SessionBuilder.sessionizeRef(spark,
        s"/root/reference/tests/pcap/$name.pcap").collect()
        .filter(_.protocol.contains("ldap"))
      assert(got.nonEmpty, name)
      val g = got.head
      val w = body(name).get("ldap")
      assert(g.ldapAuthtype.sorted == strs(w.get("authtype")), s"$name authtype")
      assert(g.ldapBindname.sorted == strs(w.get("bindname")), s"$name bindname")
    }
  }

  test("ldap-ssl: STARTTLS remainder classifies as tls too") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/ldap-ssl.pcap").collect()
    assert(got.nonEmpty)
    val protos = got.head.protocol
    assert(protos.contains("ldap") && protos.contains("tls"), protos.toString)
  }

  test("quic: host/useragent/version for Q024-Q043") {
    for (name <- Seq("quic24-wireshark", "quic33-wireshark", "quic34", "quic43")) {
      val got = SessionBuilder.sessionizeRef(spark,
        s"/root/reference/tests/pcap/$name.pcap").collect()
        .filter(_.protocol.contains("quic"))
      assert(got.nonEmpty, name)
      val g = got.head
      val w = body(name).get("quic")
      assert(g.quicHost.sorted == strs(w.get("host")), s"$name host")
      assert(g.quicUseragent.sorted == strs(w.get("useragent")), s"$name ua")
      assert(g.quicVersion.sorted == strs(w.get("version")), s"$name version")
    }
  }

  test("quic: classify needles fire on EITHER direction (quic.c:323-329)") {
    import graft.etl.QuicParser
    def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val prst = Array.fill[Byte](9)(0x40) ++ "PRST".getBytes ++
      Array.fill[Byte](8)(0)
    // a PRST from the server side alone tags quic (quic_add, either which)
    assert(QuicParser.parse(Nil, Seq(prst)).exists(_.tagged))
    assert(QuicParser.parse(Seq(prst), Nil).exists(_.tagged))
    // dispatch floor: the needle sits at 9..12, 12 bytes can't match
    assert(QuicParser.parse(Seq(prst.take(12)), Nil).isEmpty)
    // a dst-side Q043 long-header packet with a readable frame header
    // tags too (the registered parser reads both directions)
    val q43 = bs(0x0d) ++ bs(1, 2, 3, 4, 5, 6, 7, 8) ++ "Q043".getBytes ++
      bs(9) ++ Array.fill[Byte](12)(0) ++
      bs(0xa0, 1) ++ Array.fill[Byte](100)('x')
    assert(QuicParser.parse(Nil, Seq(q43)).exists(_.tagged))
    // Q05x still needs BOTH directions (quic.c:220-239)
    val q5 = bs(0xc1) ++ "Q050".getBytes ++ Array.fill[Byte](110)(0)
    assert(QuicParser.parse(Seq(q5), Nil).isEmpty)
    assert(QuicParser.parse(Seq(q5), Seq(q5)).exists(_.tagged))
  }

  test("smb: domain/user/host/os/version/share/filename") {
    // smb-port80 has no smb body in its golden (classification only)
    for (name <- Seq("smb-smbclient", "smb-smb1-ascii", "smb-port80",
        "smbtorture-ntlmssp", "smbtorture-ntlmssp-moloch-crash")) {
      val got = SessionBuilder.sessionizeRef(spark,
        s"/root/reference/tests/pcap/$name.pcap").collect()
        .filter(_.protocol.contains("smb"))
      assert(got.nonEmpty, name)
      val g = got.head
      val w = body(name).get("smb")
      def check(field: String, actual: Seq[String]): Unit =
        assert(actual.sorted == (if (w == null) Nil else strs(w.get(field))),
          s"$name $field")
      check("domain", g.smbDomain)
      check("user", g.smbUser)
      check("host", g.smbHost)
      check("os", g.smbOs)
      check("version", g.smbVersion)
      check("share", g.smbShare)
      check("filename", g.smbFilename)
    }
  }
}
