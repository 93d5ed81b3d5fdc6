package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Decode, Pcap, SessionBuilder}
import graft.expr.Parser

/** Robustness under hostile input: at capture scale, truncated and
  * bit-flipped pcap files (and user-typed garbage expressions) are
  * routine — every parser must degrade (empty iterator / parse error),
  * never throw unexpectedly or hang. Seeded: failures reproduce.
  */
class FuzzSpec extends AnyFunSuite {

  test("random bytes never crash the pcap parser or decoder") {
    val r = new scala.util.Random(42)
    (0 until 300).foreach { i =>
      val len = r.nextInt(4096)
      val b = new Array[Byte](len)
      r.nextBytes(b)
      // magic sometimes planted so the record walker actually runs
      if (i % 3 == 0 && len >= 4) {
        b(0) = 0xd4.toByte; b(1) = 0xc3.toByte; b(2) = 0xb2.toByte; b(3) = 0xa1.toByte
      }
      Pcap.parseFile(b, s"fuzz$i").foreach { p =>
        Decode.decode(p) // Option result; must not throw
      }
    }
  }

  test("bit-flipped real captures never crash parse, decode, or sessionize") {
    val r = new scala.util.Random(7)
    val base = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/pcap/socks-http-example.pcap"))
    (0 until 60).foreach { _ =>
      val b = base.clone()
      (0 until 40).foreach { _ =>
        val i = r.nextInt(b.length)
        b(i) = (b(i) ^ (1 << r.nextInt(8))).toByte
      }
      Pcap.parseFile(b, "fuzz").foreach(p => Decode.decode(p))
    }
  }

  test("bit-flipped payloads never crash the app-layer parser chain") {
    // The full per-session pipeline (classify + every field parser +
    // reassembly) over mutated captures — parsers see hostile payloads
    // routinely at capture scale and must tag/skip, never throw. A mix
    // of protocol fixtures exercises http, dns, tls, smtp, ssh, smb,
    // krb5/ldap (ASN.1 walkers), quic and the misc classifiers.
    val fixtures = Seq("socks-http-example.pcap", "dns-mx.pcap",
      "https-generalizedtime.pcap", "smtp-subject-8859-b.pcap",
      "ssh2.pcap", "smb-smb1-ascii.pcap", "v6-http.pcap")
    val r = new scala.util.Random(17)
    fixtures.foreach { f =>
      val path = java.nio.file.Paths.get(s"/root/reference/tests/pcap/$f")
      if (java.nio.file.Files.exists(path)) {
        val base = java.nio.file.Files.readAllBytes(path)
        (0 until 12).foreach { _ =>
          val b = base.clone()
          // flip only beyond the global header so the record walker runs
          (0 until 60).foreach { _ =>
            val i = 24 + r.nextInt(b.length - 24)
            b(i) = (b(i) ^ (1 << r.nextInt(8))).toByte
          }
          val decoded = Pcap.parseFile(b, f).flatMap(Decode.decode(_)).toSeq
          decoded.groupBy(p => SessionBuilder.sessionKey(p)).foreach {
            case (key, ps) =>
              SessionBuilder.buildSessions(key, ps.iterator, "fuzz",
                testRules = true).foreach(_ => ())
          }
        }
      }
    }
  }

  test("truncations at every boundary degrade to a shorter packet list") {
    val base = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/pcap/http-301-get.pcap"))
    val full = Pcap.parseFile(base, "t").size
    val r = new scala.util.Random(11)
    (0 until 100).foreach { _ =>
      val cut = r.nextInt(base.length)
      val n = Pcap.parseFile(java.util.Arrays.copyOf(base, cut), "t").size
      assert(n <= full)
    }
  }

  test("garbage expressions parse or raise IllegalArgumentException") {
    val r = new scala.util.Random(13)
    val alphabet = "ab=!&|()[]<>*/\\\"' .:$-0129\t"
    (0 until 500).foreach { _ =>
      val s = Seq.fill(r.nextInt(40))(alphabet(r.nextInt(alphabet.length))).mkString
      try { Parser.parse(s); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("garbage bpf filters parse or raise IllegalArgumentException; predicates run") {
    val r = new scala.util.Random(29)
    val toks = Seq("tcp", "udp", "ip", "ip6", "host", "net", "port",
      "portrange", "src", "dst", "or", "and", "not", "!", "&&", "||",
      "(", ")", "vlan", "less", "greater", "10.1.2.3", "10.0.0.0/8",
      "443", "80-90", "7", "&", "|", "frob", "2001:db8::1", ":")
    val pkt = graft.etl.Decode.DecodedPacket("f", 0, 0L, 0L, 116, 100,
      "", "", 6, "10.1.2.3", "10.9.9.9", 40000, 443, 0, 0, 0L, 0L,
      Array.emptyByteArray)
    (0 until 500).foreach { _ =>
      val s = Seq.fill(r.nextInt(12))(toks(r.nextInt(toks.length)))
        .mkString(" ")
      try {
        val n = graft.etl.Bpf.parse(s)
        // whatever parsed must evaluate on a packet without throwing
        graft.etl.Bpf.packetPredicate(n)(pkt)
        ()
      } catch { case _: IllegalArgumentException => () }
    }
    // raw character soup exercises the lexer's fail-loudly contract
    val alphabet = "tcpudporandhstne()!&|0123456789./: "
    (0 until 300).foreach { _ =>
      val s = Seq.fill(r.nextInt(25))(alphabet(r.nextInt(alphabet.length)))
        .mkString
      try { graft.etl.Bpf.parse(s); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("pe/magic module rules survive random payloads and header soup") {
    val r = new scala.util.Random(31)
    val rules = graft.ops.Yara.parse(
      """rule P { condition: pe.number_of_sections > 0 and
        |  pe.number_of_imports >= 0 and
        |  pe.imphash() != "x" and
        |  pe.exports("f") or pe.dll_name contains "d" or
        |  pe.version_info["CompanyName"] matches /corp/i or
        |  pe.imports("kernel32.dll") > 0 or
        |  pe.number_of_resources > 0 or
        |  pe.resources[0].type == 16 or
        |  pe.resources[0].name_string iendswith "x" or
        |  pe.rich_signature.toolid(0x5d) or
        |  pe.overlay.size > 0 or
        |  for any s in pe.sections : ( s.raw_data_size > 0 ) or
        |  magic.type() contains "executable" }""".stripMargin)
    (0 until 300).foreach { i =>
      val len = r.nextInt(2048)
      val b = new Array[Byte](len)
      r.nextBytes(b)
      if (i % 2 == 0 && len > 0x40) {
        // plant MZ + a random e_lfanew so the PE walker actually runs
        b(0) = 'M'; b(1) = 'Z'
        b(0x3c) = (r.nextInt(256) - 128).toByte
      }
      graft.ops.Yara.scan(rules, b) // must not throw or hang
    }
  }

  test("garbage yara rules parse or raise IllegalArgumentException; scans terminate") {
    val r = new scala.util.Random(77)
    // biased toward condition-grammar tokens so the parser's deep paths
    // (for-loops, of-sets, ranges, @/!/#/$ terms) actually get exercised
    val toks = Seq("rule", "R", "{", "}", "strings:", "condition:",
      "$a", "=", "\"x\"", "$b", "/a+/", "{ 41 ?? }", "for", "any", "all",
      "of", "them", "in", "(", ")", "..", ":", "i", "#a", "@a", "!a",
      "[", "]", "1", "2", "0x7fffffff", "and", "or", "not", "<", ">",
      "==", "filesize", "uint16", "int8be", "nocase", "wide", ",", "*",
      // arithmetic/bitwise grammar (round 8): nested reads, precedence
      // climbing, undefined propagation must all survive token soup
      "+", "-", "\\", "%", "&", "|", "^", "~", "<<", ">>", "uint32",
      "64KB", "true", "false",
      // round-9 module grammar: section/import/export/magic tokens
      "pe.sections", ".name", ".raw_data_size", "pe.exports",
      "pe.imphash", "pe.dll_name", "magic.type", "magic.mime_type",
      "contains", "startswith", "iendswith", "section",
      "pe.number_of_sections", "pe.number_of_exports")
    val payload = "some payload with x and A bytes".getBytes("ISO-8859-1")
    (0 until 400).foreach { _ =>
      val s = Seq.fill(r.nextInt(30))(toks(r.nextInt(toks.length)))
        .mkString(" ")
      try {
        val rules = graft.ops.Yara.parse(s)
        // whatever parsed must also evaluate without throwing or hanging
        graft.ops.Yara.scan(rules, payload)
        ()
      } catch { case _: IllegalArgumentException => () }
    }
  }
}
