package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Bpf, Decode, SessionBuilder}

/** Top-level for the Spark encoder (nested case classes don't encode). */
final case class BpfFuzzRow(id: Long, src_ip: String, dst_ip: String,
    src_port: Int, dst_port: Int, proto: Int, vlans: Seq[Int], wire: Int)

/** Null-bearing variant: Option fields encode as NULL columns — the
  * session-row shape for port-less (ICMP) and vlan-less traffic.
  */
final case class BpfFuzzNullRow(id: Long, src_ip: String, dst_ip: String,
    src_port: Option[Int], dst_port: Option[Int], proto: Int,
    vlans: Option[Seq[Int]], wire: Int)

/** BPF capture-filter subset (etl/Bpf): parser shapes, tcpdump
  * semantics (qualifier inheritance, directions, CIDR nets), agreement
  * between the packet-predicate and Column backends, the
  * dontSaveBPFs-style `expr:N` lists, and capture-filter integration
  * into batch sessionize.
  */
class BpfSpec extends AnyFunSuite with SparkSpecBase {

  private def pkt(srcIp: String = "10.1.2.3", dstIp: String = "10.9.9.9",
      srcPort: Int = 40000, dstPort: Int = 443, proto: Int = 6,
      vlans: Seq[Int] = Nil, wire: Int = 100): Decode.DecodedPacket =
    Decode.DecodedPacket("f", 0, 0L, 0L, wire + 16, wire, "", "",
      proto, srcIp, dstIp, srcPort, dstPort, 0, 0, 0L, 0L,
      Array.emptyByteArray, vlanIds = vlans)

  test("primitives, directions and protocol keywords") {
    assert(Bpf.packetPredicate("host 10.1.2.3")(pkt()))
    assert(Bpf.packetPredicate("host 10.9.9.9")(pkt()))
    assert(!Bpf.packetPredicate("src host 10.9.9.9")(pkt()))
    assert(Bpf.packetPredicate("dst host 10.9.9.9")(pkt()))
    assert(Bpf.packetPredicate("src or dst host 10.1.2.3")(pkt()))
    // bare `src <ip>` defaults the type to host
    assert(Bpf.packetPredicate("src 10.1.2.3")(pkt()))
    assert(Bpf.packetPredicate("net 10.0.0.0/8")(pkt()))
    assert(!Bpf.packetPredicate("net 10.64.0.0/10")(pkt()))
    assert(Bpf.packetPredicate("net 10.64.0.0/10")(pkt(srcIp = "10.100.0.1")))
    // reference shorthand net form
    assert(Bpf.packetPredicate("net 10.1")(pkt()))
    assert(Bpf.packetPredicate("port 443")(pkt()))
    assert(!Bpf.packetPredicate("src port 443")(pkt()))
    assert(Bpf.packetPredicate("portrange 30000-50000")(pkt()))
    assert(Bpf.packetPredicate("tcp")(pkt()))
    assert(!Bpf.packetPredicate("udp")(pkt()))
    assert(Bpf.packetPredicate("ip")(pkt()))
    assert(Bpf.packetPredicate("ip6")(pkt(srcIp = "2001:db8::1",
      dstIp = "2001:db8::2")))
    assert(Bpf.packetPredicate("vlan")(pkt(vlans = Seq(7))))
    assert(Bpf.packetPredicate("vlan 7")(pkt(vlans = Seq(7))))
    assert(!Bpf.packetPredicate("vlan 8")(pkt(vlans = Seq(7))))
    assert(Bpf.packetPredicate("less 200")(pkt(wire = 100)))
    assert(!Bpf.packetPredicate("greater 200")(pkt(wire = 100)))
  }

  test("boolean algebra, proto qualifiers and inheritance") {
    val p = pkt()
    assert(Bpf.packetPredicate("tcp and dst port 443 and net 10.0.0.0/8")(p))
    assert(Bpf.packetPredicate("udp or dst port 443")(p))
    assert(!Bpf.packetPredicate("not dst port 443")(p))
    assert(Bpf.packetPredicate("!(udp and port 53)")(p))
    // `tcp dst port 443` — single tcpdump primitive, proto AND port
    assert(Bpf.packetPredicate("tcp dst port 443")(p))
    assert(!Bpf.packetPredicate("udp dst port 443")(p))
    // qualifier inheritance: the bare 40000 reuses `src port`
    assert(Bpf.packetPredicate("src port 39999 or 40000")(p))
    assert(!Bpf.packetPredicate("src port 39999 or 40001")(p))
    // inherited qualifier carries the proto conjunct too
    assert(!Bpf.packetPredicate("udp src port 39999 or 40000")(p))
    // && / || spellings
    assert(Bpf.packetPredicate("tcp && port 443 || udp")(p))
  }

  test("malformed and unsupported forms fail loudly") {
    for (bad <- Seq("", "port", "host notanip", "port 99999",
      "portrange 50-20", "frobnicate 7", "ether host aa:bb",
      "tcp[13] == 2", "port 80 or", "(tcp", "80",
      // stray single & / | must not vanish in the lexer
      "tcp &", "& tcp", "tcp | udp"))
      intercept[IllegalArgumentException](Bpf.parse(bad))
    // vlan / len terms require their columns in the Column backend
    val f = Bpf.Fields(col("s"), col("d"), col("sp"), col("dp"), col("pr"))
    intercept[IllegalArgumentException](Bpf.column("vlan 3", f))
    intercept[IllegalArgumentException](Bpf.column("less 60", f))
  }

  test("packet predicate and Column backend agree") {
    import spark.implicits._
    val rows = for {
      o2 <- 0 until 16; port <- Seq(53, 80, 443, 31000)
      proto <- Seq(6, 17)
    } yield (s"10.${o2 * 16}.1.2", "192.168.0.9", 20000 + o2 * 1000,
      port, proto)
    val df = rows.toDF("src_ip", "dst_ip", "src_port", "dst_port", "proto")
    val fields = Bpf.Fields(col("src_ip"), col("dst_ip"), col("src_port"),
      col("dst_port"), col("proto"))
    for (expr <- Seq(
      "tcp and dst port 443",
      "net 10.64.0.0/10 or dst port 53",
      "src portrange 24000-29000 and not host 10.128.1.2",
      "ip and (udp or src port 20000)")) {
      val viaColumn = df.filter(Bpf.column(expr, fields))
        .as[(String, String, Int, Int, Int)].collect().toSet
      val pred = Bpf.packetPredicate(expr)
      val viaPacket = rows.filter { case (s, d, sp, dp, pr) =>
        pred(pkt(srcIp = s, dstIp = d, srcPort = sp, dstPort = dp,
          proto = pr))
      }.toSet
      assert(viaColumn == viaPacket, s"backends disagree on '$expr'")
    }
  }

  test("dontSaveBPFs-style lists: expr:N caps, last matching entry wins") {
    val entries = Seq("port 12345", "net 10.64.0.0/10:4", "tcp port 9:2")
    val parsed = Bpf.parseSaveList(entries)
    assert(parsed.map(_._2) == Seq(1, 4, 2))
    import spark.implicits._
    val df = Seq(
      ("10.65.0.1", "10.9.9.9", 12345, 80, 6), // port:1 then net:4 → last = 4
      ("10.65.0.1", "10.9.9.9", 1000, 80, 6), // net rule only → 4
      ("10.2.0.1", "10.9.9.9", 1000, 9, 6), // tcp:2 rule → 2
      ("10.2.0.1", "10.9.9.9", 1000, 80, 17)) // none → null
      .toDF("src_ip", "dst_ip", "src_port", "dst_port", "proto")
    val fields = Bpf.Fields(col("src_ip"),
      col("dst_ip"), col("src_port"), col("dst_port"), col("proto"))
    // rules.c:573-596 loads entries as in-order session-setup rules whose
    // field-ops overwrite _maxPacketsToSave — so the LAST match governs
    val cap = Bpf.maxPacketsToSave(entries, fields)
    assert(df.select(cap).as[Option[Int]].collect().toSeq ==
      Seq(Some(4), Some(4), Some(2), None))
    // order sensitivity: reversing the list flips the both-match row to
    // the port rule's default cap of 1
    val rev = Bpf.maxPacketsToSave(entries.reverse, fields)
    assert(df.select(rev).as[Option[Int]].collect().toSeq ==
      Seq(Some(1), Some(4), Some(2), None))
  }

  test("minPacketsSaveBPFs gate: last matching threshold governs") {
    import spark.implicits._
    val entries = Seq("udp port 53:3", "net 10.0.0.0/8:5")
    val df = Seq(
      ("10.1.1.1", "8.8.8.8", 5000, 53, 17, 2L), // both: last = net:5 → drop
      ("10.1.1.1", "8.8.8.8", 5000, 53, 17, 5L), // meets 5 → keep
      ("172.16.0.1", "8.8.8.8", 5000, 53, 17, 4L), // dns rule: need 3 → keep
      ("172.16.0.1", "9.9.9.9", 5000, 80, 6, 1L)) // no rule → keep
      .toDF("src_ip", "dst_ip", "src_port", "dst_port", "proto", "pkts")
    val fields = Bpf.Fields(col("src_ip"),
      col("dst_ip"), col("src_port"), col("dst_port"), col("proto"))
    val keep = Bpf.keepSpi(entries, fields, col("pkts"))
    assert(df.select(keep).as[Boolean].collect().toSeq ==
      Seq(false, true, true, true))
    // reversed list: the both-match row now needs only 3 (udp rule last)
    val keepRev = Bpf.keepSpi(entries.reverse, fields, col("pkts"))
    assert(df.select(keepRev).as[Boolean].collect().toSeq ==
      Seq(false, true, true, true))
    val df2 = Seq(("10.1.1.1", "8.8.8.8", 5000, 53, 17, 3L))
      .toDF("src_ip", "dst_ip", "src_port", "dst_port", "proto", "pkts")
    assert(df2.select(Bpf.keepSpi(entries, fields, col("pkts")))
      .as[Boolean].collect().toSeq == Seq(false)) // net:5 last → 3 < 5
    assert(df2.select(Bpf.keepSpi(entries.reverse, fields, col("pkts")))
      .as[Boolean].collect().toSeq == Seq(true)) // udp:3 last → 3 >= 3
  }

  test("streaming ingest honors the capture filter (batch parity)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("bpf-stream").toString
    val src = Files.readAllBytes(Paths.get(
      "/root/reference/tests/pcap/socks-http-example.pcap"))
    Files.write(Paths.get(dir, "a.pcap"), src)
    // a single-record pcap whose first packet is shifted `plusSec` into
    // the future AND given a fresh src-ip octet: it passes the filter
    // (src port still 53533) but opens its OWN session, so the earlier
    // flows' state can time out as the watermark passes them
    def latePcap(name: String, plusSec: Int, srcOctet: Int): Unit = {
      val incl = java.nio.ByteBuffer.wrap(src, 32, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      val out = java.util.Arrays.copyOfRange(src, 0, 24 + 16 + incl)
      val bb = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(24, bb.getInt(24) + plusSec)
      out(40 + 14 + 12 + 3) = srcOctet.toByte // ipv4 saddr last octet
      Files.write(Paths.get(dir, name), out)
    }
    val q = graft.streaming.StreamSessionize
      .fromPcapDir(spark, dir, bpf = Some("tcp port 53533"))
      .writeStream.format("memory").queryName("bpf_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      latePcap("b.pcap", 5000, 7); q.processAllAvailable()
      latePcap("c.pcap", 10000, 8); q.processAllAvailable()
    } finally q.stop()
    // only sessions from the original capture window (the late
    // watermark-driver packets open their own far-future sessions)
    val origMax = SessionBuilder.sessionize(spark, dir + "/a.pcap")
      .collect().map(_.lastPacket).max
    val got = spark.table("bpf_stream")
      .filter(col("firstPacket") <= origMax)
      .select("srcIp", "srcPort", "dstIp", "dstPort").collect().toSet
    val want = SessionBuilder.sessionize(spark,
      dir + "/a.pcap", bpf = Some("tcp port 53533"))
      .toDF().select("srcIp", "srcPort", "dstIp", "dstPort").collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("bpf: rule fields drive the rules engine") {
    import spark.implicits._
    val df = Seq(
      ("10.1.1.1", "8.8.8.8", 5000, 53, 17),
      ("10.1.1.1", "9.9.9.9", 5000, 80, 6))
      .toDF("src_ip", "dst_ip", "src_port", "dst_port", "proto")
    val fields = graft.etl.Bpf.Fields(col("src_ip"), col("dst_ip"),
      col("src_port"), col("dst_port"), col("proto"))
    val out = graft.ops.Rules(df, Seq(
      graft.ops.Rules.bpfRule("tag-dns", "udp port 53", fields,
        Seq(graft.ops.Rules.AddTag("dns-traffic"))),
      graft.ops.Rules.bpfRule("drop-web", "tcp port 80", fields,
        Seq(graft.ops.Rules.DropSession))))
    val rows = out.select("dst_port", "tags")
      .as[(Int, Seq[String])].collect().toSeq
    assert(rows == Seq((53, Seq("dns-traffic"))))
  }

  test("capture filter drops flows before sessionize") {
    val pcap = "/root/reference/tests/pcap/socks-http-example.pcap"
    val all = SessionBuilder.sessionize(spark, pcap)
    val one = SessionBuilder.sessionize(spark, pcap,
      bpf = Some("tcp port 53533"))
    val a = all.collect()
    val f = one.collect()
    assert(a.length == 3) // all three flows target :1080; ephemerals differ
    assert(f.nonEmpty && f.length < a.length)
    assert(f.forall(s => s.srcPort == 53533 || s.dstPort == 53533))
    // equivalent post-hoc filter on full sessions keeps the same flows
    val expect = a.filter(s => s.srcPort == 53533 || s.dstPort == 53533)
      .map(s => (s.srcIp, s.srcPort, s.dstIp, s.dstPort)).toSet
    assert(f.map(s => (s.srcIp, s.srcPort, s.dstIp, s.dstPort)).toSet
      == expect)
  }

  test("fuzz: packet-predicate and Column backends agree on random filters") {
    // the same filter compiles to TWO independent implementations — the
    // map-side DecodedPacket predicate and the codegen'd session Column
    // (ip_in_cidr expression) — so random well-formed expressions over
    // the whole grammar form a self-differential oracle: any divergence
    // (direction inheritance, CIDR edge, vlan/len plumbing, negation) is
    // a real bug in one of them. Seeded LCG: failures reproduce.
    import spark.implicits._
    var seed = 0xb5f5eedL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    val ips4 = Seq("10.1.2.3", "10.9.9.9", "10.100.0.1", "192.168.7.7",
      "172.16.3.4", "8.8.8.8")
    val ips6 = Seq("2001:db8::1", "2001:db8::2", "fd00::9")
    val cidrs = Seq("10.0.0.0/8", "10.64.0.0/10", "192.168.0.0/16",
      "172.16.0.0/12", "8.8.8.0/24", "2001:db8::/32", "10.1", "10.9")
    // packet universe: every combination the grammar can discriminate
    val pkts = (0 until 400).map { i =>
      val v6 = nextInt(100) < 25
      val sIp = if (v6) oneOf(ips6) else oneOf(ips4)
      val dIp = if (v6) oneOf(ips6) else oneOf(ips4)
      val sPort = oneOf(Seq(53, 80, 443, 1080, 40000, 53533, nextInt(65536)))
      val dPort = oneOf(Seq(53, 80, 443, 1080, 40000, 53533, nextInt(65536)))
      val proto = oneOf(Seq(6, 6, 17, 1, 47))
      val vlans = nextInt(3) match {
        case 0 => Nil
        case 1 => Seq(7)
        case _ => Seq(7, 12)
      }
      val wire = 40 + nextInt(1500)
      (i.toLong, pkt(srcIp = sIp, dstIp = dIp, srcPort = sPort,
        dstPort = dPort, proto = proto, vlans = vlans, wire = wire),
        BpfFuzzRow(i.toLong, sIp, dIp, sPort, dPort, proto, vlans, wire))
    }
    val df = pkts.map(_._3).toDF().cache()
    val fields = Bpf.Fields(col("src_ip"), col("dst_ip"), col("src_port"),
      col("dst_port"), col("proto"), vlans = Some(col("vlans")),
      len = Some(col("wire")))
    def leaf(): String = nextInt(8) match {
      case 0 =>
        val d = oneOf(Seq("", "src ", "dst ", "src or dst "))
        s"${d}host ${oneOf(ips4 ++ ips6)}"
      case 1 =>
        val d = oneOf(Seq("", "src ", "dst "))
        s"${d}net ${oneOf(cidrs)}"
      case 2 =>
        val d = oneOf(Seq("", "src ", "dst "))
        s"${d}port ${oneOf(Seq(53, 80, 443, 1080, 40000, 53533))}"
      case 3 =>
        val lo = nextInt(50000)
        s"portrange $lo-${lo + 1 + nextInt(15000)}"
      case 4 => oneOf(Seq("tcp", "udp", "icmp", "ip", "ip6"))
      case 5 => oneOf(Seq("vlan", "vlan 7", "vlan 12", "vlan 99"))
      case 6 => s"${oneOf(Seq("less", "greater"))} ${40 + nextInt(1500)}"
      case _ =>
        // bare src/dst ip defaults the type to host
        s"${oneOf(Seq("src", "dst"))} ${oneOf(ips4)}"
    }
    def gen(depth: Int): String =
      if (depth <= 0 || nextInt(100) < 40) leaf()
      else nextInt(5) match {
        case 0 | 1 => s"(${gen(depth - 1)}) and (${gen(depth - 1)})"
        case 2 | 3 => s"(${gen(depth - 1)}) or (${gen(depth - 1)})"
        case _     => s"not (${gen(depth - 1)})"
      }
    for (k <- 0 until 150) {
      val e = gen(3)
      val viaPred = pkts.filter(t => Bpf.packetPredicate(e)(t._2))
        .map(_._1).toSet
      val viaCol = df.filter(Bpf.column(e, fields))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(viaCol == viaPred,
        s"backend divergence on case $k: $e\n  pred-only: ${
          (viaPred -- viaCol).take(5)}\n  col-only: ${
          (viaCol -- viaPred).take(5)}")
    }
  }

  test("fuzz: backends agree on NULL/absent fields (three-valued logic)") {
    // port-less (ICMP/GRE) traffic decodes with port 0 on the packet
    // side but stores NULL port columns on the session side; vlan-less
    // rows store a NULL array. The Column backend's negation must be
    // is-not-true (classical) over those NULLs — a bare three-valued
    // `!` keeps NULL and silently drops every ICMP session from
    // `not port 53`, diverging from the map-side predicate (and from
    // rules.c's C semantics, where a missing field just fails the term).
    import spark.implicits._
    var seed = 0x3f01dbeeL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    val ips4 = Seq("10.1.2.3", "10.9.9.9", "10.100.0.1", "192.168.7.7",
      "8.8.8.8")
    val ips6 = Seq("2001:db8::1", "fd00::9")
    val cidrs = Seq("10.0.0.0/8", "10.64.0.0/10", "192.168.0.0/16",
      "8.8.8.0/24", "2001:db8::/32", "10.1")
    val ports = Seq(53, 80, 443, 1080, 40000)
    val pkts = (0 until 400).map { i =>
      val proto = oneOf(Seq(6, 17, 1, 1, 47, 58)) // icmp/gre-heavy
      val hasPorts = proto == 6 || proto == 17
      val v6 = proto == 58 || nextInt(100) < 20
      val sIp = if (v6) oneOf(ips6) else oneOf(ips4)
      val dIp = if (v6) oneOf(ips6) else oneOf(ips4)
      val sPort = if (hasPorts) oneOf(ports :+ nextInt(65535) + 1) else 0
      val dPort = if (hasPorts) oneOf(ports :+ nextInt(65535) + 1) else 0
      val vlans = nextInt(3) match {
        case 0 => None
        case 1 => Some(Seq(7))
        case _ => Some(Seq(7, 12))
      }
      val wire = 40 + nextInt(1500)
      (i.toLong,
        pkt(srcIp = sIp, dstIp = dIp, srcPort = sPort, dstPort = dPort,
          proto = proto, vlans = vlans.getOrElse(Nil), wire = wire),
        BpfFuzzNullRow(i.toLong, sIp, dIp,
          if (hasPorts) Some(sPort) else None,
          if (hasPorts) Some(dPort) else None, proto, vlans, wire))
    }
    val df = pkts.map(_._3).toDF().cache()
    val fields = Bpf.Fields(col("src_ip"), col("dst_ip"), col("src_port"),
      col("dst_port"), col("proto"), vlans = Some(col("vlans")),
      len = Some(col("wire")))
    def leaf(): String = nextInt(8) match {
      case 0 =>
        val d = oneOf(Seq("", "src ", "dst ", "src or dst "))
        s"${d}host ${oneOf(ips4 ++ ips6)}"
      case 1 =>
        val d = oneOf(Seq("", "src ", "dst "))
        s"${d}net ${oneOf(cidrs)}"
      case 2 =>
        val d = oneOf(Seq("", "src ", "dst "))
        s"${d}port ${oneOf(ports)}"
      case 3 =>
        val lo = 1 + nextInt(50000) // 0 is indistinguishable from "no port"
        s"portrange $lo-${lo + 1 + nextInt(15000)}"
      case 4 => oneOf(Seq("tcp", "udp", "icmp", "icmp6", "gre", "ip", "ip6"))
      case 5 => oneOf(Seq("vlan", "vlan 7", "vlan 12", "vlan 99"))
      case 6 => s"${oneOf(Seq("less", "greater"))} ${40 + nextInt(1500)}"
      case _ => s"${oneOf(Seq("src", "dst"))} ${oneOf(ips4)}"
    }
    def gen(depth: Int): String =
      if (depth <= 0 || nextInt(100) < 35) leaf()
      else nextInt(5) match {
        case 0 | 1 => s"(${gen(depth - 1)}) and (${gen(depth - 1)})"
        case 2     => s"(${gen(depth - 1)}) or (${gen(depth - 1)})"
        // negation-heavy: the NULL corners live under `not`
        case _     => s"not (${gen(depth - 1)})"
      }
    for (k <- 0 until 150) {
      val e = gen(3)
      val viaPred = pkts.filter(t => Bpf.packetPredicate(e)(t._2))
        .map(_._1).toSet
      val viaCol = df.filter(Bpf.column(e, fields))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(viaCol == viaPred,
        s"3VL backend divergence on case $k: $e\n  pred-only: ${
          (viaPred -- viaCol).take(5)}\n  col-only: ${
          (viaCol -- viaPred).take(5)}")
    }
  }
}
