package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Bpf, Decode, SessionBuilder}

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
}
