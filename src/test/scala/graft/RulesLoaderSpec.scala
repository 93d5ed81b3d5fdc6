package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.model.FieldRegistry
import graft.query.RulesLoader
import graft.query.RulesLoader._

/** The capture rules-file loader (tests/rules.yaml format; engine
  * capture/rules.c) compiled against the session registry and checked
  * against the REFERENCE'S OWN rules file: the loaded predicates must
  * reproduce the hardcoded golden-replay tags (etl/SessionRules) on the
  * same inputs, and the C quirks — one position per field with values
  * OR-merged across modifier variants, and the match-switch fall-through
  * that turns every modifier into a substring test (rules.c:794-816, no
  * break) — are pinned explicitly.
  */
class RulesLoaderSpec extends AnyFunSuite with SparkSpecBase {

  private def refRules: Seq[LoadedRule] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/rules.yaml")),
      java.nio.charset.StandardCharsets.UTF_8)
    RulesLoader.load(text, FieldRegistry.sessions)
  }

  test("the reference rules.yaml loads: names, whens, ops") {
    val rs = refRules
    assert(rs.map(_.name) == Seq("Don't save fields example2",
      "socks test", "ip test", "only syn"))
    assert(rs.map(_.when) == Seq("fieldSet", "fieldSet", "fieldSet",
      "beforeFinalSave"))
    assert(rs(0).ops == Seq(AddToField("protocols", "protocol",
      "tlsrulestest")))
    assert(rs(1).ops == Seq(AddToField("protocols", "protocol",
      "socksipset")))
    assert(rs(3).ops == Seq(SpecialOp("_dontSaveSPI", 1)))
    assert(rs.forall(_.bpf.isEmpty))
  }

  test("loaded predicates reproduce the golden-replay tags") {
    val sess = spark
    import sess.implicits._
    // (protocol, httpHost, socksIp, srcIp, dstPort, expected marker tags)
    val cases = Seq(
      (Seq("tcp", "tls"), Seq("www.aol.com"), null: String, "1.2.3.4", 80,
        Seq("tlsrulestest")),
      (Seq("tcp", "tls"), Seq("x.example.com"), null: String, "1.2.3.4", 80,
        Seq("tlsrulestest")), // ends with ample.com
      (Seq("tcp", "tls"), Seq("a.b.c.d"), null: String, "1.2.3.4", 80,
        Seq("tlsrulestest")), // contains b.c
      (Seq("tcp", "tls"), Seq("bl.ah.org"), null: String, "1.2.3.4", 80,
        Seq("tlsrulestest")), // starts with bl.a
      (Seq("tcp"), Seq("www.aol.com"), null: String, "1.2.3.4", 80,
        Nil), // no tls protocol
      (Seq("tcp", "tls"), Seq("other.org"), null: String, "1.2.3.4", 80,
        Nil),
      (Seq("tcp"), Nil, "74.125.131.103", "1.2.3.4", 80,
        Seq("socksipset")),
      (Seq("udp"), Nil, null: String, "10.44.100.7", 443,
        Seq("iprulztest")),
      (Seq("udp"), Nil, null: String, "2001:06f8::1", 5353,
        Seq("iprulztest")),
      (Seq("udp"), Nil, null: String, "10.44.101.7", 443, Nil),
      (Seq("udp"), Nil, null: String, "10.44.100.7", 80, Nil))
    val df = cases.zipWithIndex.map { case ((p, h, s, ip, dp, _), i) =>
      (i, p, h, s, ip, dp)
    }.toDF("i", "protocol", "httpHost", "socksIp", "srcIp", "dstPort")
    val rs = refRules.filter(_.when == "fieldSet")
    val tagged = RulesLoader.applySpi(df, rs)
      .select(col("i"), col("protocol")).as[(Int, Seq[String])]
      .collect().toMap
    cases.zipWithIndex.foreach { case ((p, h, s, ip, dp, want), i) =>
      val got = tagged(i).filterNot(p.contains)
      assert(got.sorted == want.sorted, s"case $i")
      // and the hardcoded golden-replay hook agrees
      val hard = graft.etl.SessionRules.protocolTags(ip, dp, s, h, p)
      assert(hard.sorted == want.sorted, s"SessionRules case $i")
    }
  }

  test("modifier fall-through: ,endsWith matches mid-value (rules.c:794)") {
    val sess = spark
    import sess.implicits._
    val df = Seq((0, Seq("tls"), Seq("ample.com.evil.org")))
      .toDF("i", "protocol", "httpHost")
    val rs = refRules.filter(_.name == "Don't save fields example2")
    val out = RulesLoader.applySpi(df, rs)
      .select(col("protocol")).as[Seq[String]].collect().head
    assert(out.contains("tlsrulestest"))
  }

  test("_dontSaveSPI drops matching rows; syn-only rule semantics") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (1, 2, 1, 0), // syn-only: dropped
      (2, 2, 1, 1), // dst answered: kept
      (3, 0, 1, 0), // no syn: kept
      (4, 2, 2, 0)  // 2 src packets: kept
    ).toDF("id", "tcpflagsSyn", "srcPackets", "dstPackets")
    val rs = refRules.filter(_.when == "beforeFinalSave")
    val kept = RulesLoader.applySpi(df, rs).select("id")
      .as[Int].collect().toSet
    assert(kept == Set(2, 3, 4))
  }

  test("_minPacketsBeforeSavingSPI and _maxPacketsToSave semantics") {
    val sess = spark
    import sess.implicits._
    val yaml =
      """version: 1
        |rules:
        |  - name: "few"
        |    when: "beforeFinalSave"
        |    fields:
        |      port.dst: 9999
        |    ops:
        |      _minPacketsBeforeSavingSPI: 3
        |  - name: "trunc"
        |    when: "beforeFinalSave"
        |    fields:
        |      port.dst: 8888
        |    ops:
        |      _maxPacketsToSave: 2
        |""".stripMargin
    val rs = RulesLoader.load(yaml, FieldRegistry.sessions)
    val df = Seq(
      (1, 9999, 2L, Seq(10L, 20L), Seq(4, 5)),
      (2, 9999, 5L, Seq(10L, 20L), Seq(4, 5)),
      (3, 8888, 5L, Seq(10L, 20L, 30L), Seq(4, 5, 6)),
      (4, 1, 1L, Seq(10L), Seq(4))
    ).toDF("id", "dstPort", "totPackets", "packetPos", "packetLen")
    val out = RulesLoader.applySpi(df, rs)
      .select(col("id"), col("packetPos")).as[(Int, Seq[Long])]
      .collect().toMap
    assert(!out.contains(1)) // under the floor
    assert(out(2) == Seq(10L, 20L))
    assert(out(3) == Seq(10L, 20L)) // truncated to 2
    assert(out(4) == Seq(10L))
  }

  test("AddToField: set fields canonicalize, ARRAY fields append in order") {
    val sess = spark
    import sess.implicits._
    val yaml =
      """version: 1
        |rules:
        |  - name: "mark"
        |    when: "fieldSet"
        |    fields:
        |      port.dst: 80
        |    ops:
        |      protocols: "zzz-proto"
        |      http.hasheader.src.value: "aaa-appended"
        |""".stripMargin
    val rs = RulesLoader.load(yaml, FieldRegistry.sessions)
    val df = Seq(
      // protocols already holds the value → set semantics: dup is a no-op
      (1, 80, Seq("tcp", "zzz-proto"), Seq("zzz", "aaa-appended")),
      (2, 80, Seq("tcp"), Seq("zzz")),
      (3, 443, Seq("tcp"), Seq("zzz"))
    ).toDF("id", "dstPort", "protocol", "httpRequestHeaderValue")
    val out = RulesLoader.applySpi(df, rs)
      .select(col("id"), col("protocol"), col("httpRequestHeaderValue"))
      .as[(Int, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // set-kinded (protocols, STR_HASH): dedup + canonical order
    assert(out(1)._1 == Seq("tcp", "zzz-proto"))
    assert(out(2)._1 == Seq("tcp", "zzz-proto"))
    // array-kinded (hasheader value, STR_ARRAY http.c:897): APPENDED —
    // "aaa-appended" sorts before "zzz", so order proves no array_sort
    // ran, and the pre-existing duplicate on id=1 is preserved
    assert(out(1)._2 == Seq("zzz", "aaa-appended", "aaa-appended"))
    assert(out(2)._2 == Seq("zzz", "aaa-appended"))
    assert(out(3) == (Seq("tcp"), Seq("zzz"))) // rule didn't match
  }

  test("fail-loud: the reference's LOGEXIT cases") {
    val reg = FieldRegistry.sessions
    def bad(y: String): String =
      intercept[IllegalArgumentException](RulesLoader.load(y, reg))
        .getMessage
    assert(bad("rules:\n  - name: x\n").contains("version"))
    assert(bad("version: 1\nrules:\n  - name: x\n    when: onTuesdays\n" +
      "    bpf: \"port 53\"\n    ops:\n      protocols: \"y\"\n")
      .contains("unknown when"))
    // both bpf and fields
    assert(bad("version: 1\nrules:\n  - name: x\n    when: sessionSetup\n" +
      "    bpf: \"port 53\"\n    fields:\n      port.dst: 53\n" +
      "    ops:\n      protocols: \"y\"\n")
      .contains("exactly one"))
    // modifier on an int field
    assert(bad("version: 1\nrules:\n  - name: x\n    when: fieldSet\n" +
      "    fields:\n      port.dst,endsWith: 53\n" +
      "    ops:\n      protocols: \"y\"\n")
      .contains("modifier"))
    // unknown field
    assert(bad("version: 1\nrules:\n  - name: x\n    when: fieldSet\n" +
      "    fields:\n      no.such.field: 1\n" +
      "    ops:\n      protocols: \"y\"\n")
      .contains("couldn't find field"))
    // everyPacket needs bpf
    assert(bad("version: 1\nrules:\n  - name: x\n    when: everyPacket\n" +
      "    fields:\n      port.dst: 53\n    ops:\n      protocols: \"y\"\n")
      .contains("everyPacket"))
    // capture-time special in applySpi
    val rs = RulesLoader.load(
      "version: 1\nrules:\n  - name: x\n    when: fieldSet\n" +
        "    fields:\n      port.dst: 53\n    ops:\n      _dropBySrc: 1\n",
      reg)
    val sess = spark
    import sess.implicits._
    val df = Seq((1, 53)).toDF("id", "dstPort")
    intercept[IllegalArgumentException](RulesLoader.applySpi(df, rs))
  }

  test("ip values accept bare addresses as host routes; v6 CIDRs work") {
    val sess = spark
    import sess.implicits._
    val yaml =
      """version: 1
        |rules:
        |  - name: hosts
        |    when: fieldSet
        |    fields:
        |      ip.src:
        |        - 9.9.9.9
        |        - fd00::/8
        |    ops:
        |      protocols: "marked"
        |""".stripMargin
    val rs = RulesLoader.load(yaml, FieldRegistry.sessions)
    val df = Seq(
      (1, "9.9.9.9", Seq("udp")),
      (2, "9.9.9.8", Seq("udp")),
      (3, "fd00::1234", Seq("udp"))
    ).toDF("id", "srcIp", "protocol")
    val out = RulesLoader.applySpi(df, rs)
      .select(col("id"), col("protocol")).as[(Int, Seq[String])]
      .collect().toMap
    assert(out(1).contains("marked") && out(3).contains("marked"))
    assert(!out(2).contains("marked"))
  }
}
