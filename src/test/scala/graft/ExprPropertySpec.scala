package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Compiler
import graft.model.FieldRegistry

/** Property-based guards for the expression compiler: random expressions
  * from the grammar must compile, and the compiled predicates must obey
  * boolean algebra on real data (the ES-style null semantics make `!`
  * NON-classical per leaf — `x != v` excludes null rows too — so the laws
  * are checked at the expression level where the reference defines them:
  * double negation, De Morgan, and the == / != partition over non-null
  * rows). Generators are sampled from a fixed seed: failures reproduce.
  */
class ExprPropertySpec extends AnyFunSuite with SparkSpecBase {

  private lazy val ev: DataFrame =
    Tables.load(spark, sf, "events").cache()
  private lazy val total: Long = ev.count()
  private def c = new Compiler(FieldRegistry.events, now = SparkEntry.now)

  private def rows(e: String): Long = ev.filter(c.compile(e)).count()

  // ---- generators over the events registry ---------------------------
  private val leaf: Gen[String] = Gen.oneOf(
    Gen.choose(0, 120).map(n => s"user == $n"),
    Gen.choose(0, 120).map(n => s"user != $n"),
    Gen.choose(0L, 5000L).map(n => s"id < $n"),
    Gen.choose(0L, 5000L).map(n => s"id >= $n"),
    Gen.oneOf("click", "view", "error", "purchase").map(t => s"type == $t"),
    Gen.oneOf("click", "view", "error").map(t => s"type != $t"),
    Gen.oneOf("cl*", "*iew", "*rror*").map(w => s"type == $w"),
    Gen.choose(0, 100).map(n => s"value >= $n"),
    Gen.const("type == EXISTS!"),
    Gen.choose(0, 60).flatMap(a => Gen.choose(0, 60).map(b =>
      s"user == ${math.min(a, b)}-${math.max(a, b)}")),
    Gen.oneOf(Seq("click", "view"), Seq("error", "purchase"))
      .map(l => s"type == [${l.mkString(",")}]"))

  private def expr(depth: Int): Gen[String] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for { a <- expr(depth - 1); b <- expr(depth - 1) }
        yield s"($a && $b)"),
      2 -> (for { a <- expr(depth - 1); b <- expr(depth - 1) }
        yield s"($a || $b)"),
      1 -> expr(depth - 1).map(e => s"!($e)"))

  /** Deterministic sample of `n` values (seeded — failures reproduce). */
  private def samples(g: Gen[String], n: Int, seed: Long): Seq[String] =
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator exhausted"))

  test("registered SQL kernels equal their JVM twins") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq("spark hash join window", "a b a b", "").toDF("t")
      .createOrReplaceTempView("kernel_probe")
    val rows = spark.sql(
      """SELECT t, shingle_hashes(t, 2, false) AS h, graft_simhash(t) AS s
         FROM kernel_probe""").collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getSeq[Long](1) ==
        graft.functions.ShingleHashes.hashes(t, 2, distinct = false).toSeq)
      assert(r.getLong(2) == graft.functions.ShingleHashes.simhash32(t))
    }
  }

  test("graft_expr SQL path equals the compiled Column path") {
    // random session expressions must count identically through
    // spark.sql(... WHERE graft_expr('e')) and df.filter(compile(e))
    GraftExtensions.register(spark)
    val sessions = Seq(
      "socks-http-example.pcap", "dns-udp.pcap", "smtp-zip.pcap",
      "http-301-get.pcap", "ssh2.pcap")
      .map(p => graft.etl.SessionBuilder
        .sessionizeRef(spark, s"/root/reference/tests/pcap/$p").toDF())
      .reduce(_.unionByName(_)).cache()
    sessions.createOrReplaceTempView("prop_sessions")
    val sc = new Compiler(FieldRegistry.sessions,
      FieldRegistry.sessionCol, SparkEntry.now)
    val sLeaf: Gen[String] = Gen.oneOf(
      Gen.choose(0, 65535).map(n => s"port.src <= $n"),
      Gen.choose(0, 65535).map(n => s"port.dst > $n"),
      Gen.oneOf("10.0.0.0/8", "192.168.0.0/16", "8.8.8.0/24")
        .map(c => s"ip.src == $c"),
      Gen.oneOf("tcp", "udp", "dns", "http", "smtp").map(t => s"protocols == $t"),
      Gen.const("dns.host == EXISTS!"),
      Gen.const("dns.host == *.com"),
      Gen.choose(1, 40).map(n => s"packets >= $n"))
    def sExpr(depth: Int): Gen[String] =
      if (depth <= 0) sLeaf
      else Gen.frequency(
        3 -> sLeaf,
        2 -> (for { a <- sExpr(depth - 1); b <- sExpr(depth - 1) }
          yield s"($a && $b)"),
        2 -> (for { a <- sExpr(depth - 1); b <- sExpr(depth - 1) }
          yield s"($a || $b)"),
        1 -> sExpr(depth - 1).map(e => s"!($e)"))
    samples(sExpr(2), 30, 7L).foreach { e =>
      val viaColumn = sessions.filter(sc.compile(e)).count()
      val viaSql = spark.sql(
        s"SELECT count(*) AS n FROM prop_sessions WHERE graft_expr('$e')")
        .head().getLong(0)
      assert(viaSql == viaColumn, s"SQL/Column divergence for: $e")
    }
  }

  test("meta-field fan-out laws under negation and transforms in lists") {
    // the two jison corner interactions called out in round 9: a
    // meta-field under must_not, and an operand transform applied to
    // every member of a list. Checked as algebraic laws against the
    // manually-expanded equivalent over a real sessionized corpus.
    val sessions = Seq(
      "socks-http-example.pcap", "dns-udp.pcap", "smtp-zip.pcap",
      "http-301-get.pcap", "ssh2.pcap")
      .map(p => graft.etl.SessionBuilder
        .sessionizeRef(spark, s"/root/reference/tests/pcap/$p").toDF())
      .reduce(_.unionByName(_)).cache()
    val sc = new Compiler(FieldRegistry.sessions,
      FieldRegistry.sessionCol, SparkEntry.now)
    def srows(e: String): Long = sessions.filter(sc.compile(e)).count()
    val tot = sessions.count()
    // members come from the registry so these laws track the full ipall/
    // port fan-out (every ip-typed field; port.src/dst/socks)
    val ipMembers = FieldRegistry.sessions.expand("ip").map(_.expression)
    val portMembers = FieldRegistry.sessions.expand("port").map(_.expression)
    assert(ipMembers.size >= 10 && portMembers.size == 3)
    for (v <- Seq("10.0.0.0/8", "8.8.8.8", "192.168.0.0/16", "10.180.0.0/16")) {
      // meta-field == fans out to an OR over members
      assert(srows(s"ip == $v") ==
        srows(ipMembers.map(m => s"$m == $v").mkString(" || ")),
        s"ip fan-out broke for $v")
      // meta-field != is must_not(OR) = AND of member negations
      assert(srows(s"ip != $v") ==
        srows(ipMembers.map(m => s"$m != $v").mkString(" && ")),
        s"ip must_not fan-out broke for $v")
      assert(srows(s"ip == $v") + srows(s"ip != $v") == tot,
        s"ip ==/!= must partition all rows for $v (must_not includes null)")
      // a :port operand keeps only the portField carriers
      // (molochparser.js getIpInfoList needPort)
      assert(srows(s"ip == $v:80") == srows(
        s"ip.src == $v:80 || ip.dst == $v:80 || ip.socks == $v:80"),
        s"ip:port fan-out broke for $v")
    }
    for (p <- Seq(53, 80, 443, 1080)) {
      assert(srows(s"port == $p") ==
        srows(portMembers.map(m => s"$m == $p").mkString(" || ")))
      assert(srows(s"port != $p") ==
        srows(portMembers.map(m => s"$m != $p").mkString(" && ")))
    }
    // operand transform inside a list: ip.protocol names → numbers must
    // apply per member (jison:712-762 applies the transform to each
    // list item), so the list equals the OR of transformed singles
    assert(srows("ip.protocol == [tcp, udp]") ==
      srows("ip.protocol == 6 || ip.protocol == 17"))
    // `.tokens` companions: analyzed-phrase over the SAME column — the
    // in-order token sequence matches, the reversed one doesn't
    assert(srows("host.http.tokens == \"example com\"") > 0)
    assert(srows("host.http.tokens == \"com example\"") == 0)
    // db-style alias spellings of the renamed primaries still resolve
    assert(srows("socks.ip == EXISTS!") == srows("ip.socks == EXISTS!"))
    // both spellings of every aliased host field resolve to one column
    for ((a, b) <- Seq("host.email" -> "email.host", "smb.host" -> "host.smb",
      "socks.host" -> "host.socks", "quic.host" -> "host.quic",
      "host.dhcp" -> "dhcp.host", "host.oracle" -> "oracle.host",
      "host.http" -> "http.host"))
      assert(srows(s"$a == EXISTS!") == srows(s"$b == EXISTS!"), s"$a/$b")
    assert(srows("ip.protocol == [tcp, icmp]") ==
      srows("ip.protocol == tcp || ip.protocol == 1"))
    // and under negation: != [list] = none of the members
    assert(srows("ip.protocol != [tcp, udp]") ==
      srows("ip.protocol != 6 && ip.protocol != 17"))
    // dash2Colon transform on mac lists (multi-valued field + transform)
    val macs = sessions.selectExpr("explode(srcMac) AS m")
      .limit(2).collect().map(_.getString(0)).toSeq
    if (macs.nonEmpty) {
      val dashed = macs.map(_.replace(':', '-'))
      assert(srows(s"mac.src == [${dashed.mkString(",")}]") ==
        srows(dashed.map(m => s"mac.src == $m").mkString(" || ")),
        "mac list with dash2colon transform must match the OR of singles")
      assert(srows(s"mac.src == ${dashed.head}") ==
        srows(s"mac.src == ${macs.head}"),
        "dashed and colon mac forms must match the same rows")
    }
  }

  test("random grammar expressions compile and evaluate") {
    samples(expr(3), 40, 1L).foreach { e =>
      val n = rows(e)
      assert(n >= 0 && n <= total, s"out of range for: $e")
    }
  }

  test("double negation preserves the row set") {
    samples(expr(2), 25, 2L).foreach { e =>
      assert(rows(s"!(!($e))") == rows(e), s"double negation broke: $e")
    }
  }

  test("De Morgan holds for compiled predicates") {
    val as = samples(expr(1), 15, 3L)
    val bs = samples(expr(1), 15, 4L)
    as.zip(bs).foreach { case (a, b) =>
      assert(rows(s"!(($a) && ($b))") == rows(s"!($a) || !($b)"),
        s"De Morgan(&&) broke: $a / $b")
      assert(rows(s"!(($a) || ($b))") == rows(s"!($a) && !($b)"),
        s"De Morgan(||) broke: $a / $b")
    }
  }

  test("== and != partition the non-null universe per field") {
    val users = samples(Gen.choose(0, 120).map(_.toString), 10, 5L)
    val nnUser = ev.filter("user_id IS NOT NULL").count()
    val nnType = ev.filter("event_type IS NOT NULL").count()
    users.foreach { u =>
      assert(rows(s"user == $u") + rows(s"user != $u") == nnUser)
    }
    Seq("click", "view", "error").foreach { t =>
      assert(rows(s"type == $t") + rows(s"type != $t") == nnType)
    }
  }

  test("extended fuzz cases all compile at the committed seed") {
    // the driver's q_fuzz_grammar_ext hash-compare pins the VALUES; this
    // pins that every generated expression is grammar-legal (a generator
    // drift into unparseable syntax should fail here, not in the driver)
    import graft.query.ExprFuzz
    val fc = new graft.expr.Compiler(ExprFuzz.extRegistry,
      now = SparkEntry.fuzzNow, shortcuts = ExprFuzz.extShortcuts,
      views = ExprFuzz.extViews, files = ExprFuzz.extFiles)
    val cs = ExprFuzz.extCases(240, 0xbead5eedL)
    assert(cs.size == 240)
    cs.foreach(c => fc.compile(c.expr))
    // determinism: the same seed yields the same cases
    val again = ExprFuzz.extCases(240, 0xbead5eedL)
    assert(cs.map(_.expr) == again.map(_.expr))
    assert(cs.map(_.sql) == again.map(_.sql))
    // every leaf family is actually present in the committed case list
    val all = cs.map(_.expr).mkString("\n")
    for (needle <- Seq("ip.src", "ip.dst", "ip ==", "port", "host",
        "mac.src", "ip.protocol", "$vips", "$kinds", "$nets", ":",
        "EXISTS!", "/", ".cnt", "view ", "file ", "http.uri",
        "payload8.src.utf8"))
      assert(all.contains(needle), s"no case exercises '$needle'")
  }
}
