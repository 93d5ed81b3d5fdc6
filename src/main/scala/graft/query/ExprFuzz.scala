package graft.query

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Grammar fuzz harness for the expression compiler (Q1–Q13 surface).
  *
  * Generates seeded random well-formed search expressions over the
  * `events` field registry TOGETHER WITH an independent ANSI-SQL
  * translation of each, built directly from the reference's documented
  * semantics (viewer/molochparser.jison formatQuery: ES must_not
  * negation, list = OR of member matches, `lo` operand fold, anchored
  * full-match regex, snap-then-offset relative dates) — NOT from the
  * compiler under test. The driver's DuckDB runs the SQL side, so every
  * generated case is a real differential oracle: `q_fuzz_grammar`
  * evaluates all cases in a few wide aggregate passes and emits
  * (case_id, n) rows whose hash must match DuckDB's.
  *
  * Determinism: a fixed LCG seed (no java.util.Random), a fixed `now`,
  * and pure generation — the same (expr, sql) pairs on every run, in
  * the Spark job and in the oracle SQL string.
  */
object ExprFuzz {

  final case class Case(id: Int, expr: String, sql: String)

  /** Deterministic 64-bit LCG (Knuth MMIX constants). */
  private final class Rng(seed: Long) {
    private var s: Long = seed
    def nextInt(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound + bound) % bound).toInt
    }
    def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  private val types = Seq("click", "view", "error", "purchase", "signup")
  // wildcard / regex operands stay alphanumeric + the metachar under
  // test, so expr-side quoting and SQL-side escaping are both trivial
  private val wildcards = Seq("p*", "*e", "*r*", "c*ck", "*i*", "s*p")
  private val regexes = Seq("cl.*", ".*or", "(click|view)", "p.{4,7}e",
    "s.g.*", "[cv].*")

  /** must_not wrapper: a row matches the negation when the inner
    * predicate is false OR NULL (jison formatQuery must_not).
    */
  private def mustNot(sql: String): String = s"NOT coalesce($sql, FALSE)"

  private def like(pat: String): String = pat.replace("*", "%")

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** Independent relative-date arithmetic: snap FIRST, then offset
    * (jison:858-880) — `-36h@d` = truncate(now, day) - 36h.
    */
  private def relInstant(now: Instant, n: Int, unit: Char,
      snap: Option[Char]): Instant = {
    val base = snap match {
      case Some('d') => Instant.ofEpochSecond(
        now.getEpochSecond - Math.floorMod(now.getEpochSecond, 86400L))
      case Some('h') => Instant.ofEpochSecond(
        now.getEpochSecond - Math.floorMod(now.getEpochSecond, 3600L))
      case _ => now
    }
    val secs = unit match {
      case 'd' => n * 86400L
      case 'h' => n * 3600L
      case 'm' => n * 60L
      case _   => n.toLong
    }
    base.minusSeconds(secs)
  }

  private def tsLit(i: Instant): String = s"TIMESTAMP '${tsFmt.format(i)}'"

  /** One leaf: (expression syntax, SQL WHERE predicate). The SQL carries
    * the positive form; != leaves wrap it in the must_not translation.
    */
  private def leaf(r: Rng, now: Instant): (String, String) = {
    def negPair(field: String, v: String, pos: String,
        neg: Boolean): (String, String) =
      if (neg) (s"$field != $v", mustNot(pos)) else (s"$field == $v", pos)
    r.nextInt(10) match {
      case 0 => // int compare on id/user
        val (f, c, hi) = r.oneOf(Seq(("id", "event_id", 12000),
          ("user", "user_id", 160)))
        val n = r.nextInt(hi)
        r.oneOf(Seq("<", "<=", ">", ">=")) match {
          case op => (s"$f $op $n", s"$c $op $n")
        }
      case 1 => // int equality / must_not
        val (f, c, hi) = r.oneOf(Seq(("id", "event_id", 12000),
          ("user", "user_id", 160)))
        val n = r.nextInt(hi)
        negPair(f, n.toString, s"$c = $n", r.chance(40))
      case 2 => // int range shorthand a-b
        val (f, c, hi) = r.oneOf(Seq(("id", "event_id", 12000),
          ("user", "user_id", 160)))
        val a = r.nextInt(hi); val b = a + 1 + r.nextInt(hi / 4 + 1)
        negPair(f, s"$a-$b", s"$c BETWEEN $a AND $b", r.chance(40))
      case 3 => // int list with an embedded range
        val (f, c, hi) = r.oneOf(Seq(("id", "event_id", 12000),
          ("user", "user_id", 160)))
        val x = r.nextInt(hi); val y = r.nextInt(hi)
        val a = r.nextInt(hi); val b = a + 1 + r.nextInt(20)
        negPair(f, s"[$x, $y, $a-$b]",
          s"($c = $x OR $c = $y OR $c BETWEEN $a AND $b)", r.chance(40))
      case 4 => // term equality
        val v = r.oneOf(types)
        negPair("type", v, s"event_type = '$v'", r.chance(40))
      case 5 => // wildcard
        val w = r.oneOf(wildcards)
        negPair("type", w, s"event_type LIKE '${like(w)}'", r.chance(30))
      case 6 => // anchored regex
        val re = r.oneOf(regexes)
        negPair("type", s"/$re/",
          s"regexp_full_match(event_type, '$re')", r.chance(30))
      case 7 => // lo-term operand fold + mixed term/wildcard list
        if (r.chance(50)) {
          val v = r.oneOf(types).toUpperCase
          negPair("type.lower", v, s"event_type = lower('$v')", r.chance(30))
        } else {
          val v1 = r.oneOf(types); val w = r.oneOf(wildcards)
          negPair("type", s"[$v1, $w]",
            s"(event_type = '$v1' OR event_type LIKE '${like(w)}')",
            r.chance(30))
        }
      case 8 => // float compare / EXISTS!
        if (r.chance(60)) {
          val v = r.nextInt(49000) / 100.0
          val op = r.oneOf(Seq("<", "<=", ">", ">="))
          (s"value $op $v", s"value $op $v")
        } else {
          val f = r.oneOf(Seq(("props", "props"), ("type", "event_type"),
            ("user", "user_id")))
          if (r.chance(50)) (s"${f._1} == EXISTS!", s"${f._2} IS NOT NULL")
          else (s"${f._1} != EXISTS!", s"${f._2} IS NULL")
        }
      case _ => // dates: absolute and relative/snapped; range AND the
        // within-second equality semantics (termOrTermsDate: ts == d is
        // the [d, d+1s) window, lists OR the windows, != is must_not)
        def eqWindow(i: Instant): String =
          s"(ts >= ${tsLit(i)} AND ts < ${tsLit(i.plusSeconds(1))})"
        if (r.chance(30)) { // equality / list / negation
          def one(): (String, Instant) = {
            if (r.chance(50)) {
              val day = 1 + r.nextInt(30); val hour = r.nextInt(24)
              val min = r.nextInt(60); val sec = r.nextInt(60)
              (f""""2024/01/$day%02d $hour%02d:$min%02d:$sec%02d"""",
                Instant.parse(
                  f"2024-01-$day%02dT$hour%02d:$min%02d:$sec%02dZ"))
            } else {
              val (n, unit) = r.oneOf(Seq(
                (1 + r.nextInt(40), 'd'), (1 + r.nextInt(800), 'h')))
              val snap = r.oneOf(Seq(None, Some('d'), Some('h')))
              val snapStr = snap.map("@" + _).getOrElse("")
              (s"-$n$unit$snapStr", relInstant(now, n, unit, snap))
            }
          }
          if (r.chance(30)) { // list of two date windows
            val (t1, i1) = one(); val (t2, i2) = one()
            val pos = s"(${eqWindow(i1)} OR ${eqWindow(i2)})"
            if (r.chance(40)) (s"ts != [$t1, $t2]", mustNot(pos))
            else (s"ts == [$t1, $t2]", pos)
          } else {
            val (t1, i1) = one()
            if (r.chance(40)) (s"ts != $t1", mustNot(eqWindow(i1)))
            else (s"ts == $t1", eqWindow(i1))
          }
        } else if (r.chance(55)) {
          val op = r.oneOf(Seq(">=", "<", ">", "<="))
          val day = 1 + r.nextInt(30)
          val hour = r.nextInt(24)
          if (r.chance(50))
            (f"""ts $op%s "2024/01/$day%02d"""",
              f"ts $op%s TIMESTAMP '2024-01-$day%02d 00:00:00'")
          else
            (f"""ts $op%s "2024/01/$day%02d $hour%02d:00:00"""",
              f"ts $op%s TIMESTAMP '2024-01-$day%02d $hour%02d:00:00'")
        } else {
          val op = r.oneOf(Seq(">=", "<", ">", "<="))
          val (n, unit) = r.oneOf(Seq(
            (1 + r.nextInt(40), 'd'), (1 + r.nextInt(800), 'h'),
            (1 + r.nextInt(2000), 'm')))
          val snap = r.oneOf(Seq(None, Some('d'), Some('h')))
          val snapStr = snap.map("@" + _).getOrElse("")
          (s"ts $op -$n$unit$snapStr",
            s"ts $op ${tsLit(relInstant(now, n, unit, snap))}")
        }
    }
  }

  private def gen(r: Rng, now: Instant, depth: Int): (String, String) =
    if (depth <= 0 || r.chance(45)) leaf(r, now)
    else r.nextInt(5) match {
      case 0 | 1 =>
        val (ae, as) = gen(r, now, depth - 1); val (be, bs) = gen(r, now, depth - 1)
        (s"($ae && $be)", s"($as AND $bs)")
      case 2 | 3 =>
        val (ae, as) = gen(r, now, depth - 1); val (be, bs) = gen(r, now, depth - 1)
        (s"($ae || $be)", s"($as OR $bs)")
      case _ =>
        val (ae, as) = gen(r, now, depth - 1)
        (s"!($ae)", mustNot(as))
    }

  /** The seeded case list — same on every call. */
  def cases(n: Int, seed: Long, now: Instant): Seq[Case] = {
    val r = new Rng(seed)
    (0 until n).map { i =>
      val (e, s) = gen(r, now, 3)
      Case(i, e, s)
    }
  }

  /** DuckDB oracle: one UNION ALL branch per case, each a single
    * aggregate over events → (case_id, n) with BIGINT types and a total
    * ordering, per the driver's hash-compare contract.
    */
  def oracleSql(cs: Seq[Case]): String =
    cs.map(c =>
      s"""SELECT CAST(${c.id} AS BIGINT) AS case_id,
          CAST(coalesce(sum(CASE WHEN ${c.sql} THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n FROM events""")
      .mkString("SELECT case_id, n FROM (", " UNION ALL ",
        ") ORDER BY case_id")

  // ===================================================================
  // Extended grammar fuzz: the four leaf kinds the Q1–Q13 fuzz above
  // can't reach on the raw events table — ip/CIDR with `:port`
  // conjuncts (jison parseIpPort:144-293), meta-field fan-out
  // (jison:356-375), operand transforms (jison:686-762), and
  // `$shortcut` expansion (jison:377-447) — over a DERIVED frame both
  // engines synthesize identically from events (ip/port/mac/host
  // columns WITH injected NULLs and empty arrays, so the ES must_not
  // three-valued-logic corners are live on every negated case).
  // ===================================================================

  import graft.model.{FieldDef, FieldKind, FieldRegistry}
  import FieldKind._

  /** Registry over the derived fuzz frame (column derivations:
    * [[extFrameSql]] / SparkEntry.fuzzExtEv — keep in lockstep).
    */
  val extRegistry: FieldRegistry = FieldRegistry(
    Seq(
      FieldDef("id",          "event_id",   IntegerK),
      FieldDef("user",        "user_id",    IntegerK),
      FieldDef("type",        "event_type", TermK),
      FieldDef("ip.src",      "srcIp",      IpK, portField = Some("srcPort")),
      FieldDef("ip.dst",      "dstIp",      IpK, portField = Some("dstPort")),
      FieldDef("port.src",    "srcPort",    IntegerK),
      FieldDef("port.dst",    "dstPort",    IntegerK),
      FieldDef("ip.protocol", "ipProtocol", IntegerK,
        transform = Some(FieldRegistry.ipProtocolLookup)),
      FieldDef("mac.src",     "srcMac",     LoTermK, multiValued = true,
        transform = Some(FieldRegistry.dash2Colon)),
      FieldDef("http.host",   "httpHost",   LoTermK, multiValued = true),
      FieldDef("dns.host",    "dnsQname",   LoTermK, multiValued = true),
      FieldDef("host.socks",  "socksHost",  LoTermK),
      FieldDef("http.uri",    "httpUri",    LoTermK,
        transform = Some(FieldRegistry.removeProtocol)),
      FieldDef("payload8.src.utf8", "srcPayload8", LoTermK,
        transform = Some(FieldRegistry.utf8ToHex))),
    metaFields = Map(
      "ip"   -> Seq("ip.src", "ip.dst"),
      "port" -> Seq("port.src", "port.dst"),
      "host" -> Seq("http.host", "dns.host", "host.socks")))

  /** Fixed shortcut store for the fuzz (the $name → list expansion under
    * test; values chosen to straddle the derived frame's domains).
    */
  val extShortcuts: Map[String, Seq[String]] = Map(
    "vips"  -> Seq("3", "17", "42", "99", "120", "7"),
    "kinds" -> Seq("click", "purchase"),
    "nets"  -> Seq("10.32.0.0/11", "10.200.7.0/24", "10.77.3.1"))

  /** Fixed saved views (Q15's viewand expansion under test — including
    * under `view !=` negation, which negates the resolved AST, and
    * RECURSIVE chains: vip2 references vipsrc, vip3 references vip2
    * (3 deep), negchain carries a `view !=` INSIDE a view body — the
    * jison viewand production re-enters the parser on the stored
    * expression, so chains compose to the depth guard).
    */
  val extViews: Map[String, String] = Map(
    "vipsrc" -> "ip.src == 10.32/11 || user >= 120",
    "clicky" -> "type == click && port.src >= 1500",
    "vip2" -> "view == vipsrc && type != error",
    "vip3" -> "view == vip2 || port.dst >= 500",
    "negchain" -> "view != clicky && user < 140")
  // independent SQL of each view body (NOT derived from the compiler):
  // chain SQLs re-expand the referenced view's SQL textually, and a
  // nested `view !=`/`type !=` is must_not (is-not-true) of the
  // resolved body, per the ES bool semantics the leaves already pin
  private val extViewSql: Map[String, String] = {
    val vipsrc = "(srcNum BETWEEN 169869312 AND 171966463 OR user_id >= 120)"
    val clicky = "(event_type = 'click' AND srcPort >= 1500)"
    val vip2 = s"($vipsrc AND NOT coalesce(event_type = 'error', FALSE))"
    val vip3 = s"($vip2 OR dstPort >= 500)"
    val negchain = s"(NOT coalesce($clicky, FALSE) AND user_id < 140)"
    Map("vipsrc" -> vipsrc, "clicky" -> clicky, "vip2" -> vip2,
      "vip3" -> vip3, "negchain" -> negchain)
  }

  /** Fixed files dimension for `file ==` fileand leaves: 3 nodes × 7
    * capture files, ids = on-disk paths (the shape viewerUtils.js
    * resolves to before querying).
    */
  val extFiles: Seq[graft.model.FileEntry] =
    for (n <- 0 until 3; k <- 0 until 7)
      yield graft.model.FileEntry(
        s"cap-$k.pcap", s"node$n", s"/data/pcap/cap-$k.pcap")

  /** DuckDB derivation of the fuzz frame — the independent twin of
    * SparkEntry.fuzzExtEv. NULL/empty injection: srcIp (id%13), dstIp
    * (id%17), ports (id%7 — the "ICMP rows"), srcMac (id%11), httpHost
    * NULL (id%19) / empty list (id%23), socksHost (user%5).
    */
  val extFrameSql: String =
    """SELECT event_id, user_id, event_type,
       CASE WHEN event_id % 13 = 0 THEN NULL
            ELSE '10.' || (user_id % 250) || '.' || (event_id % 200) || '.1'
       END AS srcIp,
       CASE WHEN event_id % 13 = 0 THEN NULL
            ELSE 167772160 + (user_id % 250) * 65536 + (event_id % 200) * 256 + 1
       END AS srcNum,
       CASE WHEN event_id % 17 = 0 THEN NULL
            ELSE '10.' || (event_id % 250) || '.' || (user_id % 200) || '.2'
       END AS dstIp,
       CASE WHEN event_id % 17 = 0 THEN NULL
            ELSE 167772160 + (event_id % 250) * 65536 + (user_id % 200) * 256 + 2
       END AS dstNum,
       CASE WHEN event_id % 7 = 0 THEN NULL
            ELSE event_id % 1000 + 1000 END AS srcPort,
       CASE WHEN event_id % 7 = 0 THEN NULL
            ELSE user_id % 500 + 80 END AS dstPort,
       CASE WHEN event_id % 4 = 0 THEN 6 WHEN event_id % 4 = 1 THEN 17
            WHEN event_id % 4 = 2 THEN 1 ELSE 47 END AS ipProtocol,
       CASE WHEN event_id % 11 = 0 THEN NULL
            ELSE ['00:11:22:33:44:' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')]
       END AS srcMac,
       CASE WHEN event_id % 19 = 0 THEN NULL
            WHEN event_id % 23 = 0 THEN CAST([] AS VARCHAR[])
            ELSE ['h' || (user_id % 50) || '.example.com'] END AS httpHost,
       ['d' || (event_id % 97) || '.example.org'] AS dnsQname,
       CASE WHEN user_id % 5 = 0 THEN NULL
            ELSE 'h' || (event_id % 50) || '.example.com' END AS socksHost,
       CASE WHEN user_id % 7 = 0 THEN NULL
            ELSE 'h' || (event_id % 50) || '.example.com/p' || (event_id % 5)
       END AS httpUri,
       lower(hex('P' || (event_id % 3))) AS srcPayload8,
       CASE WHEN user_id % 13 = 0 THEN NULL
            ELSE 'node' || (event_id % 3) END AS node,
       CASE WHEN user_id % 19 = 0 THEN NULL
            WHEN event_id % 29 = 0 THEN CAST([] AS VARCHAR[])
            ELSE ['/data/pcap/cap-' || (event_id % 7) || '.pcap']
       END AS fileId
     FROM events WHERE user_id IS NOT NULL"""

  /** One endpoint's columns/domains for operand + SQL generation. */
  private final case class IpF(expr: String, ipCol: String, numCol: String,
      portCol: String, portLo: Int, portSpan: Int, lastOctet: Int)
  private val srcF = IpF("ip.src", "srcIp", "srcNum", "srcPort", 1000, 1000, 1)
  private val dstF = IpF("ip.dst", "dstIp", "dstNum", "dstPort", 80, 500, 2)

  private def v4Num(a: Int, b: Int, c: Int, d: Int): Long =
    a.toLong * 16777216L + b * 65536L + c * 256L + d
  private def v4Str(n: Long): String =
    s"${(n >> 24) & 255}.${(n >> 16) & 255}.${(n >> 8) & 255}.${n & 255}"

  /** An ip-shaped operand plus its per-endpoint SQL translation, built
    * from documented semantics only: CIDR → numeric BETWEEN on the
    * aligned range; bare prefix → inferred /8·16·24 (jison/ES ip
    * shorthand); `:port` → null-intolerant port conjunct (a term on a
    * missing field fails); exact → canonical string equality.
    */
  private final case class IpOperand(text: String, sql: IpF => String)

  private def genIpOperand(r: Rng, f: IpF): IpOperand = r.nextInt(6) match {
    case 0 => // exact address (mostly hittable)
      val b = r.nextInt(250); val c = r.nextInt(200)
      val d = if (r.chance(75)) f.lastOctet else r.nextInt(256)
      val ip = s"10.$b.$c.$d"
      IpOperand(ip, g => s"${g.ipCol} = '$ip'")
    case 1 => // aligned CIDR with explicit length
      val len = 9 + r.nextInt(20) // 9..28
      val k = r.nextInt(math.min(1 << (len - 8), 1 << 16))
      val span = 1L << (32 - len)
      val base = v4Num(10, 0, 0, 0) + k * span
      IpOperand(s"${v4Str(base)}/$len",
        g => s"${g.numCol} BETWEEN $base AND ${base + span - 1}")
    case 2 => // bare-prefix shorthand: 10.b → /16, 10.b.c → /24
      if (r.chance(50)) {
        val b = r.nextInt(250)
        val base = v4Num(10, b, 0, 0)
        IpOperand(s"10.$b",
          g => s"${g.numCol} BETWEEN $base AND ${base + 65535}")
      } else {
        val b = r.nextInt(250); val c = r.nextInt(200)
        val base = v4Num(10, b, c, 0)
        IpOperand(s"10.$b.$c",
          g => s"${g.numCol} BETWEEN $base AND ${base + 255}")
      }
    case 3 => // port-only `:p` — null-intolerant term on the port field
      val p = f.portLo + r.nextInt(f.portSpan * 3 / 2)
      IpOperand(s":$p", g => s"coalesce(${g.portCol} = $p, FALSE)")
    case 4 => // address:port conjunct
      val b = r.nextInt(250); val c = r.nextInt(200)
      val p = f.portLo + r.nextInt(f.portSpan * 3 / 2)
      val ip = s"10.$b.$c.${f.lastOctet}"
      IpOperand(s"$ip:$p",
        g => s"(${g.ipCol} = '$ip' AND coalesce(${g.portCol} = $p, FALSE))")
    case _ => // prefix:port — parseIpPort splits the port off first
      val b = r.nextInt(250)
      val base = v4Num(10, b, 0, 0)
      val p = f.portLo + r.nextInt(f.portSpan * 3 / 2)
      IpOperand(s"10.$b:$p",
        g => s"(${g.numCol} BETWEEN $base AND ${base + 65535}" +
          s" AND coalesce(${g.portCol} = $p, FALSE))")
  }

  /** Apply an ip leaf to one endpoint or the `ip` meta fan-out
    * (OR over both endpoints, each with its own port field).
    */
  private def ipLeaf(r: Rng): (String, String) = {
    val meta = r.chance(30)
    val f = if (r.chance(50)) srcF else dstF
    val fieldName = if (meta) "ip" else f.expr
    def apply1(op: IpOperand): String =
      if (meta) s"(${op.sql(srcF)} OR ${op.sql(dstF)})" else op.sql(f)
    r.nextInt(5) match {
      case 0 => // single operand, eq / ne
        val op = genIpOperand(r, f)
        val pos = apply1(op)
        if (r.chance(40)) (s"$fieldName != ${op.text}", mustNot(pos))
        else (s"$fieldName == ${op.text}", pos)
      case 1 => // list of 2–3 mixed ip forms
        val ops = (0 until 2 + r.nextInt(2)).map(_ => genIpOperand(r, f))
        val pos = ops.map(apply1).mkString("(", " OR ", ")")
        val listTxt = ops.map(_.text).mkString("[", ", ", "]")
        if (r.chance(40)) (s"$fieldName != $listTxt", mustNot(pos))
        else (s"$fieldName == $listTxt", pos)
      case 2 => // numeric-order range compare (128-bit sortable order)
        val cmp = r.oneOf(Seq("<", "<=", ">", ">="))
        val n = v4Num(10, r.nextInt(250), r.nextInt(200), r.nextInt(256))
        val pred =
          if (meta) s"(srcNum $cmp $n OR dstNum $cmp $n)"
          else s"${f.numCol} $cmp $n"
        (s"$fieldName $cmp ${v4Str(n)}", pred)
      case 3 => // EXISTS!
        val ex =
          if (meta) "(srcIp IS NOT NULL OR dstIp IS NOT NULL)"
          else s"${f.ipCol} IS NOT NULL"
        if (r.chance(50)) (s"$fieldName == EXISTS!", ex)
        else (s"$fieldName != EXISTS!", s"NOT $ex")
      case _ => // $nets shortcut (ip-valued lookup list)
        val pos = Seq(
          (g: IpF) => s"${g.numCol} BETWEEN 169869312 AND 171966463",
          (g: IpF) => s"${g.numCol} BETWEEN 180881152 AND 180881407",
          (g: IpF) => s"${g.ipCol} = '10.77.3.1'")
          .map(s => if (meta) s"(${s(srcF)} OR ${s(dstF)})" else s(f))
          .mkString("(", " OR ", ")")
        if (r.chance(40)) (s"$fieldName != $$nets", mustNot(pos))
        else (s"$fieldName == $$nets", pos)
    }
  }

  /** `host` meta fan-out: two array members + one scalar member, with
    * term / wildcard / anchored-regex / list / EXISTS! operand shapes
    * and lotermfield case folding.
    */
  private def hostLeaf(r: Rng): (String, String) = {
    def mixCase(s: String): String =
      s.zipWithIndex.map { case (ch, i) =>
        if (r.chance(25) && ch.isLetter) ch.toUpper else ch }.mkString
    // (expr operand, per-member SQL on the lowercase value); regexes
    // are not list-legal in the grammar, so list members cap at kind 2
    def one(kinds: Int = 4): (String, String => String, String => String) =
      r.nextInt(kinds) match {
        case 0 => // hittable http/socks name
          val v = s"h${r.nextInt(50)}.example.com"
          (mixCase(v), arr => s"list_contains($arr, '$v')",
            sc => s"$sc = '$v'")
        case 1 => // hittable dns name
          val v = s"d${r.nextInt(97)}.example.org"
          (mixCase(v), arr => s"list_contains($arr, '$v')",
            sc => s"$sc = '$v'")
        case 2 => // wildcard (* → %, ? → _); a bare value is a wildcard
          // only when it contains '*' (a lone '?' stays a literal term,
          // as the reference's indexOf('*') gate decides)
          val w = r.oneOf(Seq(
            s"h${r.nextInt(5)}*.example.com",
            s"*${r.nextInt(10)}.example.org",
            s"h?${r.nextInt(10)}*.example.com"))
          val like = w.replace("*", "%").replace("?", "_")
          (mixCase(w),
            arr => s"len(list_filter($arr, x -> x LIKE '$like')) > 0",
            sc => s"$sc LIKE '$like'")
        case _ => // anchored regex, pre-folded lowercase
          val re = r.oneOf(Seq("h[0-4].example.com", "d1.*", ".*7\\.example\\.(com|org)"))
          (s"/$re/",
            arr => s"len(list_filter($arr, x -> regexp_full_match(x, '$re'))) > 0",
            sc => s"regexp_full_match($sc, '$re')")
      }
    def fanOut(m: (String, String => String, String => String)): String =
      s"(${m._2("httpHost")} OR ${m._2("dnsQname")} OR ${m._3("socksHost")})"
    r.nextInt(4) match {
      case 0 | 1 =>
        val m = one()
        val pos = fanOut(m)
        if (r.chance(40)) (s"host != ${m._1}", mustNot(pos))
        else (s"host == ${m._1}", pos)
      case 2 => // list of two operands
        val a = one(kinds = 3); val b = one(kinds = 3)
        val pos = s"(${fanOut(a)} OR ${fanOut(b)})"
        val txt = s"[${a._1}, ${b._1}]"
        if (r.chance(40)) (s"host != $txt", mustNot(pos))
        else (s"host == $txt", pos)
      case _ => // EXISTS! over the fan-out (arrays: non-null AND non-empty)
        val ex = "((httpHost IS NOT NULL AND len(httpHost) > 0)" +
          " OR (dnsQname IS NOT NULL AND len(dnsQname) > 0)" +
          " OR socksHost IS NOT NULL)"
        if (r.chance(50)) ("host == EXISTS!", ex)
        else ("host != EXISTS!", s"NOT $ex")
    }
  }

  /** `port` meta / direct port fields: eq, `a-b` range shorthand,
    * lists, order compares — over nullable int columns.
    */
  private def portLeaf(r: Rng): (String, String) = {
    val meta = r.chance(50)
    val (fieldName, cols) =
      if (meta) ("port", Seq("srcPort", "dstPort"))
      else r.oneOf(Seq(("port.src", Seq("srcPort")),
        ("port.dst", Seq("dstPort"))))
    def fan(p: String => String): String =
      cols.map(p).mkString("(", " OR ", ")")
    r.nextInt(4) match {
      case 0 =>
        val p = 80 + r.nextInt(2200)
        val pos = fan(c => s"$c = $p")
        if (r.chance(40)) (s"$fieldName != $p", mustNot(pos))
        else (s"$fieldName == $p", pos)
      case 1 =>
        val a = 80 + r.nextInt(2000); val b = a + 1 + r.nextInt(400)
        val pos = fan(c => s"$c BETWEEN $a AND $b")
        if (r.chance(40)) (s"$fieldName != $a-$b", mustNot(pos))
        else (s"$fieldName == $a-$b", pos)
      case 2 =>
        val p1 = 80 + r.nextInt(2200); val a = 80 + r.nextInt(2000)
        val b = a + 1 + r.nextInt(100)
        val pos = fan(c => s"($c = $p1 OR $c BETWEEN $a AND $b)")
        if (r.chance(40)) (s"$fieldName != [$p1, $a-$b]", mustNot(pos))
        else (s"$fieldName == [$p1, $a-$b]", pos)
      case _ =>
        val cmp = r.oneOf(Seq("<", "<=", ">", ">="))
        val p = 80 + r.nextInt(2200)
        (s"$fieldName $cmp $p", fan(c => s"$c $cmp $p"))
    }
  }

  /** Operand-transform leaves: ipProtocolLookup (name → number, case
    * folded at the transform) and dash2Colon on a lotermfield array.
    */
  private def transformLeaf(r: Rng): (String, String) = {
    if (r.chance(50)) { // ip.protocol with named protocols
      val named = Seq(("tcp", 6), ("udp", 17), ("icmp", 1), ("gre", 47),
        ("TCP", 6), ("Udp", 17), ("ICMP", 1))
      r.nextInt(3) match {
        case 0 =>
          val (n0, v) = r.oneOf(named)
          val pos = s"ipProtocol = $v"
          if (r.chance(40)) (s"ip.protocol != $n0", mustNot(pos))
          else (s"ip.protocol == $n0", pos)
        case 1 => // list mixing a name and a raw number
          val (n0, v) = r.oneOf(named)
          val raw = r.oneOf(Seq(1, 6, 17, 47, 50))
          val pos = s"(ipProtocol = $v OR ipProtocol = $raw)"
          if (r.chance(40)) (s"ip.protocol != [$n0, $raw]", mustNot(pos))
          else (s"ip.protocol == [$n0, $raw]", pos)
        case _ => // order compare goes through the transform too
          val (n0, v) = r.oneOf(named)
          val cmp = r.oneOf(Seq("<", "<=", ">", ">="))
          (s"ip.protocol $cmp $n0", s"ipProtocol $cmp $v")
      }
    } else { // mac.src: dash→colon, multivalued, lotermfield
      val nn = r.nextInt(60)
      val two = f"$nn%02d"
      if (r.chance(60)) {
        val pos = s"list_contains(srcMac, '00:11:22:33:44:$two')"
        if (r.chance(40))
          (s"mac.src != 00-11-22-33-44-$two", mustNot(pos))
        else (s"mac.src == 00-11-22-33-44-$two", pos)
      } else { // wildcard tail after the transform
        val d1 = r.nextInt(6)
        val pos =
          s"len(list_filter(srcMac, x -> x LIKE '00:11:22:33:44:$d1%')) > 0"
        if (r.chance(40))
          (s"mac.src != 00-11-22-33-44-$d1*", mustNot(pos))
        else (s"mac.src == 00-11-22-33-44-$d1*", pos)
      }
    }
  }

  /** The two remaining operand transforms: removeProtocol on http.uri
    * (scheme stripped case-insensitively BEFORE the lowercase fold) and
    * utf8ToHex on payload8.src.utf8 (operand utf8 → lowercase hex with
    * `*` preserved as a wildcard, compared against the hex column).
    */
  private def transform2Leaf(r: Rng): (String, String) = {
    if (r.chance(55)) { // http.uri with a scheme-prefixed operand
      val k = r.nextInt(50); val pn = r.nextInt(5)
      val scheme = r.oneOf(Seq("http://", "HTTPS://", "hTtP://", ""))
      if (r.chance(65)) {
        val v = s"h$k.example.com/p$pn"
        val pos = s"httpUri = '$v'"
        if (r.chance(40)) (s"http.uri != $scheme$v", mustNot(pos))
        else (s"http.uri == $scheme$v", pos)
      } else { // wildcard survives the strip
        val pos = s"httpUri LIKE 'h$k.example.com/%'"
        if (r.chance(40))
          (s"http.uri != ${scheme}h$k.example.com/*", mustNot(pos))
        else (s"http.uri == ${scheme}h$k.example.com/*", pos)
      }
    } else { // payload8 utf8 operand → hex compare
      val n = r.nextInt(3)
      if (r.chance(65)) {
        val pos = s"srcPayload8 = '503$n'" // hex('P') = 50, hex('N') = 3N
        if (r.chance(40)) (s"payload8.src.utf8 != P$n", mustNot(pos))
        else (s"payload8.src.utf8 == P$n", pos)
      } else {
        val pos = "srcPayload8 LIKE '50%'"
        if (r.chance(40)) ("payload8.src.utf8 != P*", mustNot(pos))
        else ("payload8.src.utf8 == P*", pos)
      }
    }
  }

  /** `$shortcut` leaves over number and string lookup lists. */
  private def shortcutLeaf(r: Rng): (String, String) = {
    if (r.chance(50)) {
      val pos = extShortcuts("vips").map(v => s"user_id = $v")
        .mkString("(", " OR ", ")")
      if (r.chance(40)) ("user != $vips", mustNot(pos))
      else ("user == $vips", pos)
    } else {
      val pos = extShortcuts("kinds").map(v => s"event_type = '$v'")
        .mkString("(", " OR ", ")")
      if (r.chance(40)) ("type != $kinds", mustNot(pos))
      else ("type == $kinds", pos)
    }
  }

  /** FLAG_CNT companion leaves: `<field>.cnt` compares the stored
    * array's size — NULL array ⇒ NULL size (non-legacy sizeOfNull), so
    * negated cnt leaves exercise the must_not guard over size().
    */
  private def cntLeaf(r: Rng): (String, String) = {
    val (f, lenSql) = r.oneOf(Seq(
      ("http.host.cnt", "len(httpHost)"),   // sizes: NULL / 0 / 1
      ("mac.src.cnt",   "len(srcMac)"),     // sizes: NULL / 1
      ("dns.host.cnt",  "len(dnsQname)"))) // size: 1
    r.nextInt(4) match {
      case 0 =>
        val n = r.nextInt(3)
        if (r.chance(40)) (s"$f != $n", mustNot(s"$lenSql = $n"))
        else (s"$f == $n", s"$lenSql = $n")
      case 1 =>
        val cmp = r.oneOf(Seq("<", "<=", ">", ">="))
        val n = r.nextInt(2)
        (s"$f $cmp $n", s"$lenSql $cmp $n")
      case 2 =>
        if (r.chance(40)) (s"$f != 0-1", mustNot(s"$lenSql BETWEEN 0 AND 1"))
        else (s"$f == 0-1", s"$lenSql BETWEEN 0 AND 1")
      case _ =>
        val a = r.nextInt(2); val b = r.nextInt(2)
        val pos = s"($lenSql = $a OR $lenSql = $b)"
        if (r.chance(40)) (s"$f != [$a, $b]", mustNot(pos))
        else (s"$f == [$a, $b]", pos)
    }
  }

  /** Saved-view leaves: `view == name` resolves the stored expression's
    * AST in place; `view !=` negates the RESOLVED ast (is-not-true).
    * The pool includes 2- and 3-deep chains and a view with `view !=`
    * inside its body.
    */
  private def viewLeaf(r: Rng): (String, String) = {
    val name = r.oneOf(extViews.keys.toSeq.sorted)
    val sql = extViewSql(name)
    if (r.chance(40)) (s"view != $name", mustNot(sql))
    else (s"view == $name", sql)
  }

  /** Q16 fileand leaves: `file == name` resolves through the files
    * dimension to an OR of (node == n && fileId contains id) terms
    * (viewerUtils.js:152-170); `*` wildcards and /regex/ match file
    * NAMES at resolve time, every node carrying a matched name
    * contributes a term. `file !=` is must_not of the expansion. The
    * frame injects NULL node, NULL fileId and empty fileId rows so
    * the negated form exercises the three-valued guard.
    */
  private def fileLeaf(r: Rng): (String, String) = {
    val (txt, ks) = r.nextInt(4) match {
      case 0 => val k = r.nextInt(7); (s"cap-$k.pcap", Seq(k))
      case 1 => val k = r.nextInt(7); (s"cap-$k*", Seq(k)) // glob tail
      case 2 => ("cap-*", 0 until 7) // match-all glob
      case _ => // regex over names, anchored by the resolver
        val hi = 1 + r.nextInt(5); (s"/cap-[0-$hi].pcap/", 0 to hi)
    }
    val pos = (for (n <- 0 until 3; k <- ks) yield
      s"(node = 'node$n' AND " +
        s"list_contains(fileId, '/data/pcap/cap-$k.pcap'))")
      .mkString("(", " OR ", ")")
    if (r.chance(40)) (s"file != $txt", mustNot(pos))
    else (s"file == $txt", pos)
  }

  private def extLeaf(r: Rng): (String, String) = r.nextInt(14) match {
    case 0 | 1 | 2 => ipLeaf(r)
    case 3 | 4     => hostLeaf(r)
    case 5         => portLeaf(r)
    case 6 | 7     => transformLeaf(r)
    case 8         => shortcutLeaf(r)
    case 9         => cntLeaf(r)
    case 10        => viewLeaf(r)
    case 11        => transform2Leaf(r)
    case 12        => fileLeaf(r)
    case _ => // plain leaves for interplay inside composites
      if (r.chance(50)) {
        val n = r.nextInt(160)
        val cmp = r.oneOf(Seq("<", "<=", ">", ">="))
        (s"user $cmp $n", s"user_id $cmp $n")
      } else {
        val v = r.oneOf(types)
        if (r.chance(40))
          (s"type != $v", mustNot(s"event_type = '$v'"))
        else (s"type == $v", s"event_type = '$v'")
      }
  }

  private def genExt(r: Rng, depth: Int): (String, String) =
    if (depth <= 0 || r.chance(45)) extLeaf(r)
    else r.nextInt(5) match {
      case 0 | 1 =>
        val (ae, as) = genExt(r, depth - 1); val (be, bs) = genExt(r, depth - 1)
        (s"($ae && $be)", s"($as AND $bs)")
      case 2 | 3 =>
        val (ae, as) = genExt(r, depth - 1); val (be, bs) = genExt(r, depth - 1)
        (s"($ae || $be)", s"($as OR $bs)")
      case _ =>
        val (ae, as) = genExt(r, depth - 1)
        (s"!($ae)", mustNot(as))
    }

  /** The seeded extended case list — same on every call. */
  def extCases(n: Int, seed: Long): Seq[Case] = {
    val r = new Rng(seed)
    (0 until n).map { i =>
      val (e, s) = genExt(r, 2)
      Case(i, e, s)
    }
  }

  /** DuckDB oracle for the extended cases: the derived-frame CTE plus
    * one UNION ALL aggregate branch per case.
    */
  def oracleSqlExt(cs: Seq[Case]): String =
    cs.map(c =>
      s"""SELECT CAST(${c.id} AS BIGINT) AS case_id,
          CAST(coalesce(sum(CASE WHEN ${c.sql} THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n FROM d""")
      .mkString(s"WITH d AS ($extFrameSql) SELECT case_id, n FROM (",
        " UNION ALL ", ") ORDER BY case_id")
}
