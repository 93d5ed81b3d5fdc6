package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{IpFunctions, IpUtil}

/** tcpdump/BPF capture-filter subset, compiled once and applied two ways.
  *
  * The reference consumes BPF text in three places: the `bpf=` capture
  * filter handed to pcap_compile at reader start (capture/config.c:480),
  * per-rule `bpf:` fields (capture/rules.c:380), and the
  * `dontSaveBPFs=` / `minPacketsSaveBPFs=` lists whose entries carry an
  * optional `:N` packet cap and are matched per-session at setup
  * (capture/rules.c:573-620). This engine has no libpcap to compile
  * against, so the filter language itself is implemented — one parse,
  * two backends:
  *
  *  - [[packetPredicate]]: `DecodedPacket => Boolean`, the capture-filter
  *    role — applied map-side at ingest BEFORE the sessionize shuffle,
  *    so dropped traffic never costs a codec pack or a shuffle write;
  *  - [[column]]: the same predicate over session-row columns (codegen'd
  *    built-ins; CIDR terms use the native `ip_in_cidr` expression) —
  *    the session-setup rule role (dontSaveBPFs analog) and ad-hoc
  *    store filtering.
  *
  * Supported grammar: `[proto] [src|dst|src or dst] host/net/port/
  * portrange <value>`, bare protocol keywords (`ip ip6 tcp udp icmp
  * icmp6 sctp esp ah gre igmp ospf pim`), `vlan [id]`, `less/greater N`,
  * `and or not && || !` with parens, and tcpdump's qualifier
  * inheritance (`tcp src port 80 or 81` — the second operand reuses
  * `tcp src port`). Unsupported tcpdump forms (ether/gateway/broadcast,
  * raw byte offsets `tcp[13]`) fail the parse loudly.
  *
  * Divergence, documented: `vlan` here is a plain membership test over
  * the decoded VLAN ids — the pcap offset-shifting trick tcpdump needs
  * (each `vlan` moves subsequent accessors 4 bytes) is meaningless
  * after [[Decode]] has already peeled the tags.
  */
object Bpf {

  sealed trait Dir
  case object AnyDir extends Dir
  case object SrcDir extends Dir
  case object DstDir extends Dir

  sealed trait Node
  final case class HostP(dir: Dir, ip: String) extends Node
  final case class NetP(dir: Dir, cidr: String) extends Node
  final case class PortP(dir: Dir, lo: Int, hi: Int) extends Node
  final case class ProtoP(name: String) extends Node
  final case class VlanP(id: Option[Int]) extends Node
  /** `less`/`greater N` — wire length bound (inclusive, like tcpdump). */
  final case class LenP(greater: Boolean, n: Int) extends Node
  final case class AndN(a: Node, b: Node) extends Node
  final case class OrN(a: Node, b: Node) extends Node
  final case class NotN(a: Node) extends Node

  /** IANA protocol numbers for the keyword primitives. */
  private val protoNum = Map("icmp" -> 1, "igmp" -> 2, "tcp" -> 6,
    "udp" -> 17, "gre" -> 47, "esp" -> 50, "ah" -> 51, "icmp6" -> 58,
    "ospf" -> 89, "pim" -> 103, "sctp" -> 132)
  /** Protocol keywords usable as a qualifier before host/net/port. */
  private val protoKw = protoNum.keySet ++ Set("ip", "ip6")

  // ------------------------------------------------------------- parse
  /** Tokenize with an anchored scan so NO character can slip through
    * unmatched: `findAllIn` would silently skip a lone `&`/`|` (turning
    * `tcp &` into `tcp`), violating the fail-loudly contract.
    */
  private def lex(expr: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile("\\s+|\\(|\\)|&&|\\|\\||!|[^\\s()!|&]+").matcher(expr)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < expr.length) {
      m.region(i, expr.length)
      if (!m.lookingAt()) throw new IllegalArgumentException(
        s"bpf: unexpected character '${expr(i)}' in '$expr'")
      val t = m.group()
      if (!t.charAt(0).isWhitespace) out += t
      i = m.end()
    }
    out.result()
  }

  def parse(expr: String): Node = {
    val toks = scala.collection.mutable.Queue(lex(expr): _*)
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"bpf: unsupported or malformed near '$what' in '$expr'")
    def next(): String = if (toks.isEmpty) fail("<end>") else toks.dequeue()
    // inheritance state: the last (protoQual, dir, type) a value bound to
    var lastQual: Option[(Option[String], Dir, String)] = None

    def ipValue(v: String): String =
      if (IpUtil.toBytes(v) == null) fail(v) else v
    def portValue(v: String): Int = {
      if (!v.forall(_.isDigit)) fail(v)
      val n = v.toInt
      if (n > 0xffff) fail(v) else n
    }
    def valued(qual: Option[String], dir: Dir, typ: String,
        v: String): Node = {
      lastQual = Some((qual, dir, typ))
      val base = typ match {
        case "host" => HostP(dir, ipValue(v))
        case "net" =>
          val norm = IpUtil.expandShorthand(v)
          if (IpUtil.parseCidr(norm).isEmpty) fail(v)
          NetP(dir, norm)
        case "port" =>
          val p = portValue(v); PortP(dir, p, p)
        case "portrange" => v.split("-", 2) match {
          case Array(a, b) =>
            val (lo, hi) = (portValue(a), portValue(b))
            if (lo > hi) fail(v) else PortP(dir, lo, hi)
          case _ => fail(v)
        }
        case other => fail(other)
      }
      qual.map(q => AndN(ProtoP(q), base)).getOrElse(base)
    }
    // `[src|dst|src or dst] host|net|port|portrange value`, with the
    // optional proto qualifier already consumed by the caller
    def qualified(qual: Option[String]): Node = {
      val dir = toks.headOption match {
        case Some("src") =>
          next()
          // `src or dst` / `src and dst`: tcpdump's explicit any-forms
          if (toks.headOption.contains("or") && toks.lift(1).contains("dst")) {
            next(); next(); AnyDir
          } else SrcDir
        case Some("dst") =>
          next()
          if (toks.headOption.contains("or") && toks.lift(1).contains("src")) {
            next(); next(); AnyDir
          } else DstDir
        case _ => AnyDir
      }
      next() match {
        case t @ ("host" | "net" | "port" | "portrange") =>
          valued(qual, dir, t, next())
        case v if dir != AnyDir =>
          // `src 10.1.1.1` — tcpdump defaults the type to host
          valued(qual, dir, "host", v)
        case other => fail(other)
      }
    }
    def primary(): Node = next() match {
      case "(" =>
        val e = or()
        if (toks.isEmpty || next() != ")") fail(")")
        e
      case "not" | "!" => NotN(unary())
      case t @ ("src" | "dst" | "host" | "net" | "port" | "portrange") =>
        toks.prepend(t); qualified(None)
      case "vlan" =>
        val id = toks.headOption.filter(_.forall(_.isDigit))
          .map { v => next(); v.toInt }
        VlanP(id)
      case t @ ("less" | "greater") =>
        val v = next()
        if (!v.forall(_.isDigit)) fail(v)
        LenP(t == "greater", v.toInt)
      case t if protoKw(t) =>
        // qualifier if a primitive follows; bare protocol otherwise
        lastQual = Some((Some(t), AnyDir, ""))
        toks.headOption match {
          case Some("src" | "dst" | "host" | "net" | "port" | "portrange") =>
            qualified(Some(t))
          case _ => ProtoP(t)
        }
      case t =>
        // bare value — tcpdump qualifier inheritance from the previous
        // primitive (`port 80 or 443`)
        lastQual match {
          case Some((q, d, typ)) if typ.nonEmpty => valued(q, d, typ, t)
          case _ => fail(t)
        }
    }
    // `src`/`dst` can open a primitive with no type keyword before it
    def unary(): Node = toks.headOption match {
      case Some("src" | "dst") => qualified(None)
      case _ => primary()
    }
    def and(): Node = {
      var e = unary()
      while (toks.headOption.exists(t => t == "and" || t == "&&")) {
        next(); e = AndN(e, unary())
      }
      e
    }
    def or(): Node = {
      var e = and()
      while (toks.headOption.exists(t => t == "or" || t == "||")) {
        next(); e = OrN(e, and())
      }
      e
    }
    val e = or()
    if (toks.nonEmpty) fail(toks.head)
    e
  }

  // -------------------------------------------------- packet predicate
  /** Capture-filter backend: a pure function over decoded packets, for
    * map-side ingest filtering before the sessionize shuffle.
    */
  def packetPredicate(expr: String): Decode.DecodedPacket => Boolean =
    packetPredicate(parse(expr))

  def packetPredicate(n: Node): Decode.DecodedPacket => Boolean = n match {
    case HostP(dir, ip) =>
      val want = IpUtil.toBytes(ip)
      def eq(s: String): Boolean =
        java.util.Arrays.equals(IpUtil.toBytes(s), want)
      dirPred(dir, p => eq(p.srcIp), p => eq(p.dstIp))
    case NetP(dir, cidr) =>
      val c = IpUtil.parseCidr(cidr).get
      def in(s: String): Boolean = {
        val b = IpUtil.toBytes(s); b != null && c.contains(b)
      }
      dirPred(dir, p => in(p.srcIp), p => in(p.dstIp))
    case PortP(dir, lo, hi) =>
      dirPred(dir, p => p.srcPort >= lo && p.srcPort <= hi,
        p => p.dstPort >= lo && p.dstPort <= hi)
    // indexOf, not contains(char): this predicate runs per PACKET on the
    // capture-filter map side, and Scala's Char contains boxes
    case ProtoP("ip") => p => p.srcIp != null && p.srcIp.indexOf(':') < 0
    case ProtoP("ip6") => p => p.srcIp != null && p.srcIp.indexOf(':') >= 0
    case ProtoP(name) =>
      val num = protoNum(name); p => p.ipProtocol == num
    case VlanP(None) => p => p.vlanIds.nonEmpty
    case VlanP(Some(id)) => p => p.vlanIds.contains(id)
    case LenP(true, v) => p => p.wireLen >= v
    case LenP(false, v) => p => p.wireLen <= v
    case AndN(a, b) =>
      val (fa, fb) = (packetPredicate(a), packetPredicate(b))
      p => fa(p) && fb(p)
    case OrN(a, b) =>
      val (fa, fb) = (packetPredicate(a), packetPredicate(b))
      p => fa(p) || fb(p)
    case NotN(a) => val f = packetPredicate(a); p => !f(p)
  }

  private def dirPred(dir: Dir, src: Decode.DecodedPacket => Boolean,
      dst: Decode.DecodedPacket => Boolean): Decode.DecodedPacket => Boolean =
    dir match {
      case SrcDir => src
      case DstDir => dst
      case AnyDir => p => src(p) || dst(p)
    }

  // ------------------------------------------------------ column form
  /** The session-row columns a BPF term can reference. `vlans` is an
    * array<int> column; `len` a network-bytes column; omit either and a
    * filter using `vlan`/`less`/`greater` fails compile loudly instead
    * of matching nothing.
    */
  final case class Fields(srcIp: Column, dstIp: Column, srcPort: Column,
      dstPort: Column, proto: Column, vlans: Option[Column] = None,
      len: Option[Column] = None)

  /** Session-rule backend: the filter as a codegen'd Column (CIDR terms
    * ride the native `ip_in_cidr` expression).
    */
  def column(expr: String, f: Fields): Column = column(parse(expr), f)

  def column(n: Node, f: Fields): Column = n match {
    case HostP(dir, ip) =>
      val canon = IpUtil.canonical(IpUtil.toBytes(ip))
      dirCol(dir, f.srcIp === canon, f.dstIp === canon)
    case NetP(dir, cidr) =>
      dirCol(dir, IpFunctions.ipInCidr(f.srcIp, cidr),
        IpFunctions.ipInCidr(f.dstIp, cidr))
    case PortP(dir, lo, hi) =>
      dirCol(dir, f.srcPort.between(lo, hi), f.dstPort.between(lo, hi))
    case ProtoP("ip") => !f.srcIp.contains(":")
    case ProtoP("ip6") => f.srcIp.contains(":")
    case ProtoP(name) => f.proto === protoNum(name)
    case VlanP(id) =>
      val c = f.vlans.getOrElse(throw new IllegalArgumentException(
        "bpf: 'vlan' term needs a vlans column"))
      id.map(i => array_contains(c, i)).getOrElse(size(c) > 0)
    case LenP(greater, v) =>
      val c = f.len.getOrElse(throw new IllegalArgumentException(
        "bpf: 'less/greater' term needs a len column"))
      if (greater) c >= v else c <= v
    case AndN(a, b) => column(a, f) && column(b, f)
    case OrN(a, b) => column(a, f) || column(b, f)
    // is-not-true, not three-valued NOT: a term over a NULL field (no
    // ports on ICMP, no vlan ids) is FALSE on the packet backend, so
    // its negation must be TRUE here too — bare `!` would keep NULL and
    // silently drop the row in a filter. NULL ≡ FALSE already holds
    // through and/or in filter context, so the coalesce is only needed
    // at the negation boundary.
    case NotN(a) => !coalesce(column(a, f), lit(false))
  }

  private def dirCol(dir: Dir, src: Column, dst: Column): Column =
    dir match {
      case SrcDir => src
      case DstDir => dst
      case AnyDir => src || dst
    }

  // ------------------------------------------- dontSaveBPFs-style lists
  /** Parse `dontSaveBPFs` / `minPacketsSaveBPFs` entries — `expr` or
    * `expr:N` with the cap defaulting to 1, exactly the
    * `:\s*(\d+)\s*$` split of capture/rules.c:573-620.
    */
  def parseSaveList(entries: Seq[String]): Seq[(Node, Int)] =
    entries.map { e =>
      ":\\s*(\\d+)\\s*$".r.findFirstMatchIn(e) match {
        case Some(m) => (parse(e.substring(0, m.start)), m.group(1).toInt)
        case None => (parse(e), 1)
      }
    }

  /** The per-session packet-save cap a dontSaveBPFs list implies: the
    * LAST matching entry's cap, null when none match. The reference
    * loads each list entry as a session-setup rule in order and each
    * matching rule's field-op overwrites `_maxPacketsToSave`
    * (capture/rules.c:573-596), so with several matching entries the
    * last one listed governs.
    */
  def maxPacketsToSave(entries: Seq[String], f: Fields): Column = {
    val rules = parseSaveList(entries)
    if (rules.isEmpty) lit(null).cast("int")
    else coalesce(rules.reverse.map { case (n, cap) =>
      when(column(n, f), lit(cap))
    } :+ lit(null).cast("int"): _*)
  }

  /** `minPacketsSaveBPFs` gate: keep a session's SPI row unless a
    * matching entry demands more packets than the session carried (the
    * reference's `_minPacketsBeforeSavingSPI` drop of scanner noise,
    * capture/rules.c:597-620 + session save check). As with
    * [[maxPacketsToSave]], the LAST matching entry's threshold governs
    * (in-order field-op overwrite).
    */
  def keepSpi(entries: Seq[String], f: Fields,
      totPackets: Column): Column = {
    val rules = parseSaveList(entries)
    if (rules.isEmpty) lit(true)
    else {
      val need = coalesce(rules.reverse.map { case (n, min) =>
        when(column(n, f), lit(min))
      } :+ lit(null).cast("int"): _*)
      need.isNull || totPackets >= need
    }
  }
}
