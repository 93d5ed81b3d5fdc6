package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{AppProtocols, DnsParser}

/** Differential fuzz of the DNS message walker against an independent
  * transcription of the reference's dns.c/bsb.h machine (the pattern
  * that found 6 divergences in ASN.1, 12 in HTTP, 9 in SMTP). The
  * production walker is graft.etl.DnsParser (BSB-class style); the
  * model below is a second, integer-cursor transcription written
  * directly from capture/parsers/dns.c:86-439 + capture/bsb.h.
  *
  * Quirk surface both transcribe (and the generator aims at):
  *  - `ch & 0xc0` pointer test: length bytes 0x40-0xbf are POINTERS;
  *  - at most 6 pointer jumps, the 7th kills the name (NULL) which
  *    breaks only the CURRENT record section's loop (dns.c:306-307);
  *  - a pointer u16 that runs off the end errors the outer walk but
  *    the name keeps walking from message offset 0 (tpos stays 0);
  *  - a pointer target past the end = error-state BSB (remaining 0);
  *  - caret/meta encoding of label bytes (M- for bit 7, ^ for
  *    non-printables, dns.c:86-113) into an 8000-byte capped buffer;
  *  - a label overrunning the remaining bytes consumes its length
  *    byte, drops the pending dot, and keeps walking (dns.c:152-153);
  *  - len<17 / opcode>5 / qd outside 1..10 record nothing;
  *  - class != IN rdata skipped whole; A/AAAA with wrong rdlength add
  *    nothing but still skip;
  *  - NS/CNAME/MX whose rdata name is empty/errored `continue` PAST
  *    the rdlength skip — the next RR parses from inside the rdata;
  *  - dns_find_host attribution state spans all messages of a session.
  *
  * The g_hostname_to_unicode seam (idnHost) is shared by both sides —
  * value decoding is golden-pinned elsewhere; this fuzz targets the
  * structural walk.
  */
class DnsDifferentialFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- model

  private final case class MInfo(
      qname: Seq[String], qtype: Seq[String], rcode: Seq[String],
      opcode: Seq[String], qclass: Seq[String], ip: Seq[String],
      mxHost: Seq[String], nsHost: Seq[String], nsIp: Seq[String],
      mxIp: Seq[String], puny: Seq[String])

  private final class MState {
    val hosts = scala.collection.mutable.HashSet[String]()
    val ns = scala.collection.mutable.HashSet[String]()
    val mx = scala.collection.mutable.HashSet[String]()
  }

  /** independent tables (typed from dns.c:622-683 / dns.c:21-22, NOT
    * read from AppProtocols)
    */
  private val mTypes = Map(1 -> "A", 2 -> "NS", 3 -> "MD", 4 -> "MF",
    5 -> "CNAME", 6 -> "SOA", 7 -> "MB", 8 -> "MG", 9 -> "MR",
    10 -> "NULL", 11 -> "WKS", 12 -> "PTR", 13 -> "HINFO", 14 -> "MINFO",
    15 -> "MX", 16 -> "TXT", 17 -> "RP", 18 -> "AFSDB", 19 -> "X25",
    20 -> "ISDN", 21 -> "RT", 22 -> "NSAP", 23 -> "NSAPPTR", 24 -> "SIG",
    25 -> "KEY", 26 -> "PX", 27 -> "GPOS", 28 -> "AAAA", 29 -> "LOC",
    30 -> "NXT", 31 -> "EID", 32 -> "NIMLOC", 33 -> "SRV", 34 -> "ATMA",
    35 -> "NAPTR", 36 -> "KX", 37 -> "CERT", 38 -> "A6", 39 -> "DNAME",
    40 -> "SINK", 41 -> "OPT", 42 -> "APL", 43 -> "DS", 44 -> "SSHFP",
    46 -> "RRSIG", 47 -> "NSEC", 48 -> "DNSKEY", 49 -> "DHCID",
    50 -> "NSEC3", 51 -> "NSEC3PARAM", 52 -> "TLSA", 55 -> "HIP",
    99 -> "SPF", 249 -> "TKEY", 250 -> "TSIG", 252 -> "AXFR",
    253 -> "MAILB", 254 -> "MAILA", 255 -> "ANY")
  private val mClasses =
    Map(1 -> "IN", 2 -> "CS", 3 -> "CH", 4 -> "HS", 255 -> "ANY")
  private val mStatuses = Array("NOERROR", "FORMERR", "SERVFAIL",
    "NXDOMAIN", "NOTIMPL", "REFUSED", "YXDOMAIN", "YXRRSET", "NXRRSET",
    "NOTAUTH", "NOTZONE", "11", "12", "13", "14", "15")
  private val mOpcodes =
    Array("QUERY", "IQUERY", "STATUS", "3", "NOTIFY", "UPDATE")

  /** shared seam (see DnsParser.idnHost) */
  private def idn(rawLower: String): String =
    if (!rawLower.contains("xn--")) rawLower
    else try java.net.IDN.toUnicode(rawLower)
    catch { case _: Exception => rawLower }

  /** dns_name model. Walks the name at inPos within [inPos, inEnd);
    * returns (name or null, in-cursor after the walk, in-cursor error).
    */
  private def mWalkName(msg: Array[Byte], inPos0: Int, inEnd: Int,
      inErr0: Boolean): (String, Int, Boolean) = {
    val sb = new StringBuilder
    var overflow = false
    def put(c: Int): Unit =
      if (!overflow && sb.length < 8000) sb.append(c.toChar)
      else overflow = true
    var jumps = 0
    var onIn = true
    var inPosAtJump = inPos0 // in-cursor frozen at the first jump
    var inErr = inErr0
    var pos = inPos0
    var end = if (inErr0) inPos0 else inEnd // errored bsb has remaining 0
    def ret(n: String): (String, Int, Boolean) =
      (n, if (onIn) pos else inPosAtJump, inErr)
    while (pos < end) {
      val ch = msg(pos) & 0xff
      if (ch == 0) { pos += 1; return ret(sb.toString) }
      if ((ch & 0xc0) != 0) {
        if (jumps > 5) return ret(null)
        jumps += 1
        var t = 0
        if (pos + 2 <= end) {
          t = (((msg(pos) & 0xff) << 8) | (msg(pos + 1) & 0xff)) & 0x3fff
          pos += 2
        } else if (onIn) inErr = true // cursor not advanced, t stays 0
        if (onIn) { inPosAtJump = pos; onIn = false }
        pos = t
        end = if (t > msg.length) t else msg.length // past-end: empty window
      } else {
        if (sb.length > 0) put('.')
        pos += 1 // length byte consumed
        if (ch > end - pos) {
          // overrun: drop the pending dot unless the buffer overflowed
          if (!overflow && sb.length > 0) sb.setLength(sb.length - 1)
        } else {
          var j = 0
          while (j < ch) {
            var c = msg(pos) & 0xff
            pos += 1
            if (c > 0x7f) { put('M'); put('-'); c &= 0x7f }
            if (c < 0x20 || c == 0x7f) { put('^'); c ^= 0x40 }
            put(c)
            j += 1
          }
        }
      }
    }
    ret(sb.toString)
  }

  private def mParse(msg: Array[Byte], st: MState): Option[MInfo] = {
    if (msg.length < 17) return None
    val qr = ((msg(2) & 0xff) >> 7) == 1
    val opcode = ((msg(2) & 0xff) >> 3) & 0xf
    if (opcode > 5) return None
    def c16(i: Int) = ((msg(i) & 0xff) << 8) | (msg(i + 1) & 0xff)
    val qd = c16(4)
    if (qd <= 0 || qd > 10) return None
    val counts = Array(c16(6), c16(8), c16(10))

    var pos = 12
    var err = false
    val end = msg.length
    def u16(): Int =
      if (!err && pos + 2 <= end) { val v = c16(pos); pos += 2; v }
      else { err = true; 0 }
    def skip(n: Int): Unit =
      if (!err && pos + n <= end) pos += n else err = true
    def remaining: Int = if (err) 0 else end - pos

    val qname = Seq.newBuilder[String]
    val qtype = Seq.newBuilder[String]
    val qclass = Seq.newBuilder[String]
    val ip = Seq.newBuilder[String]
    val nsHost = Seq.newBuilder[String]
    val mxHost = Seq.newBuilder[String]
    val nsIp = Seq.newBuilder[String]
    val mxIp = Seq.newBuilder[String]
    val puny = Seq.newBuilder[String]
    def addHost(raw: String,
        out: scala.collection.mutable.Builder[String, Seq[String]],
        set: scala.collection.mutable.HashSet[String]): Unit = {
      val h = idn(raw.toLowerCase)
      out += h
      set += h
      if (raw.contains("xn--")) puny += raw.toLowerCase
    }
    def walk(): String = { // name at the outer cursor
      val (n, p2, e2) = mWalkName(msg, pos, end, err)
      pos = p2; err = e2; n
    }

    var i = 0
    var stop = false
    while (!stop && !err && i < qd) {
      val n = walk()
      if (err || n == null) stop = true
      else {
        val disp = if (n.isEmpty) "<root>" else n
        val qt = u16()
        val qc = u16()
        if (opcode != 5) {
          if (qc <= 255) mClasses.get(qc).foreach(qclass += _)
          if (qt <= 255) mTypes.get(qt).foreach(qtype += _)
          addHost(disp, qname, st.hosts)
        }
        i += 1
      }
    }
    val opName = mOpcodes(opcode)
    if (!qr && opcode != 5)
      return Some(MInfo(qname.result(), qtype.result(), Nil, Seq(opName),
        qclass.result(), Nil, Nil, Nil, Nil, Nil,
        puny.result().distinct))
    val status = if (qr) Seq(mStatuses(msg(3) & 0xf)) else Nil

    var sec = 0
    while (sec < 3) {
      var r = 0
      var secStop = false
      while (!secStop && !err && r < counts(sec)) {
        val owner = walk()
        if (err || owner == null) secStop = true
        else {
          val atype = u16()
          val aclass = u16()
          skip(4)
          val rdlen = u16()
          if (remaining < rdlen) secStop = true
          else if (aclass != 1) { skip(rdlen); r += 1 }
          else {
            var doSkip = true
            atype match {
              case 1 if rdlen == 4 =>
                val a = (pos until pos + 4).map(msg(_) & 0xff).mkString(".")
                if (opcode == 5) { ip += a; addHost(owner, qname, st.hosts) }
                else {
                  if (st.hosts.contains(idn(owner.toLowerCase))) ip += a
                  if (st.ns.contains(idn(owner.toLowerCase))) nsIp += a
                  if (st.mx.contains(idn(owner.toLowerCase))) mxIp += a
                }
              case 28 if rdlen == 16 =>
                val a = graft.functions.IpUtil.expanded(
                  java.util.Arrays.copyOfRange(msg, pos, pos + 16))
                if (opcode == 5) { ip += a; addHost(owner, qname, st.hosts) }
                else {
                  if (st.hosts.contains(idn(owner.toLowerCase))) ip += a
                  if (st.ns.contains(idn(owner.toLowerCase))) nsIp += a
                  if (st.mx.contains(idn(owner.toLowerCase))) mxIp += a
                }
              case 2 | 5 | 15 =>
                // rdata window name; MX skips a 2-byte preference first
                // (the skip on rdlen < 2 errors the window outright)
                val mxShort = atype == 15 && rdlen < 2
                val wStart = if (atype == 15) pos + 2 else pos
                val (h, _, we) =
                  mWalkName(msg, wStart, pos + rdlen, inErr0 = mxShort)
                if (h == null || h.isEmpty || we || mxShort)
                  doSkip = false // the C `continue` bypasses the skip
                else atype match {
                  case 2 => addHost(h, nsHost, st.ns)
                  case 5 => addHost(h, qname, st.hosts)
                  case _ => addHost(h, mxHost, st.mx)
                }
              case _ => // A/AAAA wrong rdlen or unknown type: just skip
            }
            if (doSkip) skip(rdlen)
            r += 1
          }
        }
      }
      sec += 1
    }
    Some(MInfo(qname.result(), qtype.result(), status, Seq(opName),
      qclass.result(), ip.result().distinct, mxHost.result().distinct,
      nsHost.result().distinct, nsIp.result().distinct,
      mxIp.result().distinct, puny.result().distinct))
  }

  // ------------------------------------------------------------- compare

  private def hex(msg: Array[Byte]): String =
    msg.grouped(16).zipWithIndex.map { case (g, i) =>
      f"${i * 16}%04x  " + g.map(b => f"$b%02x").mkString(" ")
    }.mkString("\n")

  private def compare(msgs: Seq[Array[Byte]], label: String): Unit = {
    val mSt = new MState
    val pSt = new DnsParser.State
    msgs.zipWithIndex.foreach { case (msg, k) =>
      val m = mParse(msg, mSt)
      val p = DnsParser.parseMessage(msg, pSt)
      val mv = m.map(x => Seq(
        "qname" -> x.qname, "qtype" -> x.qtype, "rcode" -> x.rcode,
        "opcode" -> x.opcode, "qclass" -> x.qclass, "ip" -> x.ip,
        "mxHost" -> x.mxHost, "nsHost" -> x.nsHost, "nsIp" -> x.nsIp,
        "mxIp" -> x.mxIp, "puny" -> x.puny))
      val pv = p.map(x => Seq(
        "qname" -> x.qname, "qtype" -> x.qtype, "rcode" -> x.rcode,
        "opcode" -> x.opcode, "qclass" -> x.qclass, "ip" -> x.ip,
        "mxHost" -> x.mailserverHost, "nsHost" -> x.nameserverHost,
        "nsIp" -> x.nameserverIp, "mxIp" -> x.mailserverIp,
        "puny" -> x.puny))
      (mv, pv) match {
        case (None, None) => ()
        case (Some(a), Some(b)) =>
          val diffs = a.zip(b).filter { case ((_, x), (_, y)) => x != y }
          assert(diffs.isEmpty, s"\n[$label msg $k]\n" +
            diffs.map { case ((f, x), (_, y)) =>
              s"  $f:\n    model=$x\n    ours =$y"
            }.mkString("\n") + "\n" + hex(msg))
        case _ =>
          fail(s"[$label msg $k] model=${mv.isDefined} ours=${pv.isDefined}\n" +
            hex(msg))
      }
    }
  }

  // ------------------------------------------------------------ generator

  private final class Rng(var seed: Long) {
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  private final class Enc {
    val buf = new java.io.ByteArrayOutputStream
    def pos: Int = buf.size
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u16(v: Int): Unit = { buf.write((v >> 8) & 0xff); buf.write(v & 0xff) }
    def bytes(bs: Array[Byte]): Unit = buf.write(bs, 0, bs.length)
  }

  /** emit a name; returns its start offset. Mixes ordinary labels,
    * hostile bytes, pointer-ish lengths, real pointers (incl. loops and
    * wild offsets), truncations and missing terminators.
    */
  private def genName(e: Enc, rng: Rng, priorNames: Seq[Int],
      terminate: Boolean = true): Int = {
    val start = e.pos
    val nLabels = rng.nextInt(4)
    for (_ <- 0 until nLabels) {
      rng.nextInt(10) match {
        case 0 => // hostile bytes: non-ascii / control chars
          val len = 1 + rng.nextInt(6)
          e.u8(len)
          for (_ <- 0 until len) e.u8(rng.pick(Seq(
            rng.nextInt(256), 0x80 + rng.nextInt(128), rng.nextInt(0x20),
            0x7f, 0xff, 'a' + rng.nextInt(26))))
        case 1 => // xn-- label (sometimes valid punycode)
          val s = rng.pick(Seq("xn--bcher-kva", "xn--zzzz", "XN--MixEd",
            "axn--inside"))
          e.u8(s.length); e.bytes(s.getBytes(StandardCharsets.ISO_8859_1))
        case 2 if rng.chance(50) => // long label
          val len = 40 + rng.nextInt(24) // 40..63
          e.u8(len)
          for (_ <- 0 until len) e.u8('a' + rng.nextInt(26))
        case _ =>
          val len = 1 + rng.nextInt(12)
          e.u8(len)
          for (_ <- 0 until len) e.u8(rng.pick(
            ("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_" )
              .map(_.toInt)))
      }
    }
    rng.nextInt(12) match {
      case 0 if priorNames.nonEmpty => // real pointer to an earlier name
        val t = rng.pick(priorNames)
        e.u8(0xc0 | ((t >> 8) & 0x3f)); e.u8(t & 0xff)
      case 1 => // wild pointer: header, self, past-end, random
        val t = rng.pick(Seq(0, 2, start, e.pos, e.pos + 40,
          rng.nextInt(0x4000)))
        e.u8(0xc0 | ((t >> 8) & 0x3f)); e.u8(t & 0xff)
      case 2 => // pointer-ish length byte (0x40-0xbf): the `& 0xc0` quirk
        e.u8(rng.pick(Seq(0x40, 0x41, 0x7f, 0x80, 0xbf)))
        e.u8(rng.nextInt(256))
      case 3 => // overrun label length then maybe nothing
        e.u8(50 + rng.nextInt(14))
        for (_ <- 0 until rng.nextInt(5)) e.u8('x')
      case _ if terminate => e.u8(0)
      case _ => ()
    }
    start
  }

  private def genMessage(rng: Rng, recipe: StringBuilder): Array[Byte] = {
    val e = new Enc
    val qr = rng.chance(60)
    val opcode = rng.pick(Seq(0, 0, 0, 0, 1, 2, 4, 5, 5, 3, 6 + rng.nextInt(10)))
    val rcode = rng.nextInt(16)
    e.u16(rng.nextInt(0x10000)) // id
    e.u8(((if (qr) 1 else 0) << 7) | (opcode << 3) | rng.nextInt(4))
    e.u8((rng.nextInt(4) << 6) | rcode)
    val qd = rng.pick(Seq(0, 1, 1, 1, 2, 3, 11, rng.nextInt(0x10000)))
    val anN = rng.nextInt(4)
    val nsN = rng.nextInt(3)
    val arN = rng.nextInt(3)
    e.u16(qd)
    // counts sometimes lie relative to the actual records
    def fudge(n: Int): Int =
      if (rng.chance(15)) math.max(0, n + rng.nextInt(3) - 1) else n
    e.u16(fudge(anN)); e.u16(fudge(nsN)); e.u16(fudge(arN))
    recipe.append(s"qr=$qr op=$opcode qd=$qd an=$anN ns=$nsN ar=$arN ")

    val names = scala.collection.mutable.ArrayBuffer[Int]()
    val emitQd = math.min(if (qd > 3) 1 else qd, 3)
    for (_ <- 0 until emitQd) {
      names += genName(e, rng, names.toSeq)
      e.u16(rng.pick(Seq(1, 1, 1, 2, 5, 15, 16, 28, 45, 57, 255, 256,
        rng.nextInt(0x10000))))
      e.u16(rng.pick(Seq(1, 1, 1, 2, 3, 4, 254, 255, 0,
        rng.nextInt(0x10000))))
    }
    for (_ <- 0 until anN + nsN + arN) {
      names += genName(e, rng, names.toSeq)
      val atype = rng.pick(Seq(1, 1, 1, 28, 2, 5, 15, 16, 6, 41,
        rng.nextInt(300)))
      e.u16(atype)
      e.u16(rng.pick(Seq(1, 1, 1, 1, 3, 255, 0))) // class: mostly IN
      e.u16(0); e.u16(rng.nextInt(3600)) // ttl
      atype match {
        case 1 =>
          val l = rng.pick(Seq(4, 4, 4, 3, 5, 0))
          e.u16(l); for (_ <- 0 until l) e.u8(rng.nextInt(256))
        case 28 =>
          val l = rng.pick(Seq(16, 16, 16, 15, 17))
          e.u16(l); for (_ <- 0 until l) e.u8(rng.nextInt(256))
        case 2 | 5 | 15 =>
          val inner = new Enc
          if (atype == 15 && !rng.chance(15)) inner.u16(rng.nextInt(100))
          if (rng.chance(12)) { /* empty rdata name */ inner.u8(0) }
          else genName(inner, rng, names.toSeq)
          val rd = inner.buf.toByteArray
          // sometimes declare a SHORTER rdlength than the name needs
          val declared =
            if (rng.chance(15)) rng.nextInt(rd.length + 1) else rd.length
          e.u16(declared); e.bytes(rd)
        case _ =>
          val l = rng.nextInt(20)
          e.u16(l); for (_ <- 0 until l) e.u8(rng.nextInt(256))
      }
    }
    var out = e.buf.toByteArray
    if (rng.chance(12) && out.length > 2) {
      out = out.take(1 + rng.nextInt(out.length - 1))
      recipe.append("trunc ")
    }
    if (rng.chance(18) && out.length >= 4) {
      recipe.append("mut ")
      val b = scala.collection.mutable.ArrayBuffer(out: _*)
      for (_ <- 0 to rng.nextInt(4)) {
        val i = rng.nextInt(b.length)
        rng.nextInt(3) match {
          case 0 => b(i) = rng.nextInt(256).toByte
          case 1 => b.remove(i)
          case 2 => b.insert(i, b(i))
        }
      }
      out = b.toArray
    }
    out
  }

  // --------------------------------------------------------------- tests

  test("generated messages: walker matches the dns.c model") {
    // soak knobs: GRAFT_FUZZ_TRIALS=30000 GRAFT_FUZZ_SEED=0x... sbt test
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(1500)
    val rng = new Rng(sys.env.get("GRAFT_FUZZ_SEED")
      .map(java.lang.Long.decode(_).longValue).getOrElse(0xd0517L))
    for (trial <- 0 until nTrials) {
      val recipe = new StringBuilder
      val nMsgs = 1 + rng.nextInt(3) // thread session state across them
      val msgs = (0 until nMsgs).map(_ => genMessage(rng, recipe))
      compare(msgs, s"trial $trial: $recipe")
    }
  }

  test("pinned dns.c quirks") {
    def msg(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    def header(qr: Boolean, opcode: Int, qd: Int, an: Int, ns: Int,
        ar: Int, rcode: Int = 0): Seq[Int] =
      Seq(0, 1, ((if (qr) 1 else 0) << 7) | (opcode << 3), rcode,
        qd >> 8, qd & 0xff, an >> 8, an & 0xff, ns >> 8, ns & 0xff,
        ar >> 8, ar & 0xff)

    // 1. length byte 0x41 ('A') is a POINTER (ch & 0xc0), not a label
    val m1 = msg(header(qr = false, 0, 1, 0, 0, 0) ++ Seq(
      3, 'f', 'o', 'o', 0x41, 'b', 0, 0, 1, 0, 1): _*)
    compare(Seq(m1), "0x41 length is a pointer")

    // 2. caret/meta encoding of hostile label bytes
    val m2 = msg(header(qr = false, 0, 1, 0, 0, 0) ++ Seq(
      4, 0x81, 0x07, 0xff, 'a', 0, 0, 1, 0, 1): _*)
    compare(Seq(m2), "caret-meta encoding")
    val i2 = AppProtocols.parseDnsMessage(m2).get
    // 0x81 -> M-^A, 0x07 -> ^G, 0xff -> M- then 0x7f -> ^?
    assert(i2.qname == Seq("m-^a^gm-^?a"),
      s"expected the reference's M-^A^GM-^?a form lowered, got ${i2.qname}")

    // 3. truncated label: length byte consumed, dot dropped, walk continues
    val m3 = msg(header(qr = false, 0, 1, 0, 0, 0) ++ Seq(
      2, 'h', 'i', 60, 1, 'x', 0): _*)
    compare(Seq(m3), "overrun label keeps walking")

    // 4. class CH A record is skipped whole
    val owner = Seq(1, 'q', 0)
    val m4 = msg(header(qr = true, 0, 1, 1, 0, 0) ++
      owner ++ Seq(0, 1, 0, 1) ++ // question q/A/IN
      Seq(0xc0, 12, 0, 1, 0, 3, 0, 0, 0, 0, 0, 4, 9, 9, 9, 9): _*)
    compare(Seq(m4), "class CH skipped")
    assert(AppProtocols.parseDnsMessage(m4).get.ip.isEmpty)

    // 5. CNAME whose rdata name errors: rdlength NOT skipped — the next
    // record parses from inside the rdata
    val m5 = msg(header(qr = true, 0, 1, 2, 0, 0) ++
      owner ++ Seq(0, 1, 0, 1) ++
      // CNAME owner=ptr(q), rdlength=14, rdata = truncated label 40
      // then a full well-formed A record INSIDE the rdata
      Seq(0xc0, 12, 0, 5, 0, 1, 0, 0, 0, 0, 0, 14, 40) ++
      Seq(0xc0, 12, 0, 1, 0, 1, 0, 0, 0, 0, 0, 4, 1, 2, 3, 4): _*)
    compare(Seq(m5), "cname bad rdata name leaves cursor in rdata")

    // 6. 7th pointer jump kills the name, breaking only that section
    val loop = Seq(0xc0, 12) // points at itself (offset 12)
    val m6 = msg(header(qr = true, 0, 1, 1, 1, 0) ++
      loop ++ Seq(0, 1, 0, 1): _*)
    compare(Seq(m6), "pointer loop: name nulled, section broken")

    // 7. cross-message attribution: query datagram adds the host, the
    // response's A record (owner = pointer to its own question) attributes
    val q = msg(header(qr = false, 0, 1, 0, 0, 0) ++ Seq(
      3, 'w', 'w', 'w', 2, 'g', 'o', 0, 0, 1, 0, 1): _*)
    val r = msg(header(qr = true, 0, 1, 1, 0, 0) ++ Seq(
      3, 'w', 'w', 'w', 2, 'g', 'o', 0, 0, 1, 0, 1,
      0xc0, 12, 0, 1, 0, 1, 0, 0, 0, 60, 0, 4, 10, 0, 0, 7): _*)
    compare(Seq(q, r), "cross-message state")

    // 8. gates: len<17, opcode>5, qd=0, qd=11
    assert(AppProtocols.parseDnsMessage(
      msg(header(qr = false, 0, 1, 0, 0, 0) ++ Seq(0, 0, 1, 0): _*)
        .take(16)).isEmpty, "len<17")
    assert(AppProtocols.parseDnsMessage(
      msg(header(qr = false, 6, 1, 0, 0, 0) ++ Seq(0, 0, 1, 0, 1): _*))
      .isEmpty, "opcode>5")
    assert(AppProtocols.parseDnsMessage(
      msg(header(qr = false, 0, 0, 0, 0, 0) ++ Seq(0, 0, 1, 0, 1): _*))
      .isEmpty, "qd=0")
    assert(AppProtocols.parseDnsMessage(
      msg(header(qr = false, 0, 11, 0, 0, 0) ++ Seq(0, 0, 1, 0, 1): _*))
      .isEmpty, "qd=11")

    // 9. trailing lone pointer byte errors the outer walk; opcode still
    // recorded (the QD loop broke, the message still parses)
    val m9 = msg(header(qr = false, 0, 1, 0, 0, 0) ++ Seq(
      3, 'a', 'b', 'c', 0xc0): _*)
    compare(Seq(m9), "lone trailing pointer byte")
    assert(AppProtocols.parseDnsMessage(m9).get.opcode == Seq("QUERY"))
  }
}
