package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.DhcpParser

/** Differential fuzz of the DHCP walker against an independent second
  * transcription of the reference's parser (capture/parsers/dhcp.c) —
  * the walker was already written as a transcription; this pins it the
  * way the DNS/TLS/SSH/QUIC rewrites are pinned.
  *
  * Quirk surface both transcribe (and the generator aims at):
  *  - 256-byte floor; the xid records (lowercase %x, no padding) even
  *    for messages with no options; the chaddr MAC records for
  *    hardware type 1 regardless of hlen;
  *  - option walk from offset 240: a 0x00 pad byte is an option WITH a
  *    length byte (no case 0 in the C); option 255 ends without a
  *    length; a zero or overrunning length ends the walk;
  *  - option 53 values above 18 record nothing; value 0 records the
  *    empty string (names[0]);
  *  - option 61 takes a MAC only for l == 7 and type 1;
  *  - option 81 (FQDN) with a non-ascii encoding flag consumes l + 2
  *    bytes — the flags/rcode skip runs before the l-1 skip
  *    (dhcp.c:116-124), desyncing every later option by 2.
  */
class DhcpDifferentialFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- model

  private val mNames = Array("", "DISCOVER", "OFFER", "REQUEST", "DECLINE",
    "ACK", "NAK", "RELEASE", "INFORM", "FORCERENEW", "LEASEQUERY",
    "LEASEUNASSIGNED", "LEASEUNKNOWN", "LEASEACTIVE", "BULKLEASEQUERY",
    "LEASEQUERYDONE", "ACTIVELEASEQUERY", "LEASEQUERYSTATUS", "TLS")

  private final case class MMsg(id: String, mac: List[String],
      types: List[String], hosts: List[String])

  /** integer-cursor re-derivation of dhcp_udp_parser (dhcp.c:52-132) */
  private def mParse(b: Array[Byte]): Option[MMsg] = {
    if (b.length < 256) return None
    var mac = List.empty[String]
    var types = List.empty[String]
    var hosts = List.empty[String]
    def hw(o: Int) =
      (o until o + 6).map(i => f"${b(i) & 0xff}%02x").mkString(":")
    if ((b(1) & 0xff) == 1) mac ::= hw(28)
    val xid = ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    // BSB walk: skip 4, u32 id, skip 232, then options — cursor at 240
    var p = 240
    var run = true
    while (run && b.length - p >= 2) {
      val t = b(p) & 0xff
      p += 1
      if (t == 255) run = false
      else {
        val l = b(p) & 0xff
        p += 1
        if (l > b.length - p || l == 0) run = false
        else t match {
          case 12 =>
            hosts ::= new String(b, p, l, StandardCharsets.ISO_8859_1)
              .toLowerCase
            p += l
          case 53 =>
            if (l == 1) {
              val v = b(p) & 0xff
              if (v <= 18) types ::= mNames(v)
              p += 1
            } else p += l
          case 61 =>
            val v = b(p) & 0xff
            p += 1
            if (l == 7 && v == 1) { mac ::= hw(p); p += 6 }
            else p += l - 1
          case 81 =>
            if (l < 3) p += l
            else {
              val enc = b(p) & 0xff
              p += 3 // flags byte + 2-byte rcode skip
              if (enc != 0) p += l - 1 // the reference's extra-2 quirk
              else {
                hosts ::= new String(b, p, l - 3,
                  StandardCharsets.ISO_8859_1).toLowerCase
                p += l - 3
              }
            }
          case _ => p += l
        }
      }
    }
    Some(MMsg(f"$xid%x", mac, types, hosts))
  }

  // ------------------------------------------------------------- compare

  private def compare(msg: Array[Byte], label: String): Unit = {
    val m = mParse(msg)
    val p = DhcpParser.parseMessage(msg)
    (m, p) match {
      case (None, None) => ()
      case (Some(a), Some(b)) =>
        val mf = Seq("id" -> List(a.id), "mac" -> a.mac.reverse,
          "types" -> a.types.reverse, "hosts" -> a.hosts.reverse)
        val pf = Seq("id" -> List(b.id), "mac" -> b.mac.toList,
          "types" -> b.types.toList, "hosts" -> b.hosts.toList)
        val diffs = mf.zip(pf).filter { case ((_, x), (_, y)) => x != y }
        assert(diffs.isEmpty, s"\n[$label]\n" + diffs.map {
          case ((f, x), (_, y)) => s"  $f:\n    model=$x\n    ours =$y"
        }.mkString("\n") + "\noptions: " +
          msg.drop(240).take(60).map(x => f"$x%02x").mkString(" "))
      case _ => fail(s"[$label] model=${m.isDefined} ours=${p.isDefined}")
    }
  }

  // ------------------------------------------------------------ generator

  private var seed = 0xdc9cbL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
  private def chance(pct: Int): Boolean = nextInt(100) < pct

  private def genMessage(recipe: StringBuilder): Array[Byte] = {
    val e = new java.io.ByteArrayOutputStream
    e.write(pick(Seq(1, 2, 1, 1, 7))) // op
    e.write(pick(Seq(1, 1, 1, 6, 0))) // htype (1 records chaddr)
    e.write(6); e.write(0)
    for (_ <- 0 until 4) e.write(nextInt(256)) // xid
    for (_ <- 0 until 20) e.write(nextInt(256)) // secs..yiaddr etc
    for (_ <- 0 until 16) e.write(nextInt(256)) // chaddr (at 28)
    while (e.size < 236) e.write(0) // sname/file
    if (chance(90)) { e.write(0x63); e.write(0x82); e.write(0x53); e.write(0x63) }
    else for (_ <- 0 until 4) e.write(nextInt(256))
    val nOpts = nextInt(8)
    for (_ <- 0 until nOpts) nextInt(8) match {
      case 0 => // host name
        val h = s"host-${nextInt(99)}.Example"
        e.write(12); e.write(h.length)
        e.write(h.getBytes(StandardCharsets.ISO_8859_1), 0, h.length)
        recipe.append("h ")
      case 1 => // message type, sometimes bad length or value
        val l = pick(Seq(1, 1, 1, 0, 2))
        e.write(53); e.write(l)
        for (_ <- 0 until l) e.write(pick(Seq(1, 3, 5, 8, 0, 18, 19, 200)))
        recipe.append(s"t$l ")
      case 2 => // client id
        val l = pick(Seq(7, 7, 6, 8, 1))
        e.write(61); e.write(l)
        e.write(pick(Seq(1, 1, 0, 2)))
        for (_ <- 0 until math.max(0, l - 1)) e.write(nextInt(256))
        recipe.append(s"c$l ")
      case 3 => // FQDN with encodings
        val name = s"fq${nextInt(99)}.example"
        val l = name.length + 3
        e.write(81); e.write(if (chance(15)) nextInt(4) else l)
        e.write(pick(Seq(0, 0, 0, 1, 4))) // flags (0 = ascii)
        e.write(0); e.write(0) // rcodes
        e.write(name.getBytes(StandardCharsets.ISO_8859_1), 0, name.length)
        recipe.append("f ")
      case 4 => // pad bytes (the no-case-0 quirk eats the next byte)
        for (_ <- 0 until 1 + nextInt(3)) e.write(0)
        recipe.append("p ")
      case 5 => // end marker mid-options
        if (chance(30)) { e.write(255); recipe.append("E ") }
        else { e.write(pick(Seq(50, 51, 54, 255, 0))); e.write(4)
          for (_ <- 0 until 4) e.write(nextInt(256)) }
      case 6 => // lying length (overruns)
        e.write(pick(Seq(12, 53, 61, 81, 99)))
        e.write(200 + nextInt(56))
        for (_ <- 0 until nextInt(10)) e.write(nextInt(256))
        recipe.append("L ")
      case _ => // misc option
        val l = nextInt(12)
        e.write(nextInt(256)); e.write(l)
        for (_ <- 0 until l) e.write(nextInt(256))
    }
    if (chance(60)) e.write(255)
    var out = e.toByteArray
    if (chance(12) && out.length > 250)
      out = out.take(250 + nextInt(out.length - 250)) // may dip under 256
    if (chance(20) && out.length > 4) {
      recipe.append("mut ")
      for (_ <- 0 to nextInt(4))
        out(nextInt(out.length)) = nextInt(256).toByte
    }
    out
  }

  // --------------------------------------------------------------- tests

  test("generated messages: walker matches the dhcp.c model") {
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(3000)
    for (trial <- 0 until nTrials) {
      val recipe = new StringBuilder
      compare(genMessage(recipe), s"trial $trial: $recipe")
    }
  }

  test("pinned dhcp.c quirks") {
    def base(): java.io.ByteArrayOutputStream = {
      val e = new java.io.ByteArrayOutputStream
      e.write(1); e.write(1); e.write(6); e.write(0)
      e.write(Array[Byte](0x12, 0x34, 0x56, 0x78), 0, 4) // xid
      while (e.size < 240) e.write(0)
      e
    }
    // 1. option 81 non-ascii encoding desyncs later options by 2: the
    // following option 12 host is read 2 bytes early
    val e1 = base()
    e1.write(81); e1.write(8); e1.write(1) // encoding 1: not supported
    e1.write(Array[Byte](0, 0, 'a', 'b', 'c', 'd', 'e'), 0, 7)
    e1.write(12); e1.write(3)
    e1.write("xyz".getBytes, 0, 3)
    e1.write(255); while (e1.size < 256) e1.write(0)
    compare(e1.toByteArray, "fqdn desync")
    val got1 = DhcpParser.parseMessage(e1.toByteArray).get
    assert(!got1.hosts.contains("xyz"),
      s"option after a non-ascii FQDN must desync, got ${got1.hosts}")
    // 2. option 53 value 0 records the empty string; 19 records nothing
    val e2 = base()
    e2.write(53); e2.write(1); e2.write(0)
    e2.write(53); e2.write(1); e2.write(19)
    e2.write(255); while (e2.size < 256) e2.write(0)
    compare(e2.toByteArray, "type 0 and 19")
    assert(DhcpParser.parseMessage(e2.toByteArray).get.types == Seq(""))
    // 3. pad byte consumes the NEXT byte as its length
    val e3 = base()
    e3.write(0) // pad: next byte (12) becomes its length — and 12 bytes
    e3.write(12); e3.write(3)
    e3.write("abc".getBytes, 0, 3)
    e3.write(255); while (e3.size < 270) e3.write(7)
    compare(e3.toByteArray, "pad eats next")
    assert(DhcpParser.parseMessage(e3.toByteArray).get.hosts.isEmpty)
  }
}
