package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{QuicParser, SmbParser}

/** Round-trip fuzz for the Google-QUIC CHLO and SMB1/SMB2 extractors:
  * wire bytes from independent encoders (the public GQUIC wire format —
  * public flags, CID, Q0xx version, stream frame, CHLO tag table — and
  * the [MS-CIFS]/[MS-SMB2]/[MS-NLMP] layouts), expectations computed
  * from the generation model, never from the parsers. Hostile corners:
  * truncation, entry-table offset lies, NTLMSSP triplets pointing
  * outside the blob, NetBIOS length lies.
  */
class QuicSmbRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x9c1c5eedbeefL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private final class Enc {
    val buf = new java.io.ByteArrayOutputStream()
    def size: Int = buf.size()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u16le(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u16be(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32le(v: Long): Unit = {
      u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt)
    }
    def ascii(s: String): Unit = buf.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def bytes(b: Array[Byte]): Unit = buf.write(b)
    def zeros(n: Int): Unit = buf.write(new Array[Byte](n))
    def junk(n: Int): Unit = { var i = 0; while (i < n) { u8(nextInt(256)); i += 1 } }
    def out: Array[Byte] = buf.toByteArray
  }

  private def ucs2(s: String): Array[Byte] =
    s.flatMap(c => Seq((c & 0xff).toByte, ((c >> 8) & 0xff).toByte)).toArray

  // =================================================================== QUIC
  private val hostsPool = Seq("www.example.com", "video.example.org",
    "a.b.example.net", "x.io")
  private val uaPool = Seq("Chrome/51.0.2704.103", "quic-client dev",
    "okhttp")

  /** CHLO tag block: "CHLO", u16 LE entry count, 2 pad bytes, entries of
    * (4-byte subtag, u32 LE cumulative end offset), then the value blob.
    * Returns (bytes, hosts, uas, vers) in entry order.
    */
  private def chloBlock(): (Array[Byte], Seq[String], Seq[String], Seq[String]) = {
    val entries = Seq.newBuilder[(String, String)]
    if (chance(90)) entries += (("SNI\u0000", oneOf(hostsPool)))
    if (chance(60)) entries += (("UAID", oneOf(uaPool)))
    if (chance(70)) entries += (("VER\u0000", "Q0" + (24 + nextInt(20))))
    if (chance(50)) entries += (("PAD\u0000", "x" * (1 + nextInt(30))))
    if (chance(40)) entries += (("AEAD", "AESG"))
    // the reference's walk gate needs remaining >= tagLen*8 + 8 AFTER
    // the header (quic.c:54): keep at least 8 value bytes so entries
    // stay reference-parseable
    if (entries.result().map(_._2.length).sum < 8 &&
        entries.result().nonEmpty)
      entries += (("PAD\u0000", "padpadpad"))
    val es = entries.result()
    if (es.isEmpty) return (Array[Byte]('C', 'H', 'L', 'O', 0, 0, 0, 0),
      Nil, Nil, Nil)
    val e = new Enc
    e.ascii("CHLO"); e.u16le(es.length); e.u8(nextInt(256)); e.u8(nextInt(256))
    var cum = 0
    es.foreach { case (tag, v) =>
      e.ascii(tag); cum += v.length; e.u32le(cum.toLong)
    }
    es.foreach { case (_, v) => e.ascii(v) }
    (e.out,
      es.filter(_._1 == "SNI\u0000").map(_._2),
      es.filter(_._1 == "UAID").map(_._2),
      es.filter(_._1 == "VER\u0000").map(_._2))
  }

  /** One Q024-Q045 client packet: public flags (version + 8-byte CID +
    * packet-number bits), "Q0xx", pn bytes, 12-byte message auth, Q<34
    * private flags, then one stream frame carrying the CHLO.
    */
  private def packet2445(version: Int,
      chlo: Array[Byte], withDataLen: Boolean): Array[Byte] = {
    val pnBits = oneOf(Seq(0x00, 0x10, 0x20, 0x30))
    val e = new Enc
    e.u8(0x01 | 0x08 | pnBits)
    e.junk(8) // CID
    e.ascii(f"Q$version%03d")
    e.zeros(if (pnBits == 0) 1 else (pnBits >> 4) * 2) // packet number
    e.junk(12) // message auth hash
    if (version < 34) e.u8(0)
    val offBits = oneOf(Seq(0, 1, 3, 7)) // 0 or 2/4/8 offset bytes
    val slenBits = nextInt(4)            // 1..4 stream-id bytes
    e.u8(0x80 | (if (withDataLen) 0x20 else 0) | (offBits << 2) | slenBits)
    e.zeros(slenBits + 1)
    e.zeros(if (offBits != 0) offBits + 1 else 0)
    if (withDataLen) {
      var dl = chlo.length
      if (dl == 4) dl += 1 // sidestep the reference's ==4 quirk here
      e.u16le(dl)
    }
    e.bytes(chlo)
    // tail padding to clear the >100-byte gate; with no explicit data
    // length the CHLO entry table bounds all reads, so junk is inert
    e.junk(math.max(0, 110 - e.size) + nextInt(40))
    e.out
  }

  /** One Q046-Q048 long-header packet: the parser brute-searches the
    * CHLO tag, so the block can sit at any offset past 5.
    */
  private def packet4648(version: Int, chlo: Array[Byte]): Array[Byte] = {
    val e = new Enc
    e.u8(0xc0 | nextInt(0x40))
    e.ascii(f"Q$version%03d")
    e.zeros(5 + nextInt(30)) // zeros, not junk: no accidental 'CHLO'
    e.bytes(chlo)
    e.junk(math.max(0, 110 - e.size) + 20)
    e.out
  }

  test("QUIC CHLO round-trip: 150 sessions across Q024-Q048 + FBZero") {
    for (_ <- 0 until 150) {
      val (chlo, hosts, uas, vers) = chloBlock()
      nextInt(3) match {
        case 0 =>
          val version = 24 + nextInt(22) // Q024..Q045
          val pkt = packet2445(version, chlo, withDataLen = chance(50))
          val info = QuicParser.parse(Seq(pkt), Nil)
          assert(info.isDefined, s"Q$version must tag")
          assert(info.get.host == hosts.distinct, s"Q$version host")
          assert(info.get.useragent == uas.distinct)
          assert(info.get.version == vers.distinct)
        case 1 =>
          val version = 46 + nextInt(3) // Q046..Q048 brute search
          val pkt = packet4648(version, chlo)
          val info = QuicParser.parse(Seq(pkt), Nil)
          assert(info.isDefined, s"Q$version must tag")
          assert(info.get.host == hosts.distinct, s"Q$version host")
        case _ => // FBZero over TCP: 0x31 'QTV', LE length at 5, CHLO at 9
          val e = new Enc
          e.u8(0x31); e.ascii("QTV"); e.u8(nextInt(256))
          e.u8(chlo.length & 0xff); e.u8(chlo.length >> 8)
          e.u8(nextInt(256)); e.u8(nextInt(256))
          e.bytes(chlo); e.junk(nextInt(20))
          val info = QuicParser.parseFbzero(e.out)
          if (chlo.length >= 8) {
            assert(info.isDefined)
            assert(info.get.host == hosts.distinct)
            assert(info.get.version == vers.distinct)
          }
      }
    }
  }

  test("QUIC gates: Q05x both-directions rule, PRST, version floor") {
    def q05(): Array[Byte] = {
      // classify gate (quic.c:263): len > 100 AND first byte 0xc0-masked
      val e = new Enc; e.u8(0xc0 | nextInt(0x40)); e.ascii("Q05" + nextInt(2))
      e.junk(110); e.out
    }
    // one-sided Q05x never classifies; both-sided does
    assert(QuicParser.parse(Seq(q05()), Nil).isEmpty)
    assert(QuicParser.parse(Nil, Seq(q05())).isEmpty)
    assert(QuicParser.parse(Seq(q05()), Seq(q05())).exists(_.tagged))
    // PRST at offset 9 tags without fields
    val prst = new Enc; prst.u8(0); prst.junk(8); prst.ascii("PRST"); prst.junk(8)
    val pi = QuicParser.parse(Seq(prst.out), Nil)
    assert(pi.exists(p => p.tagged && p.host.isEmpty))
    // a Q020 packet is below the version floor: no tag
    val (chlo, _, _, _) = chloBlock()
    assert(QuicParser.parse(Seq(packet2445(20, chlo, withDataLen = false)),
      Nil).isEmpty)
  }

  test("QUIC hostile: entry-table lies and truncation never throw") {
    for (_ <- 0 until 150) {
      val (chlo0, _, _, _) = chloBlock()
      val chlo = chlo0.clone()
      nextInt(3) match {
        case 0 => // corrupt a cumulative end offset
          if (chlo.length > 12) {
            val i = 8 + nextInt(chlo.length - 8)
            chlo(i) = (chlo(i) ^ 0xff).toByte
          }
        case 1 => // lie about the entry count
          if (chlo.length > 5) chlo(4) = (chlo(4) + 7).toByte
        case _ => ()
      }
      val pkt = packet2445(24 + nextInt(22), chlo, withDataLen = chance(50))
      val cut = if (chance(40)) 101 + nextInt(pkt.length - 101) else pkt.length
      QuicParser.parse(Seq(pkt.take(cut)), Nil) // must not throw
    }
  }

  // ==================================================================== SMB
  private val userPool = Seq("alice", "administrator", "svc_backup", "u1")
  private val domPool = Seq("CORP", "WORKGROUP", "EXAMPLE")
  private val hostPool = Seq("WS01", "LAPTOP-9", "DC2")
  private val osPool = Seq("Windows 10 Pro", "Unix", "Windows Server 2019")
  private val verPool = Seq("10.0", "Samba 4.15.13", "6.1")
  private val sharePool = Seq("\\\\SRV\\public", "\\\\DC2\\SYSVOL", "\\\\X\\c$")
  private val filePool = Seq("docs\\report.docx", "a.txt", "bin\\tool.exe")

  private final class SmbModel {
    val domain = Seq.newBuilder[String]; val user = Seq.newBuilder[String]
    val host = Seq.newBuilder[String]; val os = Seq.newBuilder[String]
    val ver = Seq.newBuilder[String]; val share = Seq.newBuilder[String]
    val fn = Seq.newBuilder[String]
    var badBlob = false
  }

  /** DER-ish helper for the SPNEGO wrap (tags fixed, short lengths ok
    * for our blob sizes; long-form when needed).
    */
  private def wrap(tag: Int, body: Array[Byte]): Array[Byte] = {
    val l = body.length
    val hdr =
      if (l > 255) Array(tag.toByte, 0x82.toByte, (l >> 8).toByte, l.toByte)
      else if (l > 127) Array(tag.toByte, 0x81.toByte, l.toByte)
      else Array(tag.toByte, l.toByte)
    hdr ++ body
  }

  /** NTLMSSP AUTHENTICATE blob ([MS-NLMP] 2.2.1.3) inside the SPNEGO
    * [1]{SEQ{[2]{OCTET STRING}}} wrap; `bad` points the user triplet
    * outside the blob (the smb:bad-security-blob tag).
    */
  private def ntlmsspBlob(m: SmbModel, bad: Boolean): Array[Byte] = {
    val dom = oneOf(domPool); val usr = oneOf(userPool); val hst = oneOf(hostPool)
    val lm = new Array[Byte](24); val nt = new Array[Byte](24)
    val fields = Seq(lm, nt, ucs2(dom), ucs2(usr), ucs2(hst),
      new Array[Byte](16))
    val base = 12 + 6 * 8
    val offs = fields.scanLeft(base)(_ + _.length).init
    val e = new Enc
    e.ascii("NTLMSSP"); e.u8(0)
    e.u32le(3L)
    fields.zip(offs).zipWithIndex.foreach { case ((f, o), i) =>
      e.u16le(f.length); e.u16le(f.length)
      e.u32le(if (bad && i == 3) (base + 4096).toLong else o.toLong)
    }
    fields.foreach(e.bytes)
    if (bad) m.badBlob = true
    else { m.domain += dom; m.user += usr; m.host += hst }
    wrap(0xa1, wrap(0x30, wrap(0xa2, wrap(0x04, e.out))))
  }

  /** One SMB1 PDU body by command; returns (cmd, body bytes). The model
    * accumulates expected fields under the chosen unicode flag.
    */
  private def smb1Body(m: SmbModel, unicode: Boolean): (Int, Array[Byte]) = {
    def put(e: Enc, s: String): Unit =
      if (unicode) { e.bytes(ucs2(s)); e.u16le(0) }
      else { e.ascii(s); e.u8(0) }
    nextInt(4) match {
      case 0 => // session setup andx wc=13: pw bytes then 4 strings
        val e = new Enc
        val ansipw = nextInt(25); val upw = nextInt(25)
        e.u8(13); e.zeros(14)
        e.u16le(ansipw); e.u16le(upw)
        e.zeros(29 - e.size)
        e.junk(ansipw + upw)
        if ((29 + ansipw + upw) % 2 != 0) e.u8(0)
        val usr = oneOf(userPool); val dom = oneOf(domPool)
        val os = oneOf(osPool); val ver = oneOf(verPool)
        put(e, usr); put(e, dom); put(e, os); put(e, ver)
        m.user += usr; m.domain += dom; m.os += os; m.ver += ver
        (0x73, e.out)
      case 1 => // session setup andx wc=12: NTLMSSP blob + os/ver/domain
        val e = new Enc
        val blob = ntlmsspBlob(m, bad = chance(15))
        e.u8(12); e.zeros(14)
        e.u16le(blob.length)
        e.zeros(27 - e.size)
        e.bytes(blob)
        if ((27 + blob.length) % 2 != 0) e.u8(0)
        val os = oneOf(osPool); val ver = oneOf(verPool); val dom = oneOf(domPool)
        put(e, os); put(e, ver); put(e, dom)
        m.os += os; m.ver += ver; m.domain += dom
        (0x73, e.out)
      case 2 => // tree connect andx: BE password length, pad 2/1, share
        val e = new Enc
        val passlen = nextInt(20)
        e.u8(4); e.zeros(5)
        e.u16be(passlen)
        e.zeros(10 - e.size)
        e.junk(passlen)
        e.zeros(if ((10 + passlen) % 2 == 0) 2 else 1)
        val sh = oneOf(sharePool)
        put(e, sh)
        m.share += sh
        (0x75, e.out)
      case _ => // nt-create / open / delete: filename after the word block
        val cmd = oneOf(Seq(0xa2, 0x2d, 0x06))
        val e = new Enc
        val wc = 1 + nextInt(24)
        e.u8(wc); e.junk(wc * 2 + 3)
        val fn = oneOf(filePool)
        put(e, fn)
        m.fn += fn
        (cmd, e.out)
    }
  }

  private def smb1Pdu(m: SmbModel): Array[Byte] = {
    val unicode = chance(60)
    val (cmd, body) = smb1Body(m, unicode)
    val e = new Enc
    e.u8(0xff); e.ascii("SMB"); e.u8(cmd)
    e.zeros(4)  // status
    e.u8(0)     // flags: request
    e.u16le(if (unicode) 0x8000 else 0)
    e.zeros(32 - e.size)
    e.bytes(body)
    e.out
  }

  private def smb2Pdu(m: SmbModel): Array[Byte] = {
    val e = new Enc
    e.u8(0xfe); e.ascii("SMB")
    e.u16le(64); e.zeros(6) // struct size, credit charge, status
    val cmd = if (chance(50)) 3 else 5
    e.u16le(cmd)
    e.u16le(0)      // credits
    e.u32le(0L)     // flags: request
    e.zeros(64 - e.size)
    if (cmd == 3) { // tree connect: path offset/len relative to header
      val sh = oneOf(sharePool)
      val path = ucs2(sh)
      e.u16le(9); e.u16le(0)
      e.u16le(64 + 8); e.u16le(path.length)
      e.bytes(path)
      m.share += sh
    } else { // create: name offset/len at body+44/46
      val fn = oneOf(filePool)
      val name = ucs2(fn)
      e.zeros(44)
      val bodyFixed = 48
      e.u16le(64 + bodyFixed); e.u16le(name.length)
      e.bytes(name)
      m.fn += fn
    }
    e.out
  }

  private def netbios(pdus: Seq[Array[Byte]]): Array[Byte] = {
    val e = new Enc
    pdus.foreach { p =>
      e.u8(0); e.u8(p.length >> 16); e.u8(p.length >> 8); e.u8(p.length)
      e.bytes(p)
    }
    e.out
  }

  test("SMB round-trip: 150 sessions vs the [MS-CIFS]/[MS-SMB2] model") {
    for (_ <- 0 until 150) {
      val m = new SmbModel
      val srcPdus = (0 until 1 + nextInt(4)).map(_ =>
        if (chance(60)) smb1Pdu(m) else smb2Pdu(m))
      val dstPdus = (0 until nextInt(3)).map(_ =>
        if (chance(60)) smb1Pdu(m) else smb2Pdu(m))
      val info = SmbParser.parse(netbios(srcPdus), netbios(dstPdus))
      assert(info.isDefined)
      val i = info.get
      assert(i.user == m.user.result().distinct, s"user ${i.user}")
      assert(i.domain == m.domain.result().distinct, s"domain ${i.domain}")
      assert(i.host == m.host.result().distinct, s"host ${i.host}")
      assert(i.os == m.os.result().distinct, s"os ${i.os}")
      assert(i.version == m.ver.result().distinct, s"ver ${i.version}")
      assert(i.share == m.share.result().distinct, s"share ${i.share}")
      assert(i.filename == m.fn.result().distinct, s"fn ${i.filename}")
      assert(i.badSecurityBlob == m.badBlob)
    }
  }

  test("SMB gates: replies skipped, NetBIOS length lies clamp") {
    // a reply PDU (flags bit 7 / SMB2 flags bit 0) contributes nothing
    val m = new SmbModel
    val req = smb1Pdu(m)
    val reply = req.clone(); reply(9) = 0x80.toByte
    assert(SmbParser.parse(netbios(Seq(reply)), Array.emptyByteArray).isEmpty)
    val m2 = new SmbModel
    val req2 = smb2Pdu(m2)
    val reply2 = req2.clone(); reply2(16) = 1
    assert(SmbParser.parse(netbios(Seq(reply2)), Array.emptyByteArray).isEmpty)
    // a NetBIOS length past the stream clamps instead of crashing
    val lied = netbios(Seq(req))
    lied(1) = 0x0f; lied(2) = 0xff.toByte
    SmbParser.parse(lied, Array.emptyByteArray)
    // zero/negative remaining length ends the walk
    val z = new Enc; z.u8(0); z.u8(0); z.u8(0); z.u8(0); z.junk(40)
    assert(SmbParser.parse(z.out, Array.emptyByteArray).isEmpty)
  }

  test("SMB hostile: truncation and flips never throw") {
    for (_ <- 0 until 150) {
      val m = new SmbModel
      val stream = netbios((0 until 1 + nextInt(3)).map(_ =>
        if (chance(60)) smb1Pdu(m) else smb2Pdu(m)))
      nextInt(3) match {
        case 0 => SmbParser.parse(stream.take(1 + nextInt(stream.length)),
          Array.emptyByteArray)
        case 1 =>
          val b = stream.clone()
          val i = nextInt(b.length)
          b(i) = (b(i) ^ (1 << nextInt(8))).toByte
          SmbParser.parse(b, Array.emptyByteArray)
        case _ =>
          SmbParser.parse(stream, stream.take(nextInt(stream.length)))
      }
    }
  }
}
