package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MiscParsers

/** Round-trip fuzz for the login/user extractors: FTP/POP3 `USER`
  * (reference misc.c user_classify with its IRC guards), RDP mstshash
  * cookie (misc.c rdp_classify), Oracle TNS connect strings
  * (parsers/oracle.c), and TDS 5 login (parsers/tds.c). Wire bytes
  * from independent builders typed from the reference layouts;
  * expectations from the generation model. Hostile corners: length
  * lies, IRC-guard injections, missing terminators, truncation.
  */
class MiscLoginRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x10617f422L
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private val userChars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._-"
  private def randUser(min: Int, max: Int): String =
    (0 until (min + nextInt(max - min + 1)))
      .map(_ => userChars(nextInt(userChars.length))).mkString

  // ------------------------------------------------------- USER command
  test("USER command: terminators, case folding, IRC guards") {
    (0 until 60).foreach { trial =>
      val user = randUser(1, 16)
      val term = oneOf(Seq(" ", "\r", "\n", "\t", ""))
      // with no terminator the scan runs to end-of-stream: keep it bare
      val tail = if (term.isEmpty) ""
        else oneOf(Seq("", "PASS secret\r\n", "anonymous login\r\n"))
      val ircGuard = term.nonEmpty && chance(25)
      val guard = if (ircGuard) oneOf(Seq("\nNICK flooder ", "x +iw y")) else ""
      val s = ("USER " + user + term + guard + tail)
        .getBytes(StandardCharsets.ISO_8859_1)
      val got = MiscParsers.parseUserCommand(s)
      withClue(s"trial $trial [$user|$term|$ircGuard]: ") {
        if (ircGuard) assert(got.isEmpty)
        else assert(got.contains(user.toLowerCase))
      }
    }
    // guard strings beyond the 512-byte window do NOT suppress the user
    val far = "USER Alice\r\n" + "x" * 520 + "\nNICK z "
    assert(MiscParsers.parseUserCommand(
      far.getBytes(StandardCharsets.ISO_8859_1)).contains("alice"))
    // immediate whitespace after USER → no user
    assert(MiscParsers.parseUserCommand(
      "USER  bob\r\n".getBytes(StandardCharsets.ISO_8859_1)).isEmpty)
    assert(MiscParsers.parseUserCommand(
      "USER".getBytes(StandardCharsets.ISO_8859_1)).isEmpty)
    assert(MiscParsers.parseUserCommand(
      "USERX y\r\n".getBytes(StandardCharsets.ISO_8859_1)).isEmpty)
    assert(MiscParsers.parseUserCommand(Array.emptyByteArray).isEmpty)
  }

  // ---------------------------------------------------------------- RDP
  private def rdpPacket(user: String, withCrlf: Boolean = true,
      breakByte: Int = -1): Array[Byte] = {
    val cookie = "Cookie: mstshash=" + user + (if (withCrlf) "\r\n" else "")
    val bodyLen = 11 + cookie.length
    val tot = math.min(255, bodyLen)
    val b = new Array[Byte](bodyLen + nextInt(8))
    b(0) = 3; b(1) = 0; b(2) = 0; b(3) = tot.toByte
    b(4) = (tot - 5).toByte; b(5) = 0xe0.toByte
    (6 until 11).foreach(i => b(i) = nextInt(256).toByte)
    val cb = cookie.getBytes(StandardCharsets.ISO_8859_1)
    System.arraycopy(cb, 0, b, 11, math.min(cb.length, b.length - 11))
    if (breakByte >= 0 && breakByte < b.length) b(breakByte) = 0x55
    b
  }

  test("RDP mstshash cookie: user extraction and negotiation guards") {
    (0 until 50).foreach { trial =>
      val user = randUser(0, 14)
      val p = rdpPacket(user)
      withClue(s"trial $trial [$user]: ") {
        assert(MiscParsers.isRdp(p))
        if (p.length > 30)
          assert(MiscParsers.parseRdpUser(p).contains(user.toLowerCase))
      }
    }
    // no CRLF terminator → no user
    assert(MiscParsers.parseRdpUser(rdpPacket("carol", withCrlf = false)).isEmpty)
    // broken TPKT signature / X.224 code → not RDP
    assert(!MiscParsers.isRdp(rdpPacket("x", breakByte = 0)))
    assert(!MiscParsers.isRdp(rdpPacket("x", breakByte = 5)))
    // length-consistency byte broken → not RDP
    val bad = rdpPacket("dave"); bad(4) = (bad(4) + 1).toByte
    assert(!MiscParsers.isRdp(bad))
    // cookie prefix corrupted → user absent but still RDP
    val noCookie = rdpPacket("erin", breakByte = 12)
    assert(MiscParsers.isRdp(noCookie) && MiscParsers.parseRdpUser(noCookie).isEmpty)
  }

  // --------------------------------------------------------- Oracle TNS
  private final case class OracleModel(packet: Array[Byte],
      user: String, host: String, service: String)

  private def oraclePacket(): OracleModel = {
    val user = if (chance(80)) randUser(1, 12) else null
    val host = if (chance(80)) randUser(1, 16) else null
    val service = if (chance(80)) randUser(1, 12) else null
    val items = Seq.newBuilder[String]
    if (service != null) items += s"(SERVICE_NAME=$service)"
    if (user != null) items += s"(USER=$user)"
    val itemSeq = items.result()
    val inner = if (chance(50)) itemSeq.reverse else itemSeq
    val addr = if (host != null) s"(ADDRESS=(PROTOCOL=tcp)(HOST=$host)(PORT=1521))" else ""
    val data = s"(DESCRIPTION=(CONNECT_DATA=${inner.mkString}(CID=(PROGRAM=sqlplus)))$addr)"
      .getBytes(StandardCharsets.ISO_8859_1)
    val start = 28 + nextInt(30)
    val total = start + data.length
    val b = new Array[Byte](total)
    (8 until start).foreach(i => b(i) = nextInt(256).toByte)
    b(0) = ((total >> 8) & 0xff).toByte; b(1) = (total & 0xff).toByte
    b(2) = 0; b(3) = 0; b(4) = 1; b(5) = 0; b(6) = 0; b(7) = 0
    b(25) = data.length.toByte; b(27) = start.toByte
    System.arraycopy(data, 0, b, start, data.length)
    OracleModel(b,
      if (user == null) null else user.toLowerCase,
      if (host == null) null else host.toLowerCase,
      if (service == null) null else service.toLowerCase)
  }

  test("Oracle TNS connect: item extraction, framing checks") {
    var trials = 0
    while (trials < 50) {
      val m = oraclePacket()
      if (m.packet.length <= 255 + 28) { // keep dataLen in its byte field
        withClue(s"trial $trials: ") {
          assert(MiscParsers.isOracle(m.packet))
          val got = MiscParsers.parseOracle(m.packet).get
          assert(got.user == m.user)
          assert(got.host == m.host)
          assert(got.service == m.service)
        }
        trials += 1
      }
    }
    // total-length lie → rejected
    val lie = oraclePacket().packet.clone()
    lie(1) = (lie(1) + 1).toByte
    assert(MiscParsers.parseOracle(lie).isEmpty)
    // dataOffset+dataLen mismatch → rejected
    val mis = oraclePacket().packet.clone()
    mis(25) = (mis(25) + 1).toByte
    assert(MiscParsers.parseOracle(mis).isEmpty)
    // empty item value → null field
    val emptyVal = {
      val data = "(DESCRIPTION=(USER=)(HOST=dbh))".getBytes(StandardCharsets.ISO_8859_1)
      val start = 30; val total = start + data.length
      val b = new Array[Byte](total)
      b(0) = ((total >> 8) & 0xff).toByte; b(1) = (total & 0xff).toByte
      b(4) = 1; b(25) = data.length.toByte; b(27) = start.toByte
      System.arraycopy(data, 0, b, start, data.length)
      b
    }
    val e = MiscParsers.parseOracle(emptyVal).get
    assert(e.user == null && e.host == "dbh")
    // truncation → rejected (length no longer matches)
    val trunc = oraclePacket().packet
    assert(MiscParsers.parseOracle(trunc.take(trunc.length - 3)).isEmpty)
  }

  // ---------------------------------------------------------------- TDS
  private def tdsPacket(user: String, declaredLen: Int,
      size: Int = 600): Array[Byte] = {
    val b = new Array[Byte](size)
    Array[Byte](2, 0, 2, 0, 0, 0, 1, 0).copyToArray(b)
    val ub = user.getBytes(StandardCharsets.ISO_8859_1)
    System.arraycopy(ub, 0, b, 39, math.min(ub.length, 30))
    b(69) = declaredLen.toByte
    b
  }

  test("TDS 5 login: user at fixed offset, NUL padding, size gates") {
    (0 until 40).foreach { trial =>
      val user = randUser(1, 20)
      // declared length either exact or the full 30-byte NUL-padded field
      val decl = if (chance(50)) user.length else 30
      val p = tdsPacket(user, decl, 599 + nextInt(40))
      withClue(s"trial $trial [$user/$decl]: ") {
        assert(MiscParsers.isTds(p))
        assert(MiscParsers.parseTdsUser(p).contains(user.toLowerCase))
      }
    }
    // zero declared length → empty user
    assert(MiscParsers.parseTdsUser(tdsPacket("zed", 0)).contains(""))
    // too short for the login record → None
    assert(MiscParsers.parseTdsUser(tdsPacket("ann", 3, size = 598)).isEmpty)
    // below the classify floor → not TDS at all
    assert(!MiscParsers.isTds(tdsPacket("bob", 3, size = 511)))
    // header byte off → not TDS
    val bad = tdsPacket("cara", 4); bad(2) = 9
    assert(!MiscParsers.isTds(bad))
  }
}
