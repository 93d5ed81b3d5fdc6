package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{MiscParsers, RadiusParser}

/** Round-trip fuzz for the RADIUS and BGP extractors: generated wire
  * messages with expectations from the public formats (RFC 2865 AVP
  * layout; RFC 4271 marker-framed messages) — noise attributes,
  * malformed-length truncation, multi-message streams.
  */
class RadiusBgpRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x4ad1b9bL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  test("radius AVPs round-trip user, framed-ip and calling-station mac") {
    for (trial <- 0 until 200) {
      val n = 1 + nextInt(3)
      val eUser = Seq.newBuilder[String]
      val eIp = Seq.newBuilder[String]
      val eMac = Seq.newBuilder[String]
      val payloads = (0 until n).map { _ =>
        val avps = new java.io.ByteArrayOutputStream()
        def avp(t: Int, v: Array[Byte]): Unit = {
          avps.write(t); avps.write(v.length + 2); avps.write(v)
        }
        if (chance(80)) {
          val u = s"user${nextInt(99)}@realm${nextInt(9)}"
          avp(1, u.getBytes("ISO-8859-1")); eUser += u
        }
        if (chance(60)) {
          val o = Array(10, nextInt(256), nextInt(256), 1 + nextInt(254))
          avp(8, o.map(_.toByte)); eIp += o.mkString(".")
        }
        if (chance(60)) {
          // Calling-Station-Id as 12 hex chars (the shape the parser
          // folds to colon-separated mac)
          val hx = (0 until 6).map(_ => f"${nextInt(256)}%02X").mkString
          avp(31, hx.getBytes("ISO-8859-1"))
          eMac += hx.toLowerCase.grouped(2).mkString(":")
        }
        // noise attributes the parser must skip
        if (chance(70)) avp(6, Array[Byte](0, 0, 0, 2)) // Service-Type
        if (chance(50)) avp(26, Array.tabulate(10)(_.toByte)) // VSA
        // a 13-char Calling-Station-Id must NOT parse as a mac
        if (chance(20)) avp(31, "0123456789abc".getBytes("ISO-8859-1"))
        val body = avps.toByteArray
        val out = new java.io.ByteArrayOutputStream()
        out.write(1 + nextInt(5)) // code 1..5
        out.write(nextInt(256))   // identifier
        val len = 20 + body.length
        out.write((len >> 8) & 0xff); out.write(len & 0xff)
        out.write(new Array[Byte](16)) // authenticator
        out.write(body)
        out.toByteArray
      }
      val info = RadiusParser.parse(payloads)
        .getOrElse(fail(s"trial $trial: no RadiusInfo"))
      assert(info.user == eUser.result().distinct, s"trial $trial user")
      assert(info.framedIp == eIp.result().distinct, s"trial $trial ip")
      assert(info.mac == eMac.result().distinct, s"trial $trial mac")
    }
  }

  test("bgp marker-framed messages round-trip their type names") {
    val names = Map(1 -> "OPEN", 2 -> "UPDATE", 3 -> "NOTIFICATION",
      4 -> "KEEPALIVE")
    for (trial <- 0 until 200) {
      val types = (0 until 1 + nextInt(6)).map(_ => 1 + nextInt(5)) // incl. 5
      val st = new java.io.ByteArrayOutputStream()
      types.foreach { t =>
        (0 until 16).foreach(_ => st.write(0xff))
        val extra = nextInt(30)
        val len = 19 + extra
        st.write((len >> 8) & 0xff); st.write(len & 0xff)
        st.write(t)
        st.write(Array.tabulate(extra)(i => (i * 3).toByte))
      }
      val got = MiscParsers.parseBgpTypes(Seq(st.toByteArray))
      val expected = types.flatMap(names.get).distinct
      assert(got == expected, s"trial $trial: $types")
      // a broken marker stops the walk without crashing
      val broken = st.toByteArray
      if (broken.length > 20 && chance(50)) {
        broken(0) = 0x00
        assert(MiscParsers.parseBgpTypes(Seq(broken)).isEmpty,
          s"trial $trial: corrupt marker must parse nothing")
      }
    }
  }
}
