package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MiscParsers

/** Round-trip fuzz for the small line/binary protocol extractors (IRC,
  * PostgreSQL startup, MySQL handshake): generated wire messages,
  * expectations from the public formats.
  */
class MiscProtocolRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x31c9b0bL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct

  test("irc NICK/JOIN lines round-trip nicks and #channels") {
    for (trial <- 0 until 200) {
      val nicks = (0 until nextInt(3)).map(i => s"nick${trial}_$i")
      val chans = (0 until nextInt(3)).map(i => s"#chan${trial}_$i")
      val noChan = s"nochannel$trial" // JOIN without '#' is dropped
      val lines = scala.util.Random.javaRandomToRandom(
        new java.util.Random(trial * 17L + 3)).shuffle(
        nicks.map(n => s"NICK $n").toList ++
          chans.map(c => s"JOIN $c key${nextInt(9)}").toList ++
          (if (chance(40)) List(s"JOIN $noChan") else Nil) ++
          List("USER u 0 * :Real Name", "PRIVMSG #x :hello"))
      val src = (lines.mkString("\r\n") + "\r\n")
        .getBytes(StandardCharsets.ISO_8859_1)
      MiscParsers.parseIrc(src) match {
        case Some(info) =>
          assert(info.nick.sorted == nicks.distinct.sorted,
            s"trial $trial nicks")
          assert(info.channel.sorted == chans.distinct.sorted,
            s"trial $trial chans")
        case None =>
          assert(nicks.isEmpty && chans.isEmpty, s"trial $trial empty")
      }
    }
  }

  test("postgres startup messages round-trip user/database/application") {
    for (trial <- 0 until 200) {
      val user = s"pguser$trial"
      val db = if (chance(70)) s"db${nextInt(99)}" else ""
      val app = if (chance(50)) s"app ${nextInt(9)}" else ""
      val kv = Seq("user" -> user) ++
        (if (db.nonEmpty) Seq("database" -> db) else Nil) ++
        (if (app.nonEmpty) Seq("application_name" -> app) else Nil) ++
        Seq("client_encoding" -> "UTF8") // noise key
      val body = new java.io.ByteArrayOutputStream()
      kv.foreach { case (k, v) =>
        body.write(k.getBytes(StandardCharsets.UTF_8)); body.write(0)
        body.write(v.getBytes(StandardCharsets.UTF_8)); body.write(0)
      }
      body.write(0) // terminator
      val out = new java.io.ByteArrayOutputStream()
      def u32(v: Long): Unit = (0 until 4).foreach(k =>
        out.write(((v >> (24 - k * 8)) & 0xff).toInt))
      if (chance(40)) { u32(8); u32(80877103L) } // SSLRequest prefix
      u32(8L + body.size); u32(0x00030000L)
      out.write(body.toByteArray)
      val info = MiscParsers.parsePostgres(out.toByteArray)
        .getOrElse(fail(s"trial $trial: no PostgresInfo"))
      assert(info.user == user, s"trial $trial user")
      assert(info.db == db, s"trial $trial db")
      assert(info.app == app, s"trial $trial app")
    }
  }

  test("mysql greeting + login round-trip version and user (SSL gate)") {
    for (trial <- 0 until 200) {
      val version = s"8.${nextInt(9)}.${nextInt(40)}-srv"
      val dst = new java.io.ByteArrayOutputStream()
      val greetBody = new java.io.ByteArrayOutputStream()
      greetBody.write(0x0a)
      greetBody.write(version.getBytes(StandardCharsets.ISO_8859_1))
      greetBody.write(0)
      greetBody.write(Array.tabulate(20)(_.toByte)) // thread id + salt
      dst.write(greetBody.size & 0xff)
      dst.write((greetBody.size >> 8) & 0xff)
      dst.write((greetBody.size >> 16) & 0xff)
      dst.write(0) // seq 0
      dst.write(greetBody.toByteArray)
      val user = s"mu$trial"
      val ssl = chance(30)
      val src = new java.io.ByteArrayOutputStream()
      val login = new java.io.ByteArrayOutputStream()
      val caps = if (ssl) 0x0800 else 0x0200
      login.write(caps & 0xff); login.write((caps >> 8) & 0xff)
      login.write(0); login.write(0) // caps high
      (0 until 4).foreach(_ => login.write(0)) // max packet
      login.write(33) // charset
      login.write(new Array[Byte](23)) // filler
      if (!ssl) {
        login.write(user.getBytes(StandardCharsets.ISO_8859_1))
        login.write(0)
      }
      src.write(login.size & 0xff)
      src.write((login.size >> 8) & 0xff)
      src.write((login.size >> 16) & 0xff)
      src.write(1) // seq 1
      src.write(login.toByteArray)
      val info = MiscParsers.parseMysql(src.toByteArray, dst.toByteArray)
        .getOrElse(fail(s"trial $trial: no MysqlInfo"))
      assert(info.version == version, s"trial $trial version")
      assert(info.user == (if (ssl) "" else user), s"trial $trial user")
    }
  }
}
