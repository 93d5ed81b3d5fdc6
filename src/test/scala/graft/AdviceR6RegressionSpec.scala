package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{HttpParser, Krb5Parser, PcapStore}
import graft.query.History

/** Regression pins for the round-5 advice findings. */
class AdviceR6RegressionSpec extends AnyFunSuite with SparkSpecBase {

  test("krb5 tcpMessages: 32-bit record length near 2^31 cannot overflow the bounds guard") {
    // length 0x7FFFFFFC at a record boundary: p + 4 + len overflows Int,
    // the negative sum passed the old guard and copyOfRange threw
    val stream = Array[Byte](0x7f.toByte, 0xff.toByte, 0xff.toByte,
      0xfc.toByte, 1, 2, 3)
    assert(Krb5Parser.tcpMessages(stream) === Nil)
    // and a valid short record after fixing still parses
    val ok = Array[Byte](0, 0, 0, 2, 42, 43)
    assert(Krb5Parser.tcpMessages(ok).map(_.toSeq) === Seq(Seq[Byte](42, 43)))
  }

  test("http: interim 100 Continue does not shift response-to-request alignment") {
    val client = ("POST /u HTTP/1.1\r\nHost: h\r\nExpect: 100-continue\r\n" +
      "Content-Length: 5\r\n\r\nhello" +
      "HEAD /h HTTP/1.1\r\nHost: h\r\n\r\n").getBytes("ISO-8859-1")
    val server = ("HTTP/1.1 100 Continue\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello" +
      "HTTP/1.1 200 OK\r\nContent-Length: 100\r\nX-Mark: after\r\n\r\n")
      .getBytes("ISO-8859-1")
    val info = HttpParser.parse(client, server).get
    // with the off-by-one, the first 200 aligned to HEAD, its body leaked
    // into the stream walk and the real HEAD response (X-Mark) was lost
    assert(info.responseHeaderField.contains("x-mark"))
    assert(info.statuscode.sorted === Seq(100, 200))
  }

  test("history: same-second same-api records get distinct ids; delete removes one row") {
    val dir = Files.createTempDirectory("graft-hist-collide").toString
    val e = History.Entry(id = "", uiPage = "sessions", userId = "u1",
      method = "GET", api = "/api/sessions", expression = "a == 1",
      timestamp = 1700000000L, queryTime = 7L)
    val a = History.record(spark, dir, e)
    val b = History.record(spark, dir, e.copy(expression = "b == 2"))
    assert(a.id !== b.id)
    val (all0, n0) = History.list(spark, dir, "u1", isAdmin = true)
    assert(n0 === 2L)
    assert(History.delete(spark, dir, isAdmin = true, a.id))
    val (all1, n1) = History.list(spark, dir, "u1", isAdmin = true)
    assert(n1 === 1L)
    assert(all1.select("id").collect().map(_.getString(0)).toSeq === Seq(b.id))
  }

  test("pcapng blob: out-of-range read throws EOF instead of zero-padding") {
    // minimal pcapng: SHB + IDB + one EPB with a 4-byte packet
    val buf = ByteBuffer.allocate(28 + 20 + 36).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0x0a0d0d0a).putInt(28).putInt(0x1a2b3c4d)
      .putShort(1).putShort(0).putLong(-1L).putInt(28)
    buf.putInt(1).putInt(20).putShort(1).putShort(0).putInt(65535).putInt(20)
    buf.putInt(6).putInt(36).putInt(0) // EPB, ifId 0
      .putInt(0).putInt(0) // ts hi/lo
      .putInt(4).putInt(4) // cap/orig len
      .putInt(0xdeadbeef) // packet (4 bytes, already 32-bit aligned)
      .putInt(36)
    val f = Files.createTempDirectory("graft-blob").resolve("x.pcapng")
    Files.write(f, buf.array())
    val blob = PcapStore.Local.open(f.toString)
    try {
      val sz = blob.size
      assert(sz > 0)
      assert(blob.read(0, sz.toInt).length === sz.toInt)
      intercept[java.io.EOFException] { blob.read(sz - 2, 8) }
      intercept[java.io.EOFException] { blob.read(-1, 4) }
    } finally blob.close()
  }
}
