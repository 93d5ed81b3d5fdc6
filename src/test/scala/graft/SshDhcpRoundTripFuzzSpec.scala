package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{DhcpParser, SshParser}

/** Round-trip fuzz for the SSH and DHCP extractors: generated wire
  * messages with the expectations computed from the PUBLIC definitions
  * (salesforce/hassh: md5 of "kex;enc_c2s;mac_c2s;comp_c2s"; RFC 2131
  * BOOTP layout + option 53), never from the parsers.
  *
  * SSH inputs stay on reference-parseable shapes (r15, after the
  * ssh.c-exact rewrite): one delivered chunk per banner/message, and
  * the host key rides message code 33 — the only code the reference
  * reads a key from (ssh.c:188; a plain KEXDH_REPLY 31 is never
  * walked). Hostile shapes are SshDifferentialFuzzSpec territory.
  */
class SshDhcpRoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x55bd8cbL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("US-ASCII")).map(x => f"${x & 0xff}%02x").mkString

  private final class Enc {
    val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u32(v: Long): Unit = {
      u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt)
    }
    def str(s: String): Unit = {
      u32(s.length.toLong); buf.write(s.getBytes(StandardCharsets.ISO_8859_1))
    }
    def bytes(b: Array[Byte]): Unit = buf.write(b)
  }

  /** One SSH binary packet: u32 packet_length, u8 padding_length,
    * payload, padding (RFC 4253 §6).
    */
  private def sshPacket(msgType: Int, payload: Array[Byte]): Array[Byte] = {
    val pad = 4 + nextInt(8)
    val e = new Enc
    e.u32((1 + 1 + payload.length + pad).toLong)
    e.u8(pad); e.u8(msgType); e.bytes(payload)
    e.bytes(new Array[Byte](pad))
    e.buf.toByteArray
  }

  private val kexAlgos = Seq("curve25519-sha256", "ecdh-sha2-nistp256",
    "diffie-hellman-group14-sha256", "sntrup761x25519-sha512@openssh.com")
  private val encAlgos = Seq("aes128-ctr", "aes256-gcm@openssh.com",
    "chacha20-poly1305@openssh.com")
  private val macAlgos = Seq("hmac-sha2-256", "umac-128-etm@openssh.com")
  private val compAlgos = Seq("none", "zlib@openssh.com", "none,zlib")

  private def nameList(pool: Seq[String]): String =
    (0 until 1 + nextInt(3)).map(_ => oneOf(pool)).distinct.mkString(",")

  /** KEXINIT payload: 16-byte cookie + 10 name-lists + flags/reserved.
    * Returns (payload, the 10 lists in order).
    */
  private def kexinit(): (Array[Byte], Seq[String]) = {
    val lists = Seq(
      nameList(kexAlgos),               // 0 kex
      "ssh-ed25519,rsa-sha2-512",       // 1 host key algos
      nameList(encAlgos),               // 2 enc c2s
      nameList(encAlgos),               // 3 enc s2c
      nameList(macAlgos),               // 4 mac c2s
      nameList(macAlgos),               // 5 mac s2c
      oneOf(compAlgos),                 // 6 comp c2s
      oneOf(compAlgos),                 // 7 comp s2c
      "",                               // 8 lang c2s
      "")                               // 9 lang s2c
    val e = new Enc
    e.bytes(Array.tabulate(16)(i => (i * 7).toByte)) // cookie
    lists.foreach(e.str)
    e.u8(0)        // first_kex_packet_follows
    e.u32(0L)      // reserved
    (e.buf.toByteArray, lists)
  }

  test("ssh banners, HASSH/hasshServer and host keys round-trip") {
    for (trial <- 0 until 150) {
      val cBanner = s"SSH-2.0-Client_${nextInt(99)}.${nextInt(9)}"
      val sBanner = s"SSH-2.0-Server_${nextInt(99)}"
      val (cKex, cLists) = kexinit()
      val (sKex, sLists) = kexinit()
      val chunks = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
      chunks += ((0, (cBanner + "\r\n").getBytes(StandardCharsets.ISO_8859_1)))
      chunks += ((1, (sBanner + "\r\n").getBytes(StandardCharsets.ISO_8859_1)))
      chunks += ((0, sshPacket(20, cKex)))
      chunks += ((1, sshPacket(20, sKex)))
      // host key inside the GEX reply (33): string(blob) where the blob
      // starts with a length-prefixed algorithm name
      val hostKey: Option[Array[Byte]] =
        if (chance(70)) {
          val blob = new Enc
          blob.str(oneOf(Seq("ssh-rsa", "ssh-ed25519", "ecdsa-sha2-nistp256")))
          blob.bytes(Array.tabulate(32 + nextInt(64))(i => (i * 11).toByte))
          val reply = new Enc
          reply.str(new String(blob.buf.toByteArray,
            StandardCharsets.ISO_8859_1))
          reply.bytes(Array.tabulate(16)(_.toByte)) // f, signature stub
          chunks += ((1, sshPacket(33, reply.buf.toByteArray)))
          Some(blob.buf.toByteArray)
        } else None
      val info = SshParser.parseChunks(chunks.toSeq)
        .getOrElse(fail(s"trial $trial: no SshInfo"))
      assert(info.version.sorted ==
        Seq(cBanner, sBanner).map(_.toLowerCase).distinct.sorted,
        s"trial $trial version")
      val expHassh = md5hex(Seq(cLists(0), cLists(2), cLists(4), cLists(6))
        .mkString(";"))
      val expHasshServer = md5hex(Seq(sLists(0), sLists(3), sLists(5),
        sLists(7)).mkString(";"))
      assert(info.hassh == Seq(expHassh), s"trial $trial hassh")
      assert(info.hasshServer == Seq(expHasshServer),
        s"trial $trial hasshServer")
      assert(info.key == hostKey.map(
        java.util.Base64.getEncoder.encodeToString).toSeq,
        s"trial $trial host key")
    }
  }

  test("dhcp bootp messages round-trip xid, macs, types and hosts") {
    // full names table incl. the leasequery family (dhcp.c:35-54)
    val typeNames = Array("", "DISCOVER", "OFFER", "REQUEST", "DECLINE",
      "ACK", "NAK", "RELEASE", "INFORM", "FORCERENEW", "LEASEQUERY",
      "LEASEUNASSIGNED", "LEASEUNKNOWN", "LEASEACTIVE", "BULKLEASEQUERY",
      "LEASEQUERYDONE", "ACTIVELEASEQUERY", "LEASEQUERYSTATUS", "TLS")
    for (trial <- 0 until 150) {
      val n = 1 + nextInt(4)
      final case class Want(id: String, macs: Seq[String],
          types: Seq[String], hosts: Seq[String])
      val msgs = (0 until n).map { _ =>
        val xid = (nextInt(1 << 30).toLong << 2) | nextInt(4)
        val mac = Array.tabulate(6)(_ => nextInt(256))
        val b = new java.io.ByteArrayOutputStream()
        b.write(1); b.write(1); b.write(6); b.write(0) // op htype hlen hops
        (0 until 4).foreach(k => b.write(((xid >> (24 - k * 8)) & 0xff).toInt))
        b.write(new Array[Byte](20)) // secs flags ciaddr yiaddr siaddr giaddr
        mac.foreach(b.write)
        b.write(new Array[Byte](10)) // chaddr pad
        b.write(new Array[Byte](192)) // sname + file
        b.write(Array[Byte](0x63, 0x82.toByte, 0x53, 0x63)) // magic
        val macs = Seq.newBuilder[String]
        val types = Seq.newBuilder[String]
        val hosts = Seq.newBuilder[String]
        macs += mac.map(m => f"$m%02x").mkString(":")
        // an unknown option the walk must skip
        if (chance(40)) { b.write(43); b.write(2); b.write(9); b.write(9) }
        if (chance(50)) { // option 12 host name, mixed case → lowered
          val h = s"Host${nextInt(90)}"
          b.write(12); b.write(h.length); b.write(h.getBytes)
          hosts += h.toLowerCase
        }
        if (chance(40)) { // option 61 client identifier (type 1 + mac)
          val cm = Array.tabulate(6)(_ => nextInt(256))
          b.write(61); b.write(7); b.write(1); cm.foreach(b.write)
          macs += cm.map(m => f"$m%02x").mkString(":")
        }
        if (chance(40)) { // option 81 FQDN, ascii encoding (flags 0)
          val f = s"Fq${nextInt(90)}.example"
          b.write(81); b.write(3 + f.length); b.write(0); b.write(0)
          b.write(0); b.write(f.getBytes)
          hosts += f.toLowerCase
        }
        if (chance(70)) { // option 53 message type — optional: a plain
          // BOOTP message still contributes its xid and chaddr mac
          val t = 1 + nextInt(18)
          b.write(53); b.write(1); b.write(t)
          types += typeNames(t)
        }
        b.write(255)
        // the parser's floor is 256 bytes (dhcp.c:56) — real messages
        // pad past it; zeros after the end tag are never walked
        while (b.size() < 260) b.write(0)
        (b.toByteArray,
          Want(f"$xid%x", macs.result(), types.result(), hosts.result()))
      }
      val info = DhcpParser.parse(msgs.map(_._1))
        .getOrElse(fail(s"trial $trial: no DhcpInfo"))
      assert(info.id == msgs.map(_._2.id).distinct.sorted, s"trial $trial id")
      assert(info.mac == msgs.flatMap(_._2.macs).distinct.sorted,
        s"trial $trial mac")
      assert(info.dhcpType == msgs.flatMap(_._2.types).distinct.sorted,
        s"trial $trial type")
      assert(info.host == msgs.flatMap(_._2.hosts).distinct.sorted,
        s"trial $trial host")
      // an under-floor message (dhcp.c:56 len < 256) contributes nothing
      assert(DhcpParser.parse(Seq(msgs.head._1.take(250))).isEmpty,
        s"trial $trial floor")
    }
  }
}
