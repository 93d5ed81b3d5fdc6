package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{PcapCrypto, SessionBuilder}
import graft.ops.{Hunt, PcapExport}

/** Encrypted-at-rest pcap store (writer-simple.c aes-256-ctr / xor-2048,
  * pcap.js seek-decrypt, decryptPcap.js). KDF/wrap/CTR vectors below were
  * generated with OpenSSL 3.5 (`enc -aes-192-cbc -md md5 -nosalt -P`,
  * `enc -aes-256-ctr -K .. -iv ..`) — the same library the reference's
  * C writer links against.
  */
class PcapCryptoSpec extends AnyFunSuite with SparkSpecBase {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("EVP_BytesToKey(md5, 1 round) matches OpenSSL for aes-192-cbc") {
    val (key, iv) = PcapCrypto.evpBytesToKey(
      "graft-kek-secret".getBytes("UTF-8"), 24, 16)
    assert(hex(key) == "4e0e9d906738764363c3a00b2a029f43d3b19c2cf12a4f62")
    assert(hex(iv) == "d457f30fb26066b1567e08044593847f")
  }

  test("DEK wrap matches OpenSSL aes-192-cbc and unwraps back") {
    val dek = Array.tabulate[Byte](32)(_.toByte)
    val wrapped = PcapCrypto.wrapDek(dek, "graft-kek-secret")
    assert(wrapped ==
      "57ecfea2455971a4a74cdd47bb9044974c1757f789eb1bbf3a7435830b6" +
      "66de52f3883595d6c8895db2ecbd3d57904d2")
    assert(PcapCrypto.unwrapDek(wrapped, "graft-kek-secret").sameElements(dek))
  }

  test("aes-256-ctr stream matches OpenSSL; unaligned slices decrypt") {
    val msg = "the quick brown fox jumps over the lazy dog 0123456789"
      .getBytes("ISO-8859-1")
    val k = PcapCrypto.FileKeys("aes-256-ctr",
      unhex("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"),
      unhex("00112233445566778899aabb00000000"))
    val want =
      "eadb409bedf2d08e36393c639ab9800cc9e5404d75077eaa8f1444df0519" +
      "72e3b2e3d0df2e1d323e0c0fa73c4abdb00e0d3785622a53"
    val enc = PcapCrypto.encrypt(msg, k)
    assert(hex(enc) == want)
    // random access: decrypt arbitrary (pos, len) windows of the
    // ciphertext without the preceding bytes — the block counter is
    // pos/16 and the intra-block skip pos%16 (pcap.js:188-213)
    for (pos <- Seq(0, 1, 15, 16, 17, 31, 33, 47); len <- Seq(1, 5, 16, 20)
         if pos + len <= msg.length) {
      val slice = java.util.Arrays.copyOfRange(enc, pos, pos + len)
      assert(PcapCrypto.decryptAt(slice, pos.toLong, k)
        .sameElements(java.util.Arrays.copyOfRange(msg, pos, pos + len)),
        s"ctr slice at pos=$pos len=$len")
    }
  }

  test("xor-2048 pad is phased to the absolute file offset") {
    val k = PcapCrypto.newKeys("xor-2048",
      new java.security.SecureRandom(Array[Byte](1, 2, 3)))
    val plain = Array.tabulate[Byte](1000)(i => (i * 7).toByte)
    val enc = PcapCrypto.encrypt(plain, k)
    assert(!enc.sameElements(plain))
    // whole-stream symmetry
    assert(PcapCrypto.decryptAt(enc.clone(), 0L, k).sameElements(plain))
    // a slice crossing the 256-byte pad boundary decrypts by phase
    val slice = java.util.Arrays.copyOfRange(enc, 250, 300)
    assert(PcapCrypto.decryptAt(slice, 250L, k)
      .sameElements(java.util.Arrays.copyOfRange(plain, 250, 300)))
  }

  test("hunt over an encrypted store matches the plaintext hunt") {
    import spark.implicits._
    val srcPcap = "/root/reference/tests/pcap/socks-http-example.pcap"
    val plainSessions = SessionBuilder.sessionizeRef(spark, srcPcap)

    val tmp = Files.createTempDirectory("graft-encstore")
    val plainBytes = Files.readAllBytes(Paths.get(srcPcap))
    val keysByFile = Seq("aes-256-ctr", "xor-2048").map { encMode =>
      val k = PcapCrypto.newKeys(encMode)
      val encPath = tmp.resolve(s"store-$encMode.pcap").toString
      Files.write(Paths.get(encPath), PcapCrypto.encrypt(plainBytes, k))
      encPath -> k
    }.toMap

    for ((encPath, k) <- keysByFile) {
      val encSessions = plainSessions
        .map(s => s.copy(fileId = s.fileId.map(_ => encPath)))
      val lookup = (f: String) =>
        if (f == encPath) k else PcapCrypto.Normal
      val hit = Hunt.run(encSessions, Hunt.HuntConfig(
        Hunt.AsciiNeedle("example.com", caseSensitive = false)), lookup)
      assert(hit.filter(col("huntTag").isNotNull).count() == 3,
        s"encrypted hunt under ${k.encoding}")
      // without the keys the same hunt must find nothing (and not crash):
      // ciphertext never contains the needle
      val blind = Hunt.run(encSessions, Hunt.HuntConfig(
        Hunt.AsciiNeedle("example.com", caseSensitive = false)))
      assert(blind.filter(col("huntTag").isNotNull).count() == 0)
    }
  }

  test("pcap export from an encrypted store emits plaintext pcap") {
    import spark.implicits._
    val srcPcap = "/root/reference/tests/pcap/socks-http-example.pcap"
    val plainBytes = Files.readAllBytes(Paths.get(srcPcap))
    val k = PcapCrypto.newKeys("aes-256-ctr")
    val tmp = Files.createTempDirectory("graft-encexport")
    val encPath = tmp.resolve("store.pcap").toString
    Files.write(Paths.get(encPath), PcapCrypto.encrypt(plainBytes, k))

    val sessions = SessionBuilder.sessionize(spark, srcPcap)
      .map(s => s.copy(fileId = s.fileId.map(_ => encPath)))
    val out = tmp.resolve("export.pcap").toString
    val n = PcapExport.writeFile(sessions, out,
      keys = (f: String) => if (f == encPath) k else PcapCrypto.Normal)
    assert(n > 0)
    val exported = Files.readAllBytes(Paths.get(out))
    // same invariant as the plaintext export spec: byte-preserving
    // permutation of the original capture, header verbatim
    assert(exported.length == plainBytes.length)
    assert(exported.slice(0, 24).sameElements(plainBytes.slice(0, 24)))
    // and decryptPcap.js-style whole-file decrypt restores the original
    assert(PcapCrypto.decryptFile(encPath, k).sameElements(plainBytes))
  }
}
