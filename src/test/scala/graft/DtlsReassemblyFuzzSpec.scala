package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{CertParser, DtlsParser}

/** Fragment-reassembly fuzz for the DTLS certificate path (reference:
  * capture/parsers/dtls.c). Property: a Certificate handshake message
  * cut at arbitrary fragment boundaries, fragments shuffled, packed
  * 1..n per record and 1..n records per datagram, with non-handshake
  * and non-Certificate noise interleaved, must produce exactly the
  * certs of the unfragmented message. Cert DERs come from an
  * independent minimal encoder; identity is pinned by sha1/serial/CN
  * (full field fidelity is CertRoundTripFuzzSpec's job). Hostile
  * corners: record-length lies, zero-length records/fragments,
  * oversize totalLen, duplicate/overlapping fragments (no-throw).
  */
class DtlsReassemblyFuzzSpec extends AnyFunSuite {

  private var seed = 0x0d715f00dL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def chance(pct: Int): Boolean = nextInt(100) < pct
  private def randBytes(n: Int): Array[Byte] =
    Array.fill(n)(nextInt(256).toByte)

  // ----------------------------------------------- minimal cert encoder
  private def tlv(tag: Int, body: Array[Byte]): Array[Byte] = {
    val len = body.length
    val hdr =
      if (len > 255) Array((tag & 0xff).toByte, 0x82.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte)
      else if (len > 127) Array((tag & 0xff).toByte, 0x81.toByte, len.toByte)
      else Array((tag & 0xff).toByte, len.toByte)
    hdr ++ body
  }
  private def cat(xs: Array[Byte]*): Array[Byte] =
    xs.foldLeft(Array.emptyByteArray)(_ ++ _)

  private final case class CertModel(der: Array[Byte], hash: String,
      serial: String, subjectCN: String)

  /** Minimal lenient-path cert (two-child outer → deterministic JDK
    * reject): serial, sha256RSA alg, issuer/subject with one CN,
    * UTCTime validity, RSA SPKI. Padded with a junk TBS tail so DERs
    * get big enough to need several fragments.
    */
  private def mkCert(): CertModel = {
    val rsaOid = Array[Byte](6, 9, 0x2a, 0x86.toByte, 0x48, 0x86.toByte,
      0xf7.toByte, 0x0d, 1, 1, 1)
    val shaRsaOid = Array[Byte](6, 9, 0x2a, 0x86.toByte, 0x48, 0x86.toByte,
      0xf7.toByte, 0x0d, 1, 1, 0x0b)
    val cnOid = Array[Byte](6, 3, 0x55, 4, 3)
    val serial = randBytes(4 + nextInt(8))
    serial(0) = (serial(0) & 0x7f).toByte
    if (serial(0) == 0) serial(0) = 1
    val cn = "host-" + nextInt(100000) + ".example.com"
    def name(v: String) = tlv(0x30, tlv(0x31, tlv(0x30, cat(cnOid,
      tlv(0x13, v.getBytes(StandardCharsets.US_ASCII))))))
    val validity = tlv(0x30, cat(
      tlv(0x17, "240101000000Z".getBytes(StandardCharsets.US_ASCII)),
      tlv(0x17, "250101000000Z".getBytes(StandardCharsets.US_ASCII))))
    val spki = tlv(0x30, cat(tlv(0x30, cat(rsaOid, Array[Byte](5, 0))),
      tlv(0x03, 0.toByte +: randBytes(60 + nextInt(400)))))
    val tbs = tlv(0x30, cat(
      tlv(0x02, serial),
      tlv(0x30, shaRsaOid ++ Array[Byte](5, 0)),
      name("Issuing CA " + nextInt(100)),
      validity,
      name(cn),
      spki))
    val der = tlv(0x30, cat(tbs, tlv(0x30, shaRsaOid ++ Array[Byte](5, 0))))
    val sha1 = java.security.MessageDigest.getInstance("SHA-1").digest(der)
      .map("%02x".format(_)).mkString(":")
    CertModel(der, sha1, serial.map("%02x".format(_)).mkString, cn)
  }

  private def u16(n: Int) = Array(((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
  private def u24(n: Int) = Array(((n >> 16) & 0xff).toByte,
    ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)

  /** Certificate message body: u24 chain length then u24+DER entries. */
  private def certMessage(certs: Seq[CertModel]): Array[Byte] = {
    val chain = certs.map(c => u24(c.der.length) ++ c.der)
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    u24(chain.length) ++ chain
  }

  /** One handshake fragment: type 11, total length, msg_seq, frag. */
  private def fragment(msgSeq: Int, total: Int, off: Int,
      bytes: Array[Byte], htype: Int = 11): Array[Byte] =
    cat(Array(htype.toByte), u24(total), u16(msgSeq), u24(off),
      u24(bytes.length), bytes)

  /** One DTLS record: type, version, epoch, 6-byte seq, length, body. */
  private def record(ctype: Int, body: Array[Byte]): Array[Byte] =
    cat(Array(ctype.toByte, 0xfe.toByte, 0xfd.toByte), randBytes(2),
      randBytes(6), u16(body.length), body)

  private def noiseRecord(): Array[Byte] = nextInt(4) match {
    case 0 => record(20, Array[Byte](1)) // ChangeCipherSpec
    case 1 => record(21, randBytes(2)) // Alert
    case 2 => record(23, randBytes(5 + nextInt(40))) // appdata
    case _ => // handshake record with a non-Certificate message
      val b = randBytes(10 + nextInt(30))
      record(22, fragment(nextInt(100) + 100, b.length, 0, b, htype = 1))
  }

  /** Cut `body` into 1..6 fragments at random boundaries. */
  private def cuts(msgSeq: Int, body: Array[Byte]): Seq[Array[Byte]] = {
    val nCuts = nextInt(6)
    val points = (Seq.fill(nCuts)(nextInt(body.length + 1)) ++ Seq(0, body.length))
      .distinct.sorted
    points.sliding(2).map { case Seq(a, b) =>
      fragment(msgSeq, body.length, a, body.slice(a, b))
    }.toSeq
  }

  private def checkCerts(got: Seq[CertParser.CertInfo],
      want: Seq[CertModel]): Unit = {
    assert(got.length == want.length)
    got.sortBy(_.hash).zip(want.sortBy(_.hash)).foreach { case (c, m) =>
      assert(c.hash == m.hash)
      assert(c.serial == m.serial)
      assert(c.subjectCN == Seq(m.subjectCN))
    }
  }

  test("fragmentation invariance: shuffled fragments across records and datagrams") {
    (0 until 60).foreach { trial =>
      val nMsgs = 1 + nextInt(2)
      val msgs = (0 until nMsgs).map { seq =>
        val certs = (0 until (1 + nextInt(3))).map(_ => mkCert())
        (seq, certMessage(certs), certs)
      }
      // fragments of all messages, shuffled (stable reassembly by offset)
      var frags = msgs.flatMap { case (seq, body, _) => cuts(seq, body) }
      frags = frags.sortBy(_ => nextInt(1 << 20))
      // pack 1..3 fragments per record, 1..3 records per datagram
      val records = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var i = 0
      while (i < frags.length) {
        val take = 1 + nextInt(3)
        records += record(22, cat(frags.slice(i, i + take): _*))
        i += take
      }
      // interleave noise records
      (0 until nextInt(4)).foreach { _ =>
        records.insert(nextInt(records.length + 1), noiseRecord())
      }
      // group into datagrams
      val datagrams = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      i = 0
      while (i < records.length) {
        val take = 1 + nextInt(3)
        datagrams += cat(records.slice(i, i + take).toSeq: _*)
        i += take
      }
      val got = DtlsParser.certs(datagrams.toSeq)
      val want = msgs.flatMap(_._3)
      withClue(s"trial $trial: ") {
        checkCerts(got, want)
        // and the unfragmented parse agrees
        val direct = msgs.flatMap { case (_, body, _) =>
          CertParser.fromCertificateMessage(body) }
        checkCerts(direct, want)
      }
    }
  }

  test("oversize totalLen and non-handshake records are ignored") {
    val c = mkCert()
    val body = certMessage(Seq(c))
    // totalLen >= 1<<22 → rejected outright
    val huge = record(22, fragment(0, 1 << 22, 0, body))
    assert(DtlsParser.certs(Seq(huge)).isEmpty)
    // the same bytes in a non-handshake record type → ignored
    val wrongType = record(23, fragment(0, body.length, 0, body))
    assert(DtlsParser.certs(Seq(wrongType)).isEmpty)
    // correct single-fragment record parses
    val ok = record(22, fragment(0, body.length, 0, body))
    checkCerts(DtlsParser.certs(Seq(ok)), Seq(c))
  }

  test("record-length lies, zero lengths, duplicates: never throw") {
    (0 until 60).foreach { trial =>
      val c = mkCert()
      val body = certMessage(Seq(c))
      val frags = cuts(0, body)
      val mutation = nextInt(5)
      val recs = frags.map(f => record(22, f)).toArray
      mutation match {
        case 0 => // record length lies beyond the datagram
          val r = recs(nextInt(recs.length))
          r(11) = 0xff.toByte; r(12) = 0xff.toByte
        case 1 => // zero record length (skip to end of datagram)
          val r = recs(nextInt(recs.length))
          r(11) = 0; r(12) = 0
        case 2 => // duplicate one fragment (double-counted; no throw)
          ()
        case 3 => // truncate the datagram mid-record
          ()
        case _ => // fragment-length lie inside one record
          val r = recs(nextInt(recs.length))
          if (r.length > 23) { r(22) = 0xff.toByte }
      }
      var datagram = cat(recs.toIndexedSeq: _*)
      if (mutation == 2) datagram = cat(datagram, recs(nextInt(recs.length)))
      if (mutation == 3) datagram = datagram.take(
        math.max(1, datagram.length - 1 - nextInt(datagram.length)))
      withClue(s"trial $trial mutation $mutation: ") {
        DtlsParser.certs(Seq(datagram)) // must not throw
      }
    }
  }

  test("fragments split across separate datagrams reassemble") {
    (0 until 20).foreach { trial =>
      val certs = (0 until (1 + nextInt(2))).map(_ => mkCert())
      val body = certMessage(certs)
      val frags = cuts(0, body)
      val datagrams = frags.map(f => record(22, f))
      withClue(s"trial $trial: ") {
        checkCerts(DtlsParser.certs(datagrams), certs)
      }
    }
  }
}
