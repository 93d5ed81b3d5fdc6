package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{AppProtocols, Decode, SessionBuilder}

/** Round-trip property fuzz for two parse kernels whose correctness so
  * far rested on fixed goldens:
  *
  *  - TCP reassembly: ANY covering multiset of stream slices (random
  *    segmentation + duplicates + partial-overlap retransmits, shuffled
  *    arrival, wrap-straddling ISNs) must reassemble to the original
  *    byte stream — the generator KNOWS the stream, so equality is an
  *    independent oracle (parsers/tcp.c:228-336 semantics).
  *
  *  - DNS messages: a structured generator encodes questions/records
  *    (with label-compression pointers, the classic parser-bug source)
  *    and predicts every DnsInfo field from its own model of
  *    parsers/dns.c (question names lowered, unknown type/class ids
  *    skipped, RR attribution through the host/ns/mx sets) — the
  *    encoder and the expectation never consult the parser.
  */
class RoundTripFuzzSpec extends AnyFunSuite {

  private var seed = 0x0dd5eedL
  private def nextInt(bound: Int): Int = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    (((seed >>> 33) % bound + bound) % bound).toInt
  }
  private def oneOf[T](xs: Seq[T]): T = xs(nextInt(xs.length))

  private def pkt(i: Int, seq: Long, payload: Array[Byte],
      flags: Int = Decode.TH_ACK): Decode.DecodedPacket =
    Decode.DecodedPacket("f", i, 1000L + i, 0L, 60 + payload.length,
      54 + payload.length, "", "", 6, "1.1.1.1", "2.2.2.2", 1234, 80,
      flags, 1000, seq, 0L, payload)

  test("tcp reassembly: covering slices with dups/overlaps/wrap round-trip") {
    for (trial <- 0 until 300) {
      val n = 1 + nextInt(4000)
      val stream = Array.tabulate(n)(k => ((k * 31 + trial) & 0xff).toByte)
      // ISN pool straddles the 32-bit wrap so rel() arithmetic is hot
      val isn = oneOf(Seq(0L, 1L, 0xfffffff0L, 0xffffffffL,
        0x7fffffffL, nextInt(1 << 30).toLong))
      val base = (isn + 1) & 0xffffffffL
      // contiguous cover: random cut points
      var cuts = List(0, n)
      for (_ <- 0 until nextInt(12)) cuts = nextInt(n + 1) :: cuts
      val cover = cuts.distinct.sorted.sliding(2).collect {
        case List(a, b) if b > a => (a, b)
      }.toSeq
      // extra slices: duplicates and partial overlaps of the SAME data
      val extras = (0 until nextInt(8)).map { _ =>
        val a = nextInt(n)
        val b = a + 1 + nextInt(n - a)
        (a, b)
      }
      val segs = scala.util.Random.javaRandomToRandom(
        new java.util.Random(trial * 7919L + 13))
        .shuffle((cover ++ extras).toList)
      val packets = pkt(0, isn, Array.emptyByteArray, Decode.TH_SYN) +:
        segs.zipWithIndex.map { case ((a, b), k) =>
          pkt(k + 1, (base + a) & 0xffffffffL,
            java.util.Arrays.copyOfRange(stream, a, b))
        }
      val out = SessionBuilder.reassemble(packets)
      assert(java.util.Arrays.equals(out, stream),
        s"trial $trial: ${out.length} bytes vs ${stream.length} " +
          s"(isn=$isn cover=${cover.size} extras=${extras.size})")
    }
  }

  // ---- DNS: independent encoder + expectation model -------------------

  /** One encoded name: labels, then either a terminating 0 or a
    * compression pointer to a previously-encoded name's offset.
    */
  private final class DnsEnc {
    val buf = new java.io.ByteArrayOutputStream()
    def pos: Int = buf.size
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    /** Encode labels; returns this name's start offset. */
    def name(labels: Seq[String], ptr: Option[Int] = None): Int = {
      val start = pos
      labels.foreach { l => u8(l.length); buf.write(l.getBytes("ISO-8859-1")) }
      ptr match {
        case Some(off) => u16(0xc000 | off)
        case None      => u8(0)
      }
      start
    }
  }

  // independent copies of the reference's tables (parsers/dns.c:622-683,
  // dns.c:21) — NOT read from AppProtocols
  private val typeNames = Map(1 -> "A", 2 -> "NS", 5 -> "CNAME",
    12 -> "PTR", 15 -> "MX", 16 -> "TXT", 28 -> "AAAA", 33 -> "SRV",
    255 -> "ANY")
  private val classNames = Map(1 -> "IN", 3 -> "CH", 255 -> "ANY")
  private val statuses = Array("NOERROR", "FORMERR", "SERVFAIL",
    "NXDOMAIN", "NOTIMPL", "REFUSED")

  private def randLabel(): String = {
    val len = 1 + nextInt(12)
    (0 until len).map(_ => oneOf(("abcdefghijklmnopqrstuvwxyz0123456789" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ").toSeq)).mkString
  }

  test("dns queries: names (incl. compression + root), types, classes round-trip") {
    for (trial <- 0 until 200) {
      val enc = new DnsEnc
      val qd = 1 + nextInt(3)
      enc.u16(trial); enc.u16(0x0100) // id, QR=0 RD=1
      enc.u16(qd); enc.u16(0); enc.u16(0); enc.u16(0)
      var nameOffs = List.empty[(Int, String)] // (offset, full lowercase)
      val expNames = Seq.newBuilder[String]
      val expTypes = Seq.newBuilder[String]
      val expClasses = Seq.newBuilder[String]
      for (q <- 0 until qd) {
        val (off, full) = nextInt(4) match {
          case 0 if nameOffs.nonEmpty => // pure pointer to an earlier name
            val (o, f) = oneOf(nameOffs)
            (enc.name(Nil, ptr = Some(o)), f)
          case 1 if nameOffs.nonEmpty => // fresh labels + pointer suffix
            val (o, f) = oneOf(nameOffs)
            val ls = (0 until 1 + nextInt(2)).map(_ => randLabel())
            (enc.name(ls, ptr = Some(o)),
              (ls.map(_.toLowerCase) :+ f).mkString("."))
          case 2 if q == 0 && nextInt(5) == 0 => // DNS root
            (enc.name(Nil), "")
          case _ =>
            val ls = (1 to 1 + nextInt(3)).map(_ => randLabel())
            (enc.name(ls), ls.map(_.toLowerCase).mkString("."))
        }
        if (full.nonEmpty) nameOffs = (off, full) :: nameOffs
        // qtype: mostly known ids, sometimes an unknown one (skipped)
        val (qt, qtName) =
          if (nextInt(5) == 0) (57, None)
          else { val t = oneOf(typeNames.keys.toSeq); (t, Some(typeNames(t))) }
        val (qc, qcName) =
          if (nextInt(6) == 0) (9, None)
          else { val c = oneOf(classNames.keys.toSeq); (c, Some(classNames(c))) }
        enc.u16(qt); enc.u16(qc)
        expNames += (if (full.isEmpty) "<root>" else full)
        qtName.foreach(expTypes += _)
        qcName.foreach(expClasses += _)
      }
      val info = AppProtocols.parseDnsMessage(enc.buf.toByteArray)
        .getOrElse(fail(s"trial $trial: query did not parse"))
      assert(info.qname == expNames.result(), s"trial $trial names")
      assert(info.qtype == expTypes.result(), s"trial $trial types")
      assert(info.qclass == expClasses.result(), s"trial $trial classes")
      assert(info.rcode.isEmpty, "queries carry no status")
      assert(info.opcode == Seq("QUERY"))
      assert(info.ip.isEmpty, "query record sections are not walked")
    }
  }

  test("dns responses: RR attribution through host/ns/mx sets with pointers") {
    for (trial <- 0 until 150) {
      val enc = new DnsEnc
      val qLabels = (1 to 2).map(_ => randLabel())
      val qFull = qLabels.map(_.toLowerCase).mkString(".")
      val rcode = nextInt(6)
      val expIp = Seq.newBuilder[String]
      val expHosts = Seq.newBuilder[String]
      val expNsHost = Seq.newBuilder[String]
      val expNsIp = Seq.newBuilder[String]
      val expMxHost = Seq.newBuilder[String]
      val expMxIp = Seq.newBuilder[String]
      expHosts += qFull
      // record list assembled first (count needed in the header):
      // each entry = (ownerPtrToQ | fresh labels, rtype, rdata builder)
      final case class RR(ownerPtr: Boolean, owner: Seq[String],
          rtype: Int, rdata: DnsEnc => Unit)
      def ip4(): (String, Array[Int]) = {
        val o = Array(1 + nextInt(254), nextInt(256), nextInt(256),
          1 + nextInt(254))
        (o.mkString("."), o)
      }
      val plan = Seq.newBuilder[RR]
      // A owned by the question name (pointer) → dns.ip
      if (nextInt(3) != 0) {
        val (s, o) = ip4(); expIp += s
        plan += RR(ownerPtr = true, Nil, 1, e => o.foreach(e.u8))
      }
      // CNAME owned by question → rdata joins dns.host; a following A
      // owned by THAT name (encoded inline, no pointer) attributes too
      var cname: Option[Seq[String]] = None
      if (nextInt(2) == 0) {
        val c = (1 to 2).map(_ => randLabel())
        cname = Some(c)
        expHosts += c.map(_.toLowerCase).mkString(".")
        plan += RR(ownerPtr = true, Nil, 5,
          e => { c.foreach { l => e.u8(l.length)
            e.buf.write(l.getBytes("ISO-8859-1")) }; e.u8(0) })
        if (nextInt(2) == 0) {
          val (s, o) = ip4(); expIp += s
          plan += RR(ownerPtr = false, c, 1, e => o.foreach(e.u8))
        }
      }
      // NS rdata → nameserverHost; its A → nameserverIp
      if (nextInt(2) == 0) {
        val nsH = (1 to 2).map(_ => randLabel())
        expNsHost += nsH.map(_.toLowerCase).mkString(".")
        plan += RR(ownerPtr = true, Nil, 2,
          e => { nsH.foreach { l => e.u8(l.length)
            e.buf.write(l.getBytes("ISO-8859-1")) }; e.u8(0) })
        if (nextInt(2) == 0) {
          val (s, o) = ip4(); expNsIp += s
          plan += RR(ownerPtr = false, nsH, 1, e => o.foreach(e.u8))
        }
      }
      // MX rdata (pref + exchange) → mailserverHost; its A → mailserverIp
      if (nextInt(2) == 0) {
        val mxH = (1 to 2).map(_ => randLabel())
        expMxHost += mxH.map(_.toLowerCase).mkString(".")
        plan += RR(ownerPtr = true, Nil, 15,
          e => { e.u16(10); mxH.foreach { l => e.u8(l.length)
            e.buf.write(l.getBytes("ISO-8859-1")) }; e.u8(0) })
        if (nextInt(2) == 0) {
          val (s, o) = ip4(); expMxIp += s
          plan += RR(ownerPtr = false, mxH, 1, e => o.foreach(e.u8))
        }
      }
      // an A owned by an UNRELATED name: attributed to nothing
      if (nextInt(2) == 0) {
        val (_, o) = ip4()
        plan += RR(ownerPtr = false, Seq(randLabel(), randLabel()), 1,
          e => o.foreach(e.u8))
      }
      val rrs = plan.result()
      enc.u16(trial); enc.u16(0x8180 | rcode) // QR=1 RD RA + rcode
      enc.u16(1); enc.u16(rrs.length); enc.u16(0); enc.u16(0)
      val qOff = enc.name(qLabels)
      enc.u16(1); enc.u16(1) // A IN
      rrs.foreach { r =>
        if (r.ownerPtr) enc.name(Nil, ptr = Some(qOff))
        else enc.name(r.owner)
        enc.u16(r.rtype); enc.u16(1) // class IN
        enc.u16(0); enc.u16(60)      // ttl
        val lenAt = enc.pos
        enc.u16(0)                   // rdlength placeholder
        val before = enc.pos
        r.rdata(enc)
        val rdLen = enc.pos - before
        // patch the placeholder
        val bytes = enc.buf.toByteArray
        bytes(lenAt) = ((rdLen >> 8) & 0xff).toByte
        bytes(lenAt + 1) = (rdLen & 0xff).toByte
        enc.buf.reset(); enc.buf.write(bytes, 0, bytes.length)
      }
      val info = AppProtocols.parseDnsMessage(enc.buf.toByteArray)
        .getOrElse(fail(s"trial $trial: response did not parse"))
      assert(info.qname.toSet == expHosts.result().toSet,
        s"trial $trial hosts")
      assert(info.ip.sorted == expIp.result().distinct.sorted,
        s"trial $trial ip")
      assert(info.nameserverHost == expNsHost.result(), s"trial $trial ns")
      assert(info.nameserverIp.sorted == expNsIp.result().distinct.sorted,
        s"trial $trial nsIp")
      assert(info.mailserverHost == expMxHost.result(), s"trial $trial mx")
      assert(info.mailserverIp.sorted == expMxIp.result().distinct.sorted,
        s"trial $trial mxIp")
      assert(info.rcode == Seq(statuses(rcode)), s"trial $trial rcode")
    }
  }
}
