package graft.etl

import java.nio.charset.StandardCharsets

/** DNS message walker, rebuilt as a byte-exact transcription of the
  * reference's parser (capture/parsers/dns.c) over its BSB buffer
  * discipline (capture/bsb.h) — the same treatment the HTTP and SMTP
  * walkers got. The quirks below are semantics the reference actually
  * has and the differential fuzz (DnsDifferentialFuzzSpec) pins:
  *
  *  - dns_name (dns.c:117-158) treats ANY length byte with a high bit
  *    as a compression pointer: the test is `ch & 0xc0`, so lengths
  *    0x40-0xbf also read a 2-byte pointer (& 0x3fff), not a label.
  *  - At most 6 pointer jumps; the 7th returns a NULL name, which
  *    breaks the CURRENT section's loop only — the next record section
  *    resumes from the same buffer position (dns.c:252/306: `break`
  *    inside the per-section for).
  *  - A pointer whose 2-byte read runs off the end errors the OUTER
  *    walk but the name keeps walking from offset 0 of the message
  *    (BSB_IMPORT_u16 leaves tpos 0 on error; bsb.h:197-204).
  *  - A pointer target past the end makes an error-state BSB
  *    (bsb.h:13-22 BSB_INIT with negative size) — the walk just stops
  *    there and keeps what it has.
  *  - Label bytes are caret/meta encoded like the reference
  *    (dns.c:86-113): non-ASCII prepends "M-" and strips bit 7,
  *    non-printable prepends "^" and XORs 0x40.
  *  - A label length that overruns the remaining bytes does NOT stop
  *    the walk: the length byte is consumed, the pending '.' removed,
  *    and the NEXT byte is read as a fresh length (dns.c:152-153).
  *  - Names accumulate into an 8000-byte buffer; once full, further
  *    bytes (and the trailing-dot rewind) are dropped (dns.c:118,156).
  *  - Messages shorter than 17 bytes, opcode > 5, or a question count
  *    outside 1..10 record nothing (dns.c:213,226,243).
  *  - RDATA of class != IN is skipped whole (dns.c:330-333); A/AAAA
  *    with wrong rdlength contribute nothing but still skip.
  *  - NS/CNAME/MX whose rdata name is empty or errored `continue`
  *    PAST the rdlength skip (dns.c:370/384/410) — the next record
  *    parses from inside this record's rdata.
  *  - A/AAAA attribute to dns.ip / nameserverIp / mailserverIp by
  *    looking the owner up in the hosts recorded SO FAR (dns_find_host,
  *    dns.c:168-208) — state that spans every message of the session,
  *    so a response attributes against its own question AND earlier
  *    datagrams' names.
  *
  * parseDNSRecordAll=true semantics throughout (the reference test
  * deployment, tests/config.test.ini:31), matching the golden corpus.
  */
object DnsParser {
  import AppProtocols.DnsInfo

  /** bsb.h transcription: ptr/end cursor where error == (end = NULL);
    * imports on an errored or short buffer set the error and leave the
    * target value unchanged (modeled by returning the caller's 0).
    */
  private[etl] final class Bsb(val buf: Array[Byte], start: Int, len: Int) {
    var ptr: Int = start
    private[this] var endPos: Int =
      if (len < 0) Int.MinValue else start + len
    def error: Boolean = endPos == Int.MinValue
    def setError(): Unit = endPos = Int.MinValue
    def remaining: Int = if (error) 0 else endPos - ptr
    def u16(): Int =
      if (!error && ptr + 2 <= endPos) {
        val v = ((buf(ptr) & 0xff) << 8) | (buf(ptr + 1) & 0xff)
        ptr += 2; v
      } else { setError(); 0 }
    def skip(n: Int): Unit =
      if (!error && ptr + n <= endPos) ptr += n else setError()
  }

  /** dns_name + dns_name_element (dns.c:86-158). Returns null only for
    * the 7th pointer jump; otherwise the caret/meta-encoded ASCII name
    * bytes (possibly empty = the DNS root). Consumes `inbsb` up to the
    * terminating 0, or 2 bytes past the first pointer.
    */
  private[etl] def dnsNameC(full: Array[Byte], fullLen: Int,
      inbsb: Bsb): Array[Byte] = {
    val name = new Array[Byte](8000)
    var nlen = 0       // BSB_LENGTH(nbsb)
    var nerr = false   // nbsb export overflow
    def export(b: Int): Unit =
      if (!nerr && nlen < name.length) { name(nlen) = b.toByte; nlen += 1 }
      else nerr = true
    var didPointer = 0
    var cur = inbsb
    var done = false
    while (!done && cur.remaining > 0) {
      val ch = cur.buf(cur.ptr) & 0xff // IMPORT_u08: in bounds by the guard
      cur.ptr += 1
      if (ch == 0) done = true
      else {
        cur.ptr -= 1 // BSB_EXPORT_rewind(curbsb, 1)
        if ((ch & 0xc0) != 0) {
          if (didPointer > 5) return null
          didPointer += 1
          // on a 1-byte tail this errors cur (the caller sees it when
          // cur is the inbsb) and leaves tpos = 0 — walk restarts at
          // the message header, exactly like the C
          val tpos = cur.u16() & 0x3fff
          cur = new Bsb(full, tpos, fullLen - tpos)
        } else {
          if (nlen > 0) export('.') // gated on BSB_LENGTH, not on error
          // dns_name_element: nlen byte already known printable-ranged?
          // no — it is ch (1..63); always in bounds here
          cur.ptr += 1 // IMPORT_u08 of the element length (= ch)
          if (ch > cur.remaining) {
            // element overrun: rewind the pending dot (only when the
            // name buffer is not errored), keep walking
            if (!nerr && nlen > 0) nlen -= 1
          } else {
            var j = 0
            while (j < ch) {
              var c = cur.buf(cur.ptr) & 0xff
              cur.ptr += 1
              if (c >= 0x80) { export('M'); export('-'); c &= 0x7f }
              if (c < 0x20 || c == 0x7f) { export('^'); c ^= 0x40 }
              export(c)
              j += 1
            }
          }
        }
      }
    }
    java.util.Arrays.copyOfRange(name, 0, nlen)
  }

  /** Session-scoped host hashes (the reference's per-session field
    * hashes that dns_find_host probes): unicode host forms added so far
    * by ANY message of the session.
    */
  final class State {
    private[etl] val hostSet = scala.collection.mutable.HashSet[String]()
    private[etl] val nsSet = scala.collection.mutable.HashSet[String]()
    private[etl] val mxSet = scala.collection.mutable.HashSet[String]()
  }

  /** g_hostname_to_unicode seam (field.c:622-660): lowercase + punycode
    * label decode. Kept IDENTICAL to the pre-rewrite behavior (shared by
    * the fuzz model — value decoding is golden-pinned, the differential
    * fuzz targets the walk).
    */
  private[etl] def idnHost(rawLower: String): String =
    if (!rawLower.contains("xn--")) rawLower
    else try java.net.IDN.toUnicode(rawLower)
    catch { case _: Exception => rawLower }

  /** dns_parser (dns.c:210-439) over one message, with the session's
    * accumulated host state threaded for dns_find_host.
    */
  def parseMessage(data: Array[Byte], st: State): Option[DnsInfo] = {
    val len = data.length
    if (len < 17) return None
    val qr = (data(2) & 0x80) != 0
    val opcode = ((data(2) & 0xff) >> 3) & 0xf
    if (opcode > 5) return None
    val qdCount = ((data(4) & 0xff) << 8) | (data(5) & 0xff)
    val anCount = ((data(6) & 0xff) << 8) | (data(7) & 0xff)
    // parseDNSRecordAll=true: authority/additional always walked
    val nsCount = ((data(8) & 0xff) << 8) | (data(9) & 0xff)
    val arCount = ((data(10) & 0xff) << 8) | (data(11) & 0xff)
    if (qdCount <= 0 || qdCount > 10) return None

    val names = Seq.newBuilder[String]
    val types = Seq.newBuilder[String]
    val classes = Seq.newBuilder[String]
    val ip = Seq.newBuilder[String]
    val nsHosts = Seq.newBuilder[String]
    val mxHosts = Seq.newBuilder[String]
    val nsIp = Seq.newBuilder[String]
    val mxIp = Seq.newBuilder[String]
    val puny = Seq.newBuilder[String]

    // dns_add_host (dns.c:160-166): host field gets the unicode form,
    // dns.puny gets the RAW name ascii-lowered when it contains "xn--"
    def addHost(raw: String,
        set: scala.collection.mutable.HashSet[String] = st.hostSet,
        out: scala.collection.mutable.Builder[String, Seq[String]] = names)
        : Unit = {
      val host = idnHost(raw.toLowerCase)
      out += host
      set += host
      if (raw.contains("xn--")) puny += raw.toLowerCase
    }
    def findHost(set: scala.collection.mutable.HashSet[String],
        raw: String): Boolean = set.contains(idnHost(raw.toLowerCase))

    val bsb = new Bsb(data, 12, len - 12)

    /* QD section (dns.c:248-281) */
    var i = 0
    var qdBreak = false
    while (!qdBreak && !bsb.error && i < qdCount) {
      val nm = dnsNameC(data, len, bsb)
      if (bsb.error || nm == null) qdBreak = true
      else {
        val display =
          if (nm.length == 0) "<root>"
          else new String(nm, StandardCharsets.ISO_8859_1)
        val qtype = bsb.u16()
        val qclass = bsb.u16()
        if (opcode != 5) { // UPDATE zone records contribute nothing
          if (qclass <= 255)
            Option(AppProtocols.dnsClassName(qclass)).foreach(classes += _)
          if (qtype <= 255)
            Option(AppProtocols.dnsTypeName(qtype)).foreach(types += _)
          // namelen is 6 after the <root> substitution, so always added
          addHost(display)
        }
        i += 1
      }
    }

    /* opcode records even when the QD walk broke early (dns.c:282) */
    val opcodeName = AppProtocols.dnsOpcodeName(opcode)

    if (!qr && opcode != 5)
      return Some(mk(names, types, Nil, opcodeName, classes, ip, mxHosts,
        nsHosts, nsIp, mxIp, puny))

    val status =
      if (qr) Seq(AppProtocols.dnsRcodeName(data(3) & 0xf)) else Seq.empty

    /* Record sections: answer, authority, additional — each section's
     * loop breaks independently (dns.c:300-438). */
    val counts = Array(anCount, nsCount, arCount)
    var rt = 0
    while (rt < 3) {
      var r = 0
      var secBreak = false
      while (!secBreak && !bsb.error && r < counts(rt)) {
        val owner = dnsNameC(data, len, bsb)
        if (bsb.error || owner == null) secBreak = true
        else {
          val ownerStr = new String(owner, StandardCharsets.ISO_8859_1)
          val antype = bsb.u16()
          val anclass = bsb.u16()
          bsb.skip(4) // ttl
          val rdlength = bsb.u16()
          if (bsb.remaining < rdlength) secBreak = true
          else if (anclass != 1 /* CLASS_IN */ ) {
            bsb.skip(rdlength); r += 1
          } else {
            var skipRdata = true // `continue` paths in the C skip the skip
            antype match {
              case 1 => // RR_A
                if (rdlength == 4) {
                  val p = bsb.ptr
                  val a = s"${data(p) & 0xff}.${data(p + 1) & 0xff}." +
                    s"${data(p + 2) & 0xff}.${data(p + 3) & 0xff}"
                  if (opcode == 5) { ip += a; addHost(ownerStr) }
                  else {
                    if (findHost(st.hostSet, ownerStr)) ip += a
                    if (findHost(st.nsSet, ownerStr)) nsIp += a
                    if (findHost(st.mxSet, ownerStr)) mxIp += a
                  }
                }
              case 2 => // RR_NS
                val rdbsb = new Bsb(data, bsb.ptr, rdlength)
                val h = dnsNameC(data, len, rdbsb)
                if (h == null || h.length == 0 || rdbsb.error)
                  skipRdata = false
                else addHost(new String(h, StandardCharsets.ISO_8859_1),
                  set = st.nsSet, out = nsHosts)
              case 5 => // RR_CNAME
                val rdbsb = new Bsb(data, bsb.ptr, rdlength)
                val h = dnsNameC(data, len, rdbsb)
                if (h == null || h.length == 0 || rdbsb.error)
                  skipRdata = false
                else addHost(new String(h, StandardCharsets.ISO_8859_1))
              case 15 => // RR_MX: 2-byte preference then exchange name
                val rdbsb = new Bsb(data, bsb.ptr, rdlength)
                rdbsb.skip(2)
                val h = dnsNameC(data, len, rdbsb)
                if (h == null || h.length == 0 || rdbsb.error)
                  skipRdata = false
                else addHost(new String(h, StandardCharsets.ISO_8859_1),
                  set = st.mxSet, out = mxHosts)
              case 28 => // RR_AAAA
                if (rdlength == 16) {
                  val a = graft.functions.IpUtil.expanded(
                    java.util.Arrays.copyOfRange(data, bsb.ptr,
                      bsb.ptr + 16))
                  if (opcode == 5) { ip += a; addHost(ownerStr) }
                  else {
                    if (findHost(st.hostSet, ownerStr)) ip += a
                    if (findHost(st.nsSet, ownerStr)) nsIp += a
                    if (findHost(st.mxSet, ownerStr)) mxIp += a
                  }
                }
              case _ => // unknown type: nothing recorded, rdata skipped
            }
            if (skipRdata) bsb.skip(rdlength)
            r += 1
          }
        }
      }
      rt += 1
    }
    Some(mk(names, types, status, opcodeName, classes, ip, mxHosts,
      nsHosts, nsIp, mxIp, puny))
  }

  private def mk(names: scala.collection.mutable.Builder[String, Seq[String]],
      types: scala.collection.mutable.Builder[String, Seq[String]],
      status: Seq[String], opcodeName: String,
      classes: scala.collection.mutable.Builder[String, Seq[String]],
      ip: scala.collection.mutable.Builder[String, Seq[String]],
      mxHosts: scala.collection.mutable.Builder[String, Seq[String]],
      nsHosts: scala.collection.mutable.Builder[String, Seq[String]],
      nsIp: scala.collection.mutable.Builder[String, Seq[String]],
      mxIp: scala.collection.mutable.Builder[String, Seq[String]],
      puny: scala.collection.mutable.Builder[String, Seq[String]]): DnsInfo =
    DnsInfo(names.result(), types.result(), status,
      opcode = Seq(opcodeName), qclass = classes.result(),
      ip = ip.result().distinct,
      mailserverHost = mxHosts.result().distinct,
      nameserverHost = nsHosts.result().distinct,
      nameserverIp = nsIp.result().distinct,
      mailserverIp = mxIp.result().distinct,
      puny = puny.result().distinct)
}
