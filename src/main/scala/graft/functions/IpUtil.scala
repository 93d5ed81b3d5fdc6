package graft.functions

/** Pure IPv4/IPv6 helpers used by the expression compiler and the pcap ETL.
  *
  * Mirrors the reference's ES `ip`-type semantics: values are canonical
  * strings, CIDR terms match by prefix, v4 addresses sort/compare as
  * v4-mapped-v6 (reference: capture/packet.c:213-223, capture/db.c:695-701).
  */
object IpUtil {

  /** Parse an IPv4/IPv6 string to its 16-byte (v4-mapped) form, or null.
    *
    * Literal-only: a hand-rolled v4 parser plus a strict character guard
    * before the v6 parse, so a hostname ('example.com') can never reach
    * InetAddress.getByName's blocking DNS fallback — user query values
    * flow here via parseCidr.
    */
  def toBytes(ip: String): Array[Byte] = {
    if (ip == null || ip.isEmpty || ip.length > 45) return null
    if (ip.indexOf(':') >= 0) {
      // v6 literal: hex digits, ':', optional dotted-quad tail. A hostname
      // cannot contain ':', so getByName treats this as a literal.
      var i = 0
      while (i < ip.length) {
        val c = ip.charAt(i)
        val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F') || c == ':' || c == '.'
        if (!ok) return null
        i += 1
      }
      try {
        val addr = java.net.InetAddress.getByName(ip).getAddress
        if (addr.length == 16) addr else v4Mapped(addr)
      } catch { case _: Exception => null }
    } else if (ip.forall(c => c >= '0' && c <= '9')) {
      // bare number — inet_addr semantics (32-bit value), used by shorthand;
      // ASCII digits only (Scala isDigit accepts Unicode digit classes)
      try {
        val v = ip.toLong
        if (v > 0xffffffffL) null
        else v4Mapped(Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte))
      } catch { case _: Exception => null }
    } else {
      // dotted-quad v4 literal, each octet 0-255; leading-zero octets are
      // rejected rather than read as decimal (inet_addr would read them as
      // octal — refusing beats silently diverging)
      val parts = ip.split('.')
      if (parts.length != 4) return null
      val out = new Array[Byte](4)
      var i = 0
      while (i < 4) {
        val p = parts(i)
        if (p.isEmpty || p.length > 3 ||
          !p.forall(c => c >= '0' && c <= '9') ||
          (p.length > 1 && p.charAt(0) == '0')) return null
        val v = p.toInt
        if (v > 255) return null
        out(i) = v.toByte
        i += 1
      }
      v4Mapped(out)
    }
  }

  private def v4Mapped(addr: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    out(10) = -1; out(11) = -1
    System.arraycopy(addr, 0, out, 12, 4)
    out
  }

  /** Canonical string form: dotted quad for v4, lowercase compressed v6. */
  def canonical(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val full = if (bytes.length == 4) {
      val out = new Array[Byte](16); out(10) = -1; out(11) = -1
      System.arraycopy(bytes, 0, out, 12, 4); out
    } else bytes
    if (isV4Mapped(full))
      return s"${full(12) & 0xff}.${full(13) & 0xff}.${full(14) & 0xff}.${full(15) & 0xff}"
    // inet_ntop-style v6: compress the leftmost longest run of >=2 zero
    // groups with "::" (the reference renders every v6 through
    // inet_ntop — Java's getHostAddress never compresses)
    val w = (0 until 8).map(i =>
      ((full(i * 2) & 0xff) << 8) | (full(i * 2 + 1) & 0xff))
    var bestBase = -1; var bestLen = 0
    var base = -1; var len = 0
    for (i <- 0 until 8) {
      if (w(i) == 0) {
        if (base < 0) { base = i; len = 1 } else len += 1
        if (len > bestLen) { bestBase = base; bestLen = len }
      } else { base = -1; len = 0 }
    }
    if (bestLen < 2) bestBase = -1
    val sb = new StringBuilder
    var i = 0
    while (i < 8) {
      if (i == bestBase) {
        sb.append("::")
        i += bestLen
      } else {
        if (sb.nonEmpty && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(Integer.toHexString(w(i)))
        i += 1
      }
    }
    if (sb.isEmpty) "::" else sb.toString
  }

  def isV4Mapped(b: Array[Byte]): Boolean =
    b.length == 16 && (0 until 10).forall(b(_) == 0) && b(10) == -1 && b(11) == -1

  /** Fully-expanded lowercase v6 (8 × 4 hex digits) — the form the
    * reference emits for DNS answer addresses; v4 stays dotted-quad.
    */
  def expanded(bytes: Array[Byte]): String =
    if (bytes == null) null
    else if (bytes.length == 4 || isV4Mapped(bytes)) canonical(bytes)
    else (0 until 8).map(i =>
      f"${((bytes(i * 2) & 0xff) << 8) | (bytes(i * 2 + 1) & 0xff)}%04x")
      .mkString(":")

  /** A parsed CIDR: 16-byte base + prefix length in the 128-bit space. */
  final case class Cidr(base: Array[Byte], prefixLen: Int) {
    def contains(ipBytes: Array[Byte]): Boolean = {
      if (ipBytes == null) return false
      val fullBytes = prefixLen / 8
      var i = 0
      while (i < fullBytes) {
        if (base(i) != ipBytes(i)) return false
        i += 1
      }
      val remBits = prefixLen % 8
      if (remBits == 0) true
      else {
        val mask = (0xff << (8 - remBits)) & 0xff
        (base(fullBytes) & mask) == (ipBytes(fullBytes) & mask)
      }
    }
  }

  /** Parse "a.b.c.d", "a.b.c.d/nn", "1::2", "1::2/64" into a Cidr.
    * v4 prefixes are shifted into the v4-mapped-v6 space (+96).
    */
  def parseCidr(s: String): Option[Cidr] = {
    val slash = s.indexOf('/')
    val (ipStr, prefixStr) =
      if (slash >= 0) (s.substring(0, slash), s.substring(slash + 1)) else (s, "")
    val bytes = toBytes(ipStr)
    if (bytes == null) return None
    val isV4 = !ipStr.contains(':')
    val prefix =
      if (prefixStr.isEmpty) 128
      else {
        val p = try prefixStr.toInt catch { case _: Exception => return None }
        if (isV4) p + 96 else p
      }
    if (prefix < 0 || prefix > 128) None else Some(Cidr(bytes, prefix))
  }

  /** Expand the reference's shorthand IP syntax to a full CIDR string:
    * `10` → `10.0.0.0/8`, `10.10` → `10.10.0.0/16`, `10.10.10` →
    * `10.10.10.0/24` (reference: viewer/molochparser.jison:254-283).
    * Returns the normalized "ip[/prefix]" string.
    */
  def expandShorthand(ipStr: String): String = {
    if (ipStr.contains(':')) return ipStr // v6: no shorthand
    val slash = ipStr.split('/')
    val dots = slash(0).split('.').filter(_.nonEmpty)
    val (full, defPrefix) = dots.length match {
      case 4 => (dots.mkString("."), 32)
      case 3 => (dots.mkString(".") + ".0", 24)
      case 2 => (dots.mkString(".") + ".0.0", 16)
      case 1 => (dots(0) + ".0.0.0", 8)
      case _ => return ipStr
    }
    val prefix = if (slash.length > 1) slash(1) else defPrefix.toString
    if (prefix == "32") full else s"$full/$prefix"
  }
}
