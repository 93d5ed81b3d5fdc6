package graft.ops

/** E43: `GET /api/reversedns?ip=` (reference: viewer/apiMisc.js:176-190
  * — `dns.reverse`, hostnames comma-joined, any failure answers the
  * literal `reverse error`). Exposed to the UI through the
  * `reverseDNS` value action (apiMisc.js:157).
  *
  * The lookup itself is a network call, so the resolver is injectable:
  * the default issues a PTR query for the RFC-standard reverse name
  * (v4 `d.c.b.a.in-addr.arpa`, v6 nibble-reversed `…ip6.arpa`) through
  * JNDI's DNS provider — JDK-only, no added dependency. Bulk
  * enrichment at corpus scale is NOT this endpoint's job: that path is
  * the WISE lookup machinery (I13, `ops/Wise`), which batches and
  * caches per partition; this is the interactive single-value action.
  */
object ReverseDns {

  type Resolver = String => Seq[String]

  /** The PTR query name for an IP, or None for an unparseable one:
    * `1.2.3.4` → `4.3.2.1.in-addr.arpa`; v6 expands to 32 reversed
    * nibbles under `ip6.arpa` (RFC 1035 §3.5, RFC 3596 §2.5).
    */
  private val V4 = "(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})".r

  def ptrName(ip: String): Option[String] = {
    // strict literal parse before InetAddress: a lookalike hostname
    // ("ad.be", "1.2.3.4.5") must never reach getByName, which would
    // itself issue the forward DNS query this endpoint must not make.
    // v4 = exactly four in-range octets; v6 = contains ':' (hostnames
    // cannot), hex/colon/dot chars only
    val literal = ip match {
      case V4(a, b, c, d) =>
        Seq(a, b, c, d).forall(o => o.toInt <= 255 &&
          (o.length == 1 || !o.startsWith("0")))
      case _ => ip.contains(':') && ip.forall(ch => ch.isDigit ||
        ch == ':' || ch == '.' || ('a' <= ch.toLower && ch.toLower <= 'f'))
    }
    if (!literal) return None
    val addr =
      try Some(java.net.InetAddress.getByName(ip))
      catch { case _: Exception => None }
    addr.map { a =>
      val b = a.getAddress
      if (b.length == 4)
        b.reverse.map(x => (x & 0xff).toString).mkString(".") + ".in-addr.arpa"
      else
        b.reverse.flatMap(x =>
          Seq((x & 0xf).toHexString, ((x >> 4) & 0xf).toHexString))
          .mkString(".") + ".ip6.arpa"
    }
  }

  /** JNDI DNS PTR lookup — the JDK's built-in resolver path. */
  val SystemResolver: Resolver = ip => {
    val name = ptrName(ip).getOrElse(
      throw new IllegalArgumentException(s"bad ip $ip"))
    val env = new java.util.Hashtable[String, String]()
    env.put("java.naming.factory.initial",
      "com.sun.jndi.dns.DnsContextFactory")
    val ctx = new javax.naming.directory.InitialDirContext(env)
    try {
      val attrs = ctx.getAttributes(name, Array("PTR"))
      val ptr = attrs.get("PTR")
      if (ptr == null) Nil
      else (0 until ptr.size).map(i =>
        ptr.get(i).toString.stripSuffix("."))
    } finally ctx.close()
  }

  /** The endpoint's response body: hostnames joined `", "`, or the
    * reference's literal `reverse error` on any failure / no answer.
    */
  def lookup(ip: String, resolver: Resolver = SystemResolver): String =
    try {
      val names = resolver(ip)
      if (names.isEmpty) "reverse error" else names.mkString(", ")
    } catch { case _: Exception => "reverse error" }
}
