package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder

/** Tunnel decap: IPv6 → IPIP → IPv4 → GRE → PPP → UDP/DNS keyed on the
  * inner flow, with tunnel protocol tags and VLAN id (golden:
  * 6-4-gre-ppp-udp-4-dns.test).
  */
class TunnelGoldenSpec extends AnyFunSuite with SparkSpecBase {

  test("gre-ppp tunnel sessionizes on the inner 5-tuple") {
    val got = SessionBuilder.sessionizeRef(spark,
      "/root/reference/tests/pcap/6-4-gre-ppp-udp-4-dns.pcap").collect()
    assert(got.length == 1)
    val g = got.head
    assert(g.srcIp == "172.16.44.3" && g.srcPort == 40768)
    assert(g.dstIp == "8.8.8.8" && g.dstPort == 53)
    assert(g.ipProtocol == 17)
    assert(g.protocol == Seq("dns", "gre", "ppp", "udp"))
    assert(g.vlanId == Seq(100))
    assert(g.dnsQname == Seq("xqt-detect-mode2-97712e88-167a-45b9-93ee-913140e76678"))
    assert(g.dnsQtype == Seq("AAAA"))
    assert(g.dnsRcode == Seq("NXDOMAIN"))
    assert(g.communityId == "1:fZG4C8AY/jKS+Bf2SgfW9xMzRTg=")
    assert(g.totPackets == 2)
  }
}
