package graft.ops

import org.apache.spark.sql.Dataset

import graft.etl.{Decode, HttpParser, SessionBuilder}
import graft.etl.SessionBuilder.SessionRow

/** E41: `GET /api/sessions/bodyhash/:hash` — retrieve a transferred
  * file by its content hash (reference: viewer/apiSessions.js:2878-2944
  * getBodyHash → localGetItemByHash:754-800 → decode.js ITEM-HASH:
  * 766-773). The reference runs the caller's session query, takes the
  * single NEWEST matching session (`sort lastPacket desc, size 1`),
  * decodes its HTTP bodies, and returns the body whose MD5 **or**
  * SHA-256 hex equals the requested hash, named per decode.js (content
  * header filename / request-URI tail, `.pellet` suffix added by the
  * HTTP layer).
  *
  * Spark-first shape: `sessions` is the already-filtered query result
  * (built by [[graft.query.SessionQueryBuilder]], as every endpoint
  * here); picking the newest row is a tiny driver-side top-1, and the
  * packet fetch is the same interactive seek-only blob read as
  * [[CyberChef]] — no job, no scan. Coverage note: the reference also
  * pipes SMTP parts (ITEM-SMTP + BODY-UNBASE64) into the same hash
  * gate; this implementation serves the dominant HTTP-transfer case —
  * the SMTP attachment digests themselves are extracted at sessionize
  * (`emailMd5`/`emailSha256`).
  */
object BodyHash {

  /** The newest matching session's body with the given md5/sha256 hex,
    * as (bodyName, bytes) — None = the reference's 'No Match'.
    */
  def find(sessions: Dataset[SessionRow], hash: String,
      keys: String => graft.etl.PcapCrypto.FileKeys = _ => graft.etl.PcapCrypto.Normal,
      store: graft.etl.PcapStore.Store = graft.etl.PcapStore.Local): Option[(String, Array[Byte])] = {
    val want = hash.toLowerCase
    // newest matching session: top-1 ON THE CLUSTER (the reference's
    // `size 1, sort lastPacket desc`) — a broad query result is never
    // collected whole to the driver. The frame is persisted across the
    // two passes (top-1, then that session's segments) so the expensive
    // query predicate scans the store ONCE, not twice per hash lookup.
    val pinned = sessions.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segs = try {
      val newest = pinned.orderBy(org.apache.spark.sql.functions
        .col("lastPacket").desc).limit(1).collect()
      if (newest.isEmpty) return None
      val newestId = newest.head.sessionId
      pinned.filter(_.sessionId == newestId).collect().sortBy(_.segmentSeq)
    } finally pinned.unpersist(blocking = false)
    val s0 = segs.head
    val packets = CyberChef.readSessionPackets(segs.toIndexedSeq, keys, store)
    def side(d: Int): IndexedSeq[Decode.DecodedPacket] = packets.filter(p =>
      (if (p.srcIp == s0.srcIp && p.srcPort == s0.srcPort) 0 else 1) == d)
    val rawClient = SessionBuilder.reassemble(side(0))
    val rawServer = SessionBuilder.reassemble(side(1))
    // peel a SOCKS tunnel exactly as sessionize did before computing the
    // stored digests, so every stored httpMd5/httpSha256 resolves here —
    // the reference viewer's decode pipeline does NOT peel and returns
    // 'No Match' for tunneled transfers, a gap this shape closes
    val (client, server) =
      graft.etl.AppProtocols.peelSocks(rawClient, rawServer)
        .map { case (is, id, _) => (is, id) }
        .orElse(graft.etl.AppProtocols
          .peelSocks(rawServer, rawClient, allowSocks4 = false)
          .map { case (ic, isv, _) => (ic, isv) })
        .getOrElse((rawClient, rawServer))
    HttpParser.namedBodies(client, server).collectFirst {
      case (name, body) if {
        val (m, s) = HttpParser.bodyDigests(body)
        m == want || s == want
      } => (name, body)
    }
  }
}
