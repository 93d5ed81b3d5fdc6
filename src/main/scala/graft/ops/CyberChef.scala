package graft.ops

import org.apache.spark.sql.Dataset

import graft.etl.{Decode, Hex, SessionBuilder}
import graft.etl.SessionBuilder.SessionRow

/** E40: the CyberChef handoff — `GET /cyberchef/:node/session/:id?type=`
  * (reference: viewer/viewer.js:2039-2049 routing, viewer/apiMisc.js:
  * 262-284 handler). The viewer feeds the CyberChef UI one direction of
  * a session's reassembled payload as a hex string: it decodes up to
  * 10 000 packets (`processSessionIdAndDecode(id, 10000)`), walks the
  * alternating src/dst data chunks, and concatenates every other
  * chunk's hex starting at 0 (src) or 1 (dst) into `{ "data": "…" }`.
  *
  * Spark-first shape: this is an INTERACTIVE single-session fetch, not
  * a scan — the packet list comes from the stored session row's
  * `packetPos` references and the bytes are read with the same seek-only
  * blob I/O as [[Hunt.run]], on the calling thread, no job launched.
  * Concatenating one direction's chunks in capture order is exactly
  * that direction's reassembled stream, so the hex is produced from
  * [[SessionBuilder.reassemble]] (same dedup/ordering the parsers see).
  */
object CyberChef {

  /** The reference handler's 10 000-packet decode cap (apiMisc.js:271). */
  val MaxPackets = 10000

  /** Read one session's decoded packets from the pcap store via its
    * stored `packetPos` references — seek-only blob I/O on the calling
    * thread, capped at [[MaxPackets]]. Shared by the interactive
    * single-session endpoints (this one, [[BodyHash]]).
    */
  private[ops] def readSessionPackets(segs: Seq[SessionRow],
      keys: String => graft.etl.PcapCrypto.FileKeys,
      store: graft.etl.PcapStore.Store,
      maxPackets: Int = MaxPackets): IndexedSeq[Decode.DecodedPacket] = {
    val open = PcapChannels.newOpenMap()
    try {
      segs.iterator.flatMap { s =>
        s.packetPos.indices.iterator.flatMap { i =>
          s.fileId.lift(s.packetFileIdx(i)).toSeq.flatMap { f =>
            PcapChannels.channelOf(open, f, keys, store).toSeq.flatMap { ch =>
              PcapChannels.readPacket(ch, f, s.packetPos(i), s.packetLen(i))
                .toSeq.flatMap(Decode.decode(_))
            }
          }
        }
      }.take(maxPackets).toIndexedSeq
    } finally PcapChannels.closeAll(open)
  }

  /** One direction's session payload, hex-encoded — the `data` field of
    * the endpoint's response. `dataType` mirrors the query param: any
    * value but "dst" selects src (apiMisc.js:278). Rows of `sessions`
    * whose sessionId matches are all used (a long session's segments
    * share the id; the cap still bounds the read).
    */
  def sessionData(sessions: Dataset[SessionRow], sessionId: String,
      dataType: String = "src",
      keys: String => graft.etl.PcapCrypto.FileKeys = _ => graft.etl.PcapCrypto.Normal,
      store: graft.etl.PcapStore.Store = graft.etl.PcapStore.Local): String = {
    val segs = sessions.filter(_.sessionId == sessionId)
      .collect().sortBy(_.segmentSeq)
    if (segs.isEmpty) return ""
    val wantDst = dataType == "dst"
    val s0 = segs.head
    val packets = readSessionPackets(segs.toIndexedSeq, keys, store)
    def dirOf(p: Decode.DecodedPacket): Int =
      if (p.srcIp == s0.srcIp && p.srcPort == s0.srcPort) 0 else 1
    val side = packets.filter(p => dirOf(p) == (if (wantDst) 1 else 0))
    Hex.hex(SessionBuilder.reassemble(side))
  }

  /** The endpoint's full response body: `{"data":"<hex>"}`. */
  def sessionJson(sessions: Dataset[SessionRow], sessionId: String,
      dataType: String = "src",
      keys: String => graft.etl.PcapCrypto.FileKeys = _ => graft.etl.PcapCrypto.Normal,
      store: graft.etl.PcapStore.Store = graft.etl.PcapStore.Local): String =
    s"""{"data":"${sessionData(sessions, sessionId, dataType, keys, store)}"}"""
}
