package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.Base64

/** Community ID flow hash v1 (public spec, github.com/corelight/community-id-spec;
  * the reference emits it as `network.community_id` — capture/moloch.h:358).
  *
  * v1: "1:" + base64(sha1(seed₁₆ ∥ ipA ∥ ipB ∥ proto₈ ∥ 0₈ ∥ portA₁₆ ∥ portB₁₆))
  * with (ipA, portA) the lexicographically smaller endpoint. Emitted only
  * for TCP/UDP/SCTP sessions — the reference skips SESSION_ICMP and
  * SESSION_OTHER (capture/db.c:812).
  */
object CommunityId {

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  def compute(srcIp: String, dstIp: String, srcPort: Int, dstPort: Int,
      proto: Int, seed: Int = 0): String = {
    // The reference emits community id for TCP/UDP/SCTP/ESP sessions and
    // skips SESSION_ICMP / SESSION_OTHER (capture/db.c:812) — emitting an
    // id with zeroed ports there would not correlate with other tools.
    if (proto != 6 && proto != 17 && proto != 132 && proto != 50) return null
    // ESP sessions are keyed portless — the id hashes zero ports
    // (esp.c:38-42 passes 0); other portless sessions get no id
    val (sPort, dPort) =
      if (proto == 50) (0, 0)
      else if (srcPort < 0 || dstPort < 0) return null
      else (srcPort, dstPort)
    val sRaw = IpUtil.toBytes(srcIp)
    val dRaw = IpUtil.toBytes(dstIp)
    if (sRaw == null || dRaw == null) return null
    // v4 addresses hash as 4 bytes, v6 as 16
    def packed(b: Array[Byte]): Array[Byte] =
      if (IpUtil.isV4Mapped(b)) java.util.Arrays.copyOfRange(b, 12, 16) else b
    val s = packed(sRaw); val d = packed(dRaw)
    // Reference quirk (db.c:367-402 + tcp.c:383-385): when the two ips
    // are EQUAL, the flip test compares the session's first-packet
    // client/server ports against the sessionId's sorted slots, and the
    // two inversions cancel — the hashed port order is the first-packet
    // (src, dst) order, NOT sorted as the community-id spec says.
    // Loopback goldens (wireshark-dtls0 etc.) pin this.
    val flip = cmpBytes(s, d) > 0
    val (ipA, ipB, pA, pB) =
      if (flip) (d, s, dPort, sPort) else (s, d, sPort, dPort)
    val buf = ByteBuffer.allocate(2 + ipA.length + ipB.length + 2 + 4)
    buf.putShort(seed.toShort)
    buf.put(ipA).put(ipB)
    buf.put(proto.toByte).put(0.toByte)
    buf.putShort(pA.toShort); buf.putShort(pB.toShort)
    val sha = MessageDigest.getInstance("SHA-1").digest(buf.array())
    "1:" + Base64.getEncoder.encodeToString(sha)
  }
}
