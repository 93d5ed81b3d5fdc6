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
    // The reference emits community id only for TCP/UDP/SCTP sessions and
    // skips SESSION_ICMP / SESSION_OTHER (capture/db.c:812) — emitting an
    // id with zeroed ports there would not correlate with other tools.
    if (proto != 6 && proto != 17 && proto != 132) return null
    val sRaw = IpUtil.toBytes(srcIp)
    val dRaw = IpUtil.toBytes(dstIp)
    if (sRaw == null || dRaw == null) return null
    // v4 addresses hash as 4 bytes, v6 as 16
    def packed(b: Array[Byte]): Array[Byte] =
      if (IpUtil.isV4Mapped(b)) java.util.Arrays.copyOfRange(b, 12, 16) else b
    val s = packed(sRaw); val d = packed(dRaw)
    val flip = cmpBytes(s, d) > 0 || (cmpBytes(s, d) == 0 && srcPort > dstPort)
    val (ipA, ipB, pA, pB) =
      if (flip) (d, s, dstPort, srcPort) else (s, d, srcPort, dstPort)
    val buf = ByteBuffer.allocate(2 + ipA.length + ipB.length + 2 + 4)
    buf.putShort(seed.toShort)
    buf.put(ipA).put(ipB)
    buf.put(proto.toByte).put(0.toByte)
    buf.putShort(pA.toShort); buf.putShort(pB.toShort)
    val sha = MessageDigest.getInstance("SHA-1").digest(buf.array())
    "1:" + Base64.getEncoder.encodeToString(sha)
  }
}
