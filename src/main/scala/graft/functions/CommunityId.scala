package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.Base64

/** Community ID flow hash v1 (public spec, github.com/corelight/community-id-spec;
  * the reference emits it as `network.community_id` — capture/moloch.h:358).
  *
  * v1: "1:" + base64(sha1(seed₁₆ ∥ ipA ∥ ipB ∥ proto₈ ∥ 0₈ ∥ portA₁₆ ∥ portB₁₆))
  * with (ipA, portA) the lexicographically smaller endpoint; ports only for
  * TCP/UDP/SCTP/ICMP.
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
    val sRaw = IpUtil.toBytes(srcIp)
    val dRaw = IpUtil.toBytes(dstIp)
    if (sRaw == null || dRaw == null) return null
    // v4 addresses hash as 4 bytes, v6 as 16
    def packed(b: Array[Byte]): Array[Byte] =
      if (IpUtil.isV4Mapped(b)) java.util.Arrays.copyOfRange(b, 12, 16) else b
    val s = packed(sRaw); val d = packed(dRaw)
    val hasPorts = proto == 6 || proto == 17 || proto == 132 || proto == 1 || proto == 58
    val flip = cmpBytes(s, d) > 0 || (cmpBytes(s, d) == 0 && srcPort > dstPort)
    val (ipA, ipB, pA, pB) =
      if (flip) (d, s, dstPort, srcPort) else (s, d, srcPort, dstPort)
    val buf = ByteBuffer.allocate(2 + ipA.length + ipB.length + 2 + (if (hasPorts) 4 else 0))
    buf.putShort(seed.toShort)
    buf.put(ipA).put(ipB)
    buf.put(proto.toByte).put(0.toByte)
    if (hasPorts) { buf.putShort(pA.toShort); buf.putShort(pB.toShort) }
    val sha = MessageDigest.getInstance("SHA-1").digest(buf.array())
    "1:" + Base64.getEncoder.encodeToString(sha)
  }
}
