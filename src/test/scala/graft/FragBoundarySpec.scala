package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pcap
import graft.etl.Pcap.RawPacket

/** Chunk-boundary IPv4 fragment repair ([[Pcap.assembleFrags4Chunked]]):
  * a group that starts in one chunk and completes in the next must
  * assemble exactly once — in the owning chunk via the overlap read —
  * and produce the same row the whole-file walk emits.
  */
class FragBoundarySpec extends AnyFunSuite {

  /** Hand-built Ethernet+IPv4 frame. `fragOff` in bytes (8-aligned). */
  private def frame(ipId: Int, fragOff: Int, mf: Boolean, proto: Int,
      payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(14 + 20 + payload.length)
    b.put(Array.fill[Byte](6)(0x02)).put(Array.fill[Byte](6)(0x04))
    b.putShort(0x0800.toShort)
    b.put(0x45.toByte).put(0.toByte)
    b.putShort((20 + payload.length).toShort)
    b.putShort(ipId.toShort)
    b.putShort((((if (mf) 0x2000 else 0) | (fragOff / 8)) & 0xffff).toShort)
    b.put(64.toByte).put(proto.toByte).putShort(0.toShort)
    b.putInt(0x0a000001).putInt(0x0a000002)
    b.put(payload)
    b.array()
  }

  private def pkt(idx: Int, data: Array[Byte]): RawPacket =
    RawPacket("f", idx, 1700000000000000L + idx * 1000L, data.length,
      data.length, idx.toLong * 2000, 1, data,
      1700000000000000L + math.max(0, idx - 1) * 1000L)

  // a 2-fragment UDP datagram: 16 payload bytes + 8 more
  private val fragA0 = pkt(1, frame(0x1234, 0, mf = true, 17,
    Array.tabulate[Byte](16)(_.toByte)))
  private val fragA1 = pkt(2, frame(0x1234, 16, mf = false, 17,
    Array.tabulate[Byte](8)(i => (100 + i).toByte)))
  private val plain0 = pkt(0, frame(0x9999, 0, mf = false, 17,
    Array.fill[Byte](4)(0x7f)))
  private val plain1 = pkt(3, frame(0x9998, 0, mf = false, 17,
    Array.fill[Byte](4)(0x11)))

  private def ids(ps: Seq[RawPacket]) = ps.map(_.index)

  test("whole-stream baseline assembles the group at the completing packet") {
    val out = Pcap.assembleFrags4(
      Iterator(plain0, fragA0, fragA1, plain1)).toSeq
    assert(ids(out) == Seq(0, 2, 3))
    val asm = out.find(_.index == 2).get
    assert(asm.data.length == 14 + 20 + 24) // both payloads, one header
    assert((asm.data(14 + 6) & 0x3f) == 0 && asm.data(14 + 7) == 0,
      "frag bits cleared")
  }

  test("two chunks with a boundary inside the group equal the whole walk") {
    // chunk 1 owns the group (saw offset-0) and finishes it from overlap
    val c1 = Pcap.assembleFrags4Chunked(
      Iterator(plain0, fragA0), () => Iterator(fragA1, plain1)).toSeq
    // chunk 2 sees the tail fragment, never its start: drops it
    val c2 = Pcap.assembleFrags4Chunked(
      Iterator(fragA1, plain1), () => Iterator.empty).toSeq
    val whole = Pcap.assembleFrags4(
      Iterator(plain0, fragA0, fragA1, plain1)).toSeq
    val stitched = (c1 ++ c2).sortBy(_.index)
    assert(ids(stitched) == ids(whole))
    stitched.zip(whole).foreach { case (a, b) =>
      assert(a.index == b.index && a.data.toSeq == b.data.toSeq)
    }
  }

  test("no pending owned groups: the overlap is never read") {
    var pulled = false
    // tail-only fragment (unowned) and a plain packet
    val out = Pcap.assembleFrags4Chunked(
      Iterator(plain0, fragA1),
      () => { pulled = true; Iterator.empty }).toSeq
    assert(ids(out) == Seq(0))
    assert(!pulled, "unowned pending groups must not trigger the overlap read")
  }

  test("genuine duplicate-offset fragment stalls the group (reference parity)") {
    // packet.c inserts the duplicate and its contiguity walk then always
    // breaks on it (fip_off != off, packet.c:540): the group never
    // reassembles. Two copies of the middle fragment, different bytes
    // (fragment-overwrite evasion) — nothing may come out.
    val mid = pkt(2, frame(0x4242, 16, mf = true, 17,
      Array.fill[Byte](8)(0x22)))
    val midEvil = pkt(3, frame(0x4242, 16, mf = true, 17,
      Array.fill[Byte](8)(0x66)))
    val head = pkt(1, frame(0x4242, 0, mf = true, 17,
      Array.tabulate[Byte](16)(_.toByte)))
    val fin = pkt(4, frame(0x4242, 24, mf = false, 17,
      Array.fill[Byte](8)(0x33)))
    val out = Pcap.assembleFrags4(
      Iterator(plain0, head, mid, midEvil, fin, plain1)).toSeq
    assert(ids(out) == Seq(0, 3))
  }

  test("ipId-reuse stale replay loses to the live group (epoch split)") {
    // A stale tail fragment (replayed from a previous chunk's overlap
    // window, its group's offset-0 never seen here) collides with a
    // fresh group reusing the ipId: the live group's bytes must win,
    // because in the whole-file walk the stale group completed earlier
    // and was evicted — no collision would exist at all.
    val stale = pkt(1, frame(0x7777, 16, mf = true, 17,
      Array.fill[Byte](8)(0x0f)))
    val newHead = pkt(2, frame(0x7777, 0, mf = true, 17,
      Array.tabulate[Byte](16)(_.toByte)))
    val newMid = pkt(3, frame(0x7777, 16, mf = true, 17,
      Array.fill[Byte](8)(0x55)))
    val newFin = pkt(4, frame(0x7777, 24, mf = false, 17,
      Array.fill[Byte](8)(0x66)))
    val out = Pcap.assembleFrags4(
      Iterator(stale, newHead, newMid, newFin)).toSeq
    assert(ids(out) == Seq(4))
    val asm = out.head
    // payload bytes 16..23 are the live group's 0x55, not the stale 0x0f
    assert((16 until 24).forall(i => asm.data(14 + 20 + i) == 0x55.toByte))
  }

  test("out-of-order early fragments still assemble once offset-0 arrives") {
    // legitimate reorder: tail fragments before the head — epoch 0 frags
    // must be usable by the epoch-1 group they belong to
    val out = Pcap.assembleFrags4(
      Iterator(fragA1, fragA0, plain1)).toSeq
    assert(ids(out) == Seq(1, 3)) // completes at fragA0's arrival (index 1)
    assert(out.head.data.length == 14 + 20 + 24)
  }

  test("overlap consumption stops at completion and skips foreign packets") {
    var served = 0
    val lazyOverlap = () => new Iterator[RawPacket] {
      private val inner = Iterator(plain1, fragA1,
        pkt(9, frame(0x5555, 0, mf = true, 17, Array.fill[Byte](8)(1))))
      def hasNext = inner.hasNext
      def next() = { served += 1; inner.next() }
    }
    val out = Pcap.assembleFrags4Chunked(
      Iterator(fragA0), lazyOverlap).toSeq
    // only the assembled group comes out — overlap's plain packet and the
    // NEW group's offset-0 fragment belong to the next chunk
    assert(ids(out) == Seq(2))
    assert(served == 2, s"must stop pulling once pending drains (saw $served)")
  }
}
