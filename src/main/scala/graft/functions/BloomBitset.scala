package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed Bloom-filter bitset built as a typed Aggregator.
  *
  * Each partition folds its hash positions into a local `m`-bit array
  * (map-side partial), partials are OR-merged in the final aggregate —
  * one `m/8`-byte row out, no shuffle of the element stream beyond the
  * single-group aggregation. This is the same build shape Spark's own
  * `DataFrameStatFunctions.bloomFilter` uses; it is re-implemented here
  * so the hash positions are the engine-portable md5-prefix ones
  * (`TextOps.hex32`) that a SQL oracle can reproduce bit-for-bit.
  *
  * Scale: the result is `m/8` bytes regardless of input rows — 32 KiB at
  * the default 2^18 bits, still a single broadcastable blob at the 2^33
  * bits (1 GiB) a 100 TB corpus would size to (n·k ≈ ln2·m for ~1% FP).
  * Past that, shard the filter by a prefix of the element hash and probe
  * the matching shard only.
  */
object BloomBitset {

  final class BitsetAgg(nBytes: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](nBytes)
    def reduce(b: Array[Byte], pos: Long): Array[Byte] = {
      b((pos >> 3).toInt) = (b((pos >> 3).toInt) | (1 << (pos & 7).toInt)).toByte
      b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < nBytes) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: ExpressionEncoder[Array[Byte]] =
      ExpressionEncoder[Array[Byte]]()
    def outputEncoder: ExpressionEncoder[Array[Byte]] =
      ExpressionEncoder[Array[Byte]]()
  }

  /** `build(mBits)(posCol)` → one binary column: the OR of all set bits. */
  def build(mBits: Int): Column => Column = {
    val f = udaf(new BitsetAgg(mBits / 8), ExpressionEncoder[Long]())
    pos => f(pos)
  }

  /** True iff every position in `ps` is set in `bits`. */
  val allSet: (Column, Column) => Column = {
    val f = org.apache.spark.sql.functions.udf {
      (bits: Array[Byte], ps: Seq[Long]) =>
        ps.forall(p => (bits((p >> 3).toInt) & (1 << (p & 7).toInt)) != 0)
    }
    (bits, ps) => f(bits, ps)
  }
}
