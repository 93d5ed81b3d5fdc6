package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-heap per-group top-k as a typed Aggregator.
  *
  * The scale-safe replacement for `row_number().over(Window.partitionBy
  * (group))` + `filter(rk <= k)`: a window ships EVERY scored row of a
  * group to one task and sorts it; this aggregator keeps at most k rows
  * per group per partition (partial, map-side), then merges the k-bounded
  * buffers on the final aggregate — same rows out, no single-partition
  * gather, no full sort. (The reference's viewer gets the equivalent from
  * ES terms-agg `size`; this is the Spark-native analogue.)
  *
  * Ordering: score descending, id ascending tie-break — deterministic and
  * identical to `orderBy(score.desc, id.asc)`.
  */
object TopK {

  final case class Scored[I](score: Double, id: I)

  final class TopKAgg[I: TypeTag](k: Int)(implicit ord: Ordering[I])
      extends Aggregator[Scored[I], List[Scored[I]], Seq[Scored[I]]] {

    // true when a ranks strictly before b
    private def before(a: Scored[I], b: Scored[I]): Boolean =
      a.score > b.score || (a.score == b.score && ord.lt(a.id, b.id))

    // buffer invariant: sorted by rank, length <= k
    private def insert(buf: List[Scored[I]], x: Scored[I]): List[Scored[I]] = {
      if (buf.lengthCompare(k) >= 0 && !before(x, buf.last)) buf
      else {
        val (pre, post) = buf.span(before(_, x))
        (pre ::: x :: post).take(k)
      }
    }

    def zero: List[Scored[I]] = Nil
    def reduce(buf: List[Scored[I]], x: Scored[I]): List[Scored[I]] =
      insert(buf, x)
    def merge(a: List[Scored[I]], b: List[Scored[I]]): List[Scored[I]] =
      b.foldLeft(a)(insert)
    def finish(buf: List[Scored[I]]): Seq[Scored[I]] = buf
    def bufferEncoder: ExpressionEncoder[List[Scored[I]]] =
      ExpressionEncoder[List[Scored[I]]]()
    def outputEncoder: ExpressionEncoder[Seq[Scored[I]]] =
      ExpressionEncoder[Seq[Scored[I]]]()
  }

  /** `topK(k)(score, id)` → array<struct<score,id>> of the group's top k,
    * rank order. Long ids (numeric keys).
    */
  def longIds(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAgg[Long](k), ExpressionEncoder[Scored[Long]]())
    (score, id) => f(score, id)
  }

  /** String-id variant (term values). */
  def stringIds(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAgg[String](k), ExpressionEncoder[Scored[String]]())
    (score, id) => f(score, id)
  }
}
