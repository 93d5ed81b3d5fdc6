package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpecBase, Tables}

/** Pins the `spread` parallelism gate (the VERDICT-r15 ask): it must be
  * a NO-OP when the input already plans at least the session's
  * parallelism — the cluster-scale case, where a production scan
  * carries orders of magnitude more partitions than cores — and fan a
  * narrower input out deterministically by the key's hash.
  */
class MaterializeSpreadSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val docs = Tables.load(spark, sf, "documents").cache()

  test("spread is identity when planned parallelism covers the cores") {
    val cores = spark.sparkContext.defaultParallelism
    val wide = docs.select(col("doc_id")).repartition(cores * 4)
    // identity: the exact same plan object comes back, no extra exchange
    assert(TextOps.spread(wide, col("doc_id")) eq wide)
  }

  test("spread fans a narrow input out by the key's hash") {
    val narrow = docs.select(col("doc_id")).coalesce(1)
    val out = TextOps.spread(narrow, col("doc_id"))
    assert(out ne narrow)
    // the fan-out is requested as a deterministic hash repartition
    // (AQE may coalesce the realized count on tiny frames — the
    // request, not the realized number, is the contract)
    val plan = out.queryExecution.analyzed.toString
    assert(plan.contains("RepartitionByExpression"), plan)
  }

  test("spread output rows are the input rows (hash partition, no loss)") {
    val narrow = docs.select(col("doc_id"), col("text")).coalesce(1)
    val out = TextOps.spread(narrow, col("doc_id"))
    assert(out.count() === narrow.count())
    assert(out.exceptAll(narrow).isEmpty && narrow.exceptAll(out).isEmpty)
  }
}
