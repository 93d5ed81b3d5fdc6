package tmpprobe

import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[8]", 16).getOrCreate()
    val d = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val spans = graft.ops.Dedup.sharedSpans(d, col("text"), col("doc_id"),
      shingleK = 5, minSpan = 8)
    spans.explain("formatted")
    spark.stop()
  }
}
