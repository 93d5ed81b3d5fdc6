package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.SessionBuilder.SessionRow
import graft.ops.Enrich

/** Streaming sinks for session rows — the reference's bulk-indexing path
  * (capture/db.c:472-1100: per-thread buffers, flush ≤ dbFlushTimeout 5 s)
  * as Structured Streaming micro-batches.
  *
  *   - parquet sink: day-partitioned append (same layout as
  *     etl.SessionStore, readable mid-stream);
  *   - ES-bulk sink: foreachBatch serializing to the nested ES document
  *     shape as ndjson files — swap the writer lambda for an HTTP _bulk
  *     client against a live cluster; the 5-second trigger mirrors the
  *     reference's dbFlushTimeout.
  */
object SessionSink {

  def toParquet(sessions: Dataset[SessionRow], path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    sessions.toDF()
      .withColumn("day",
        date_format(timestamp_millis(col("firstPacket")), "yyyy-MM-dd"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("day")
      .trigger(trigger)
      .outputMode("append")
      .start()

  /** ES-bulk-shaped ndjson via foreachBatch (file-based stand-in for the
    * `_bulk` HTTP sink; the batch boundary is the flush unit).
    */
  def toEsBulk(sessions: Dataset[SessionRow], path: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    sessions.toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Enrich.toEsDocs(batch)
          .write.mode("append").text(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .outputMode("append")
      .start()
}
