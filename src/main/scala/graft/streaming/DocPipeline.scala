package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Streaming twin of the document-curation path: continuously ingested
  * documents (a crawl feed) are fingerprinted, exact-deduped, scored and
  * language-tagged as they arrive — the same per-document kernels the
  * batch operators use (d1/t1/t2/t3), composed as one incremental plan.
  *
  * Scale design: every enrichment is map-side (fused kernels, codegen
  * built-ins — no shuffle); the only stateful operator is the dedup,
  * whose state is bounded by the watermark horizon
  * (`dropDuplicatesWithinWatermark`), never O(stream length). At 100 TB/
  * day the dedup key is the 32-char md5 — ~50 bytes of state per unique
  * document inside the horizon; cross-horizon (historical) dedup runs as
  * the batch d1/d2 over the accumulated store, exactly like the batch
  * pipeline.
  */
object DocPipeline {

  /** Enrich a (streaming or batch) documents frame map-side: content
    * fingerprint, language guess, token count, and the two cheap quality
    * signals used for threshold filtering. Pure projection — usable
    * identically in `readStream` and `read` plans.
    */
  def enrich(docs: DataFrame, text: Column): DataFrame = {
    val toks = TextOps.tokens(text)
    docs
      .withColumn("fingerprint", md5(text))
      .withColumn("lang_guess", TextOps.langGuessFused(text))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_token_len",
        when(size(toks) > 0,
          aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
            size(toks)).otherwise(lit(0.0)))
      .withColumn("alpha_ratio",
        when(length(text) > 0,
          (length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
            length(text))).otherwise(lit(0.0)))
  }

  /** The live ingest plan: watermark → enrich → (optional) canonical-URL
    * dedup → exact content dedup within the horizon → minimum-quality
    * gate → (optional) full Gopher gate. Append-mode compatible (no
    * aggregation — each dedup emits a surviving row once).
    *
    * `urlCol` adds a SECOND watermark-bounded dedup keyed by
    * [[TextOps.urlNormalize]] — a re-crawl of the same page under a
    * cosmetically different URL is dropped even when its content changed
    * (the crawl-frontier contract); content dedup then catches mirrors
    * under different URLs. Two chained `dropDuplicatesWithinWatermark`
    * operators = OR-dedup semantics, each with watermark-bounded state.
    * `gopher = true` applies the full T16 gate with the batch
    * expressions ([[TextOps.gopherFlags]]), flags kept on the row.
    */
  def ingest(
      stream: DataFrame, text: Column, tsCol: String,
      watermarkDelay: String, minTokens: Long = 5,
      urlCol: Option[Column] = None,
      gopher: Boolean = false): DataFrame = {
    val base = enrich(stream.withWatermark(tsCol, watermarkDelay), text)
    val urlDeduped = urlCol match {
      case Some(u) =>
        base.withColumn("url_canon", TextOps.urlNormalize(u))
          .dropDuplicatesWithinWatermark("url_canon")
      case None => base
    }
    val deduped = urlDeduped.dropDuplicatesWithinWatermark("fingerprint")
      .filter(col("n_tokens") >= minTokens)
    if (gopher)
      deduped.withColumn("gopher", TextOps.gopherFlags(text))
        .filter(col("gopher.kept") === 1L)
    else deduped
  }
}
