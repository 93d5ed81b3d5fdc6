package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Linearity guard for the heaviest text kernels: a 10× documents
  * corpus must not cost more than ~15× (superlinear blowups — an
  * accidental cross join, an uncapped candidate expansion — show up as
  * 50–100× here long before the sf0.1 bench would catch them).
  *
  * Replica doc_ids are `orig*10 + r + 1_000_000` (r = 1..9): unique,
  * and never ≡ 0 (mod 100), so t22_bm25's `doc_id % 100 == 0` query
  * set stays EXACTLY the base corpus's — scaling documents without
  * scaling queries, the shape a real corpus growth has. Timing is
  * min-of-2 after a warmup pass, the same steady-state policy as
  * graft.Bench.
  */
class ScaleProbeSpec extends AnyFunSuite with SparkSpecBase {

  // t*: heaviest text kernels; d2/m5: the near-dup candidate kernels,
  // where the replicated corpus is the adversarial case — every doc
  // gains 9 exact-content twins, so LSH buckets grow 10× and only the
  // star-expansion edge shape keeps candidates O(bucket) instead of
  // O(bucket²) (a pairwise regression would read ~100× here)
  // t23: the Kneser-Ney scorer pins the r13 checkpointed-occurrence-
  // table plan (the materialization must scale with the corpus, not
  // change the kernel's linearity)
  // t22/s10: the two heaviest timed queries — posting-shuffle-bound, so
  // this pins that 10× docs costs ~10× (a posting-side blowup — an
  // uncapped query-term fanout, a lost broadcast — reads 50×+ here);
  // s10 also exercises the dense brute-force side over the replicated
  // embeddings table (queries × corpus, fixed query set → linear)
  private val probes = Seq("t18_skipgram", "t21_wordpiece", "t22_bm25",
    "t23_kn_score", "s10_hybrid_rrf", "d2_dedup_minhash", "m5_image_dhash")

  private def writeCorpus(mult: Int): String = {
    val dir = Files.createTempDirectory("graft-scale").toString
    def replicate(df: org.apache.spark.sql.DataFrame, idCol: String) =
      if (mult <= 1) df
      else (0 until mult).map { r =>
        if (r == 0) df
        else df.withColumn(idCol,
          col(idCol) * 10 + lit(r) + lit(1000000L))
      }.reduce(_ unionAll _)
    val base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    replicate(base, "doc_id").coalesce(8)
      .write.parquet(dir + "/documents.parquet")
    // the embeddings table scales with the same id scheme (replica ids
    // never ≡ 0 mod 100, so s10's vec_id%100 query set stays fixed)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    replicate(emb, "vec_id").coalesce(8)
      .write.parquet(dir + "/embeddings.parquet")
    dir
  }

  test("heaviest kernels grow ~linearly on a 10x corpus") {
    val small = writeCorpus(1)
    val big = writeCorpus(10)
    val ratios = probes.map { name =>
      val fn = SparkEntry.queries(name)
      def time(dir: String): Double = {
        fn(spark, dir).count() // warmup: codegen + exchange init
        (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val s = time(small)
      val b = time(big)
      info(f"$name%-14s small=$s%.2fs big=$b%.2fs ratio=${b / s}%.1fx")
      name -> b / s
    }
    ratios.foreach { case (name, r) =>
      assert(r < 15.0, s"$name grew ${r}x on a 10x corpus — superlinear")
    }
  }

  test("packing, budget-select and exact-substring grow ~linearly on a 10x corpus") {
    // the distributed-prefix-sum ops (t8 packing, p9 token budget) and
    // the posting-capped exact-substring spans (d12): the 100×-scale
    // claim for these rested on the static plan census; this measures
    // the curve. Same min-of-2 / warmup policy as above.
    val small = writeCorpus(1)
    val big = writeCorpus(10)
    val ratios = Seq("t8_seq_pack", "p9_token_budget", "d12_exact_substring")
      .map { name =>
        val fn = SparkEntry.queries(name)
        def time(dir: String): Double = {
          fn(spark, dir).count()
          (0 until 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, dir).count()
            (System.nanoTime() - t0) / 1e9
          }.min
        }
        val s = time(small)
        val b = time(big)
        info(f"$name%-20s small=$s%.2fs big=$b%.2fs ratio=${b / s}%.1fx")
        name -> b / s
      }
    ratios.foreach { case (name, r) =>
      assert(r < 15.0, s"$name grew ${r}x on a 10x corpus — superlinear")
    }
  }

  test("resolveGroups: 10x corpus grows ~linearly with a flat round count") {
    // d6/d11/d18/d20 all ride the alternating-star connected-components
    // loop; its scale axis is the ROUND count (O(log component
    // diameter)), which no other probe pinned. The replica corpus is
    // the adversarial case for components: every base doc gains 9
    // exact twins, so every near-dup component inflates 10x in MEMBERS
    // while its diameter stays shallow (star candidates) — rounds must
    // stay flat, not grow with member count, or 100 TB components
    // would pay unbounded sequential shuffles.
    import graft.ops.Dedup
    val small = writeCorpus(1)
    val big = writeCorpus(10)
    def run(dir: String): (Double, Int) = {
      def pairs = Dedup.minhashCandidates(
        spark.read.parquet(dir + "/documents.parquet"),
        col("text"), col("doc_id"))
      Dedup.resolveGroups(pairs).count() // warmup
      val best = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        Dedup.resolveGroups(pairs).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (best, Dedup.lastResolveRounds)
    }
    val (sSec, sRounds) = run(small)
    val (bSec, bRounds) = run(big)
    info(f"resolveGroups small=$sSec%.2fs/$sRounds rounds " +
      f"big=$bSec%.2fs/$bRounds rounds ratio=${bSec / sSec}%.1fx")
    assert(bSec / sSec < 15.0,
      s"resolveGroups grew ${bSec / sSec}x on a 10x corpus — superlinear")
    assert(bRounds <= sRounds + 1,
      s"round count grew $sRounds -> $bRounds on a 10x corpus: convergence " +
        "is scaling with component MEMBERS, not diameter")
    assert(bRounds <= 6, s"round count $bRounds: shallow components " +
      "should close in a handful of rounds")
  }

  test("incremental MinHash candidates scale with the BATCH, not the index") {
    // d19's continuous-ingestion shape: candidates for a new batch against
    // a bucketed band index must cost ~the batch (index side is
    // shuffle-free). Measured two ways: (a) 10× batch vs fixed index ≈
    // linear; (b) same batch vs a 10× index must NOT cost 10× — the
    // index join is bucket-pruned co-located, so the growth is the scan
    // of matching buckets, bounded here by the duplicate structure.
    import graft.ops.Dedup
    val base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def replicate(df: org.apache.spark.sql.DataFrame, mult: Int) =
      if (mult <= 1) df
      else (0 until mult).map { r =>
        if (r == 0) df
        else df.withColumn("doc_id", col("doc_id") * 10 + lit(r) + lit(1000000L))
      }.reduce(_ unionAll _)
    def batchOf(df: org.apache.spark.sql.DataFrame, mult: Int) =
      replicate(df, mult).withColumn("doc_id", col("doc_id") + lit(50000000L))
    // the 10× index adds NOISE documents (distinct pseudo-text → distinct
    // band buckets): the candidate OUTPUT stays that of the 1× index, so
    // any time growth is pure index-side scan/shuffle cost — exactly the
    // thing the bucketed-index design promises to bound
    val noise = (1 until 10).map { r =>
      base.select(
        (col("doc_id") * 10 + lit(r) + lit(1000000L)).as("doc_id"),
        expr("concat_ws(' ', transform(sequence(1, 25), " +
          s"k -> substr(md5(concat(doc_id, '_$r', '_', k)), 1, 8)))")
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
    Dedup.writeBandIndex(base, col("text"), col("doc_id"), "scale_idx_1x")
    Dedup.writeBandIndex(base.unionByName(noise), col("text"),
      col("doc_id"), "scale_idx_10x")
    def time(batchMult: Int, table: String): Double = {
      def q = Dedup.incrementalCandidates(batchOf(base, batchMult),
        col("text"), col("doc_id"), table)
      q.count() // warmup
      (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        q.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val s = time(1, "scale_idx_1x")
    val bigBatch = time(10, "scale_idx_1x")
    val bigIndex = time(1, "scale_idx_10x")
    info(f"incremental: base=$s%.2fs 10x-batch=${bigBatch}%.2fs " +
      f"(${bigBatch / s}%.1fx) 10x-index=${bigIndex}%.2fs (${bigIndex / s}%.1fx)")
    assert(bigBatch / s < 15.0,
      s"10x batch cost ${bigBatch / s}x — batch side is superlinear")
    assert(bigIndex / s < 8.0,
      s"10x index cost ${bigIndex / s}x on the SAME batch — the index " +
        "side is being rescanned/shuffled instead of bucket-joined")
    spark.sql("DROP TABLE IF EXISTS scale_idx_1x")
    spark.sql("DROP TABLE IF EXISTS scale_idx_10x")
  }

  test("embeddingNearDup hot block grows ~linearly under the cap guard") {
    // one giant block of DISTINCT vectors — the adversarial case the
    // maxBlockExact guard exists for: all-pairs would be 100x here;
    // the count-scaled band buckets keep candidates ~linear
    import graft.ops.Dedup
    def frame(n: Int) = spark.range(n)
      .select(col("id").as("vec_id"), expr(
        "transform(sequence(1,16), k -> " +
          "cast(pmod(hash(id, k), 1000) as double)/1000 - 0.5)")
        .as("embedding"))
      .withColumn("block", lit("hot"))
    def time(n: Int): Double = {
      def q = Dedup.embeddingNearDup(frame(n), col("embedding"),
        col("vec_id"), col("block"), threshold = 0.95,
        maxBlockExact = 500)
      q.count() // warmup
      (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        q.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val s = time(2000)
    val b = time(20000)
    info(f"hot-block neardup small=$s%.2fs big=$b%.2fs ratio=${b / s}%.1fx")
    assert(b / s < 15.0,
      s"hot block grew ${b / s}x on 10x rows — the cap guard is not linear")
  }

  test("embeddingNearDup plan decision costs exactly one count-agg job") {
    // the guarded branch must reuse the persisted per-block counts frame
    // for both the plan-time max AND the sizes join — a regression back
    // to two identical aggregates shows up as an extra Spark job here
    import graft.ops.Dedup
    def frame(n: Int) = spark.range(n)
      .select(col("id").as("vec_id"), expr(
        "transform(sequence(1,8), k -> " +
          "cast(pmod(hash(id, k), 1000) as double)/1000 - 0.5)")
        .as("embedding"))
      .withColumn("block", lit("hot"))
    // job-group ids from the status tracker: synchronous, no listener
    // race — every job the plan decision submits lands in the group
    def jobsFor(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    // Both paths must spend exactly the same plan-time work: ONE counts
    // aggregate + its 1-row max collect (AQE splits that into several
    // jobs, so the assertion is relative, not an absolute count). A
    // regression back to a second full aggregate in the guarded branch
    // shows up as guarded > exact.
    val exact = jobsFor("d5-exact") {
      Dedup.embeddingNearDup(frame(100), col("embedding"),
        col("vec_id"), col("block"), threshold = 0.95, maxBlockExact = 500)
    }
    val guarded = jobsFor("d5-guarded") {
      Dedup.embeddingNearDup(frame(800), col("embedding"),
        col("vec_id"), col("block"), threshold = 0.95, maxBlockExact = 500)
    }
    info(s"plan-decision jobs: exact=$exact guarded=$guarded")
    // +1: the banded branch alone runs the limit-1 vector-dimension
    // probe. A duplicated counts agg would add its whole AQE job chain
    // (≈ the exact path's full count again), far past this bound.
    assert(guarded <= exact + 1,
      s"guarded plan decision ran $guarded jobs vs $exact on the exact " +
        "path — the per-block counts agg is being computed twice")
  }

  test("embeddingNearDup guarded branch releases its cached counts after first use") {
    // the hot-block branch persists the per-block counts frame for the
    // plan decision + sizes join; the listener hook must unpersist it
    // once the returned plan executes, so repeated calls in one session
    // don't accumulate cached frames
    import graft.ops.Dedup
    def frame(n: Int) = spark.range(n)
      .select(col("id").as("vec_id"), expr(
        "transform(sequence(1,8), k -> " +
          "cast(pmod(hash(id, k), 1000) as double)/1000 - 0.5)")
        .as("embedding"))
      .withColumn("block", lit("hot"))
    def cachedRdds: Int = spark.sparkContext.getPersistentRDDs.size
    val before = cachedRdds
    val q = Dedup.embeddingNearDup(frame(800), col("embedding"),
      col("vec_id"), col("block"), threshold = 0.95, maxBlockExact = 500)
    q.count() // consume: the listener fires on the async listener bus
    val deadline = System.currentTimeMillis + 30000
    while (cachedRdds > before && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    assert(cachedRdds <= before,
      s"counts frame still cached ($cachedRdds RDDs vs $before before) " +
        "30s after the guarded plan was consumed")
  }

  test("pack prefix-sum inputs stay cached through build, release after first use") {
    // prefixSum runs two EAGER actions at plan-build time (min/max head,
    // bucket-totals collect); the release hook must register after them
    // — firing on the head() would force the per-row pass to recompute
    // the tokenized input, the exact cost the persist exists to avoid
    import graft.ops.Pack
    def cachedRdds: Int = spark.sparkContext.getPersistentRDDs.size
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      pmod(hash(col("id")), lit(1000)).as("score"),
      (pmod(hash(col("id"), lit(7)), lit(200)) + 1).as("n_tokens"))
    val before = cachedRdds
    val q = Pack.tokenBudgetSelect(docs, col("doc_id"), col("score"),
      col("n_tokens"), budget = 50000)
    assert(cachedRdds > before,
      "keyed frame must still be cached after the build-time actions")
    val n = q.count()
    assert(n > 0)
    val deadline = System.currentTimeMillis + 30000
    while (cachedRdds > before && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    assert(cachedRdds <= before,
      "keyed frame still cached 30s after the result was consumed")
  }
}
