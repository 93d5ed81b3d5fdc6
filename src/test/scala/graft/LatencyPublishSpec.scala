package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.LatencyPublish — the latency quiet-line publication rules —
  * against the RECORDED r14 driver pass list (bench_full.json of the r14
  * run). r14's defect: `latQuietOf("heap")` gated only on the bracket
  * (idx < 1.15), so a 12.98 s bracket-straddling stall at idx 1.147
  * published as stream_p50_ms_quiet while four of six passes clustered
  * at p50 3.0-3.6 s — and then served as rocksCredible's 2x reference,
  * making that gate trivially true. The rule now requires BOTH a bracket
  * (in-proc < 1.15; forked < 1.30 — the measured +0.1 structural bias of
  * a child kernel run beside the parent JVM) AND p50 <= 1.5x the run's
  * best same-backend pass.
  */
class LatencyPublishSpec extends AnyFunSuite {
  import Bench.LatencyPublish._

  // The six passes of the r14 driver run, verbatim from its
  // bench_full.json stream_latency array (idx 1.147 is the stall's
  // unrounded bracket — it passed the old < 1.15 gate).
  private val r14 = Seq(
    Pass(3028.5, 1.18, "heap", forked = false),
    Pass(12978.1, 1.147, "heap", forked = false),
    Pass(14566.0, 1.44, "heap", forked = true),
    Pass(3150.7, 1.20, "rocksdb", forked = true),
    Pass(3095.2, 1.26, "heap", forked = true),
    Pass(3571.7, 1.24, "heap", forked = true))

  test("r14 pass list: the 12.98 s bracket-straddling stall is rejected") {
    val q = heapQuiet(r14)
    assert(q.isDefined)
    assert(q.get.p50 != 12978.1,
      "the r14 stall must fail the 1.5x-of-best credibility gate")
    // The credible quiet pass is the 3095.2 ms fork: quiet bracket under
    // the forked allowance AND within 1.5x of the run's best (3028.5).
    assert(q.get.p50 == 3095.2)
  }

  test("r14 pass list: rocksdb gates against the CREDIBLE heap reference") {
    val r = rocksQuiet(r14)
    assert(r.isDefined && r.get.p50 == 3150.7)
    // and the reference it was checked against is 3095.2, not 12978.1:
    // a 7 s rocksdb pass would now fail (7000 > 2 * 3095.2) where the
    // r14 gate would have passed it (7000 <= 2 * 12978.1).
    val withSlowRocks = r14.filterNot(_.backend == "rocksdb") :+
      Pass(7000.0, 1.20, "rocksdb", forked = true)
    assert(rocksQuiet(withSlowRocks).isEmpty)
  }

  test("in-process passes keep the strict < 1.15 bracket") {
    // 3028.5 @ 1.18 in-proc must NOT publish as quiet even though it is
    // the run's fastest pass — its own bracket read loaded.
    val only = Seq(Pass(3028.5, 1.18, "heap", forked = false))
    assert(heapQuiet(only).isEmpty)
  }

  test("r12 sessionize failure mode: lone quiet-bracketed stall -> None") {
    // The shape credibleQuiet() was built for: the only pass with a
    // quiet bracket is 3.7x the run's best. Publish nothing.
    val ps = Seq(
      Pass(3000.0, 1.30, "heap", forked = false),
      Pass(11050.0, 1.11, "heap", forked = false))
    assert(heapQuiet(ps).isEmpty)
  }

  test("rocksdb is self-credible when no heap pass ever ran quiet") {
    val ps = Seq(
      Pass(3200.0, 1.25, "rocksdb", forked = true),
      Pass(9900.0, 1.20, "rocksdb", forked = true))
    assert(rocksQuiet(ps).map(_.p50).contains(3200.0))
  }

  test("a single credible forked heap pass publishes under the relaxed bracket") {
    val ps = Seq(Pass(2970.0, 1.27, "heap", forked = true))
    assert(heapQuiet(ps).map(_.p50).contains(2970.0))
  }
}
