package graft.ops

import org.apache.spark.sql.DataFrame

/** Release hooks for helper frames an operator persists into the plan it
  * returns (prefix-sum inputs scanned twice, plan-decision counts): the
  * operator can't unpersist before returning — the lazy plan still reads
  * the cache — and the caller doesn't know the cache exists. The hook
  * releases it after the FIRST execution that consumed it, bounding
  * cache growth across repeated calls in one long-lived session (a
  * second action on the same result recomputes the helper once).
  */
object CacheHooks {

  /** Unpersist `frame` once any query that read it completes: a
    * QueryExecutionListener matches the cached plan inside the finished
    * execution (cache substitution puts an `InMemoryRelation` in the
    * optimized plan whose builder carries the original logical plan),
    * unpersists, and deregisters itself.
    *
    * Two hazards of the naive listener are closed here:
    *
    *  - '''stale build-time events''': listener events ride an async bus,
    *    so an execution that finished BEFORE registration (the operator's
    *    own build-time collect over the same cache) can still be
    *    delivered after it and would release the cache before the
    *    caller's action. `QueryExecution.id` is allocated monotonically
    *    at construction, so a fresh zero-row plan's id taken at
    *    registration upper-bounds every execution already constructed —
    *    events with `qe.id` at or below that threshold are ignored.
    *    (Two CONCURRENT calls whose helper plans are `sameResult` still
    *    share one CacheManager entry and the first finisher releases it
    *    for both — the loser recomputes; perf-only, accepted.)
    *
    *  - '''abandoned plans''': if the returned plan is never executed
    *    (consumed via .rdd, written through a non-SQL path, dropped),
    *    the listener would otherwise stay registered forever, walking
    *    the optimized plan of every later query. After `maxUnmatched`
    *    completed executions with no match, the hook gives up:
    *    unpersists (a later action on the abandoned plan just
    *    recomputes the helper) and deregisters.
    */
  def unpersistAfterFirstUse(frame: DataFrame, maxUnmatched: Int = 64): Unit = {
    val spark = frame.sparkSession
    val target = frame.queryExecution.analyzed
    // ids are allocated at QueryExecution CONSTRUCTION, monotonically:
    // anything already running (or finished but still on the bus) was
    // constructed earlier and carries a smaller id
    val threshold = spark.range(0).queryExecution.id
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private val unmatched = new java.util.concurrent.atomic.AtomicInteger(0)
      private def release(): Unit =
        if (done.compareAndSet(false, true)) {
          frame.unpersist(blocking = false)
          spark.listenerManager.unregister(this)
        }
      private def check(
          qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
        if (qe.id <= threshold) return // predates registration — not ours
        val hit =
          try qe.optimizedPlan.exists {
            case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
              r.cacheBuilder.logicalPlan.sameResult(target)
            case _ => false
          } catch { case _: Exception => false }
        if (hit) release()
        else if (unmatched.incrementAndGet() >= maxUnmatched) release()
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = check(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = check(qe)
    }
    spark.listenerManager.register(listener)
  }
}
