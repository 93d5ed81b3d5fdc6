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
    * unpersists, and deregisters itself. If the returned plan is never
    * executed the one frame stays cached — the same footprint as
    * persisting without a hook.
    */
  def unpersistAfterFirstUse(frame: DataFrame): Unit = {
    val spark = frame.sparkSession
    val target = frame.queryExecution.analyzed
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def check(
          qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
        val hit =
          try qe.optimizedPlan.exists {
            case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
              r.cacheBuilder.logicalPlan.sameResult(target)
            case _ => false
          } catch { case _: Exception => false }
        if (hit && done.compareAndSet(false, true)) {
          frame.unpersist(blocking = false)
          spark.listenerManager.unregister(this)
        }
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
