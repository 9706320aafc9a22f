package graft.util

import org.apache.spark.sql.Dataset

/** Registry for persisted intermediates created inside query builders.
  *
  * A QDef that persists a mid-plan DataFrame cannot unpersist it before
  * returning (the caller has not materialized the result yet), so the
  * cache entry would outlive the query — in a long-lived session
  * (PgServer, a notebook) repeated query builds accumulate cache entries
  * until LRU eviction thrashes. Builders therefore register every
  * persist here via [[track]], and BATCH consumers (Verify, Bench,
  * specs) call [[releaseAll]] after fully consuming each query's result.
  *
  * Single-consumer discipline: releaseAll unpersists everything tracked
  * so far, so callers that interleave query materializations must not
  * release while another tracked plan is still in flight.
  */
object Persist {
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Register an already-persisted dataset for later release. */
  def track[T](ds: Dataset[T]): Dataset[T] = { tracked.add(ds); ds }

  /** Persist + register in one call. */
  def persistTracked[T](ds: Dataset[T]): Dataset[T] = track(ds.persist())

  /** Unpersist every tracked dataset (non-blocking) and clear the
    * registry. Safe to call when nothing is tracked. */
  def releaseAll(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      try ds.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      ds = tracked.poll()
    }
  }

  /** Number of currently tracked (unreleased) datasets — for specs. */
  def trackedCount: Int = tracked.size()

  /** `df.persistTracked()` syntax for query builders. */
  implicit class Syntax[T](private val ds: Dataset[T]) extends AnyVal {
    def persistTracked(): Dataset[T] = Persist.persistTracked(ds)
  }
}
