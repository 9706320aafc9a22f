package graft.util

import org.apache.spark.sql.{Dataset, SparkSession}

/** Registry for persisted intermediates created inside query builders.
  *
  * A QDef that persists a mid-plan DataFrame cannot unpersist it before
  * returning (the caller has not materialized the result yet), so the
  * cache entry would outlive the query — in a long-lived session
  * (PgServer, a notebook) repeated query builds accumulate cache entries
  * until LRU eviction thrashes. Builders therefore register every
  * persist here via [[track]], and consumers release after fully
  * consuming each query's result.
  *
  * Entries are scoped by owning [[SparkSession]] so concurrent consumers
  * (e.g. PgServer's one-session-per-connection model) can release their
  * own intermediates without unpersisting another session's in-flight
  * plan. Batch consumers (Verify, Bench, specs) call [[releaseAll]];
  * per-connection consumers call [[release]] with their session after
  * each statement completes.
  */
object Persist {
  private val tracked = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  /** Register an already-persisted dataset for later release. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    tracked
      .computeIfAbsent(
        ds.sparkSession,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]())
      .add(ds)
    ds
  }

  /** Persist + register in one call. */
  def persistTracked[T](ds: Dataset[T]): Dataset[T] = track(ds.persist())

  /** Unpersist everything tracked by `session` (non-blocking) and drop
    * its registry entry. Safe when nothing is tracked. */
  def release(session: SparkSession): Unit = {
    val q = tracked.remove(session)
    if (q != null) drain(q)
  }

  /** Unpersist every tracked dataset across all sessions and clear the
    * registry. For single-session batch consumers. */
  def releaseAll(): Unit = {
    val it = tracked.keySet().iterator()
    while (it.hasNext) {
      val q = tracked.remove(it.next())
      if (q != null) drain(q)
    }
  }

  private def drain(
      q: java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]): Unit = {
    var ds = q.poll()
    while (ds != null) {
      try ds.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      ds = q.poll()
    }
  }

  /** Number of currently tracked (unreleased) datasets — for specs. */
  def trackedCount: Int = {
    var n = 0
    val it = tracked.values().iterator()
    while (it.hasNext) n += it.next().size()
    n
  }

  /** `df.persistTracked()` syntax for query builders. */
  implicit class Syntax[T](private val ds: Dataset[T]) extends AnyVal {
    def persistTracked(): Dataset[T] = Persist.persistTracked(ds)
  }
}
