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
  private val trackedRdds = new java.util.concurrent.ConcurrentHashMap[
    SparkSession,
    java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]]()

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

  /** Eager `localCheckpoint(true)` + register the checkpoint-backed RDD
    * for release. A bare localCheckpoint's blocks are reclaimed only
    * when the GC-driven ContextCleaner notices the dropped reference —
    * too slow for long-lived sessions (PgServer connections, the
    * 236-query bench passes), where query-level checkpoint frames pile
    * up as pinned storage the LRU cannot evict. Tracking the backing
    * RDD (the flat LogicalRDD leaf) lets [[release]]/[[releaseAll]]
    * free the blocks as soon as the query's action completes — the same
    * discipline persistTracked gives cache entries. Loop-INTERNAL
    * generations (Components) stay self-managed: they free each
    * superseded generation mid-query, earlier than any registry could. */
  def checkpointTracked[T](ds: Dataset[T]): Dataset[T] = {
    val ck = ds.localCheckpoint(true)
    ck.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(trackRdd(ck.sparkSession, _))
    ck
  }

  /** Register a checkpoint-backed RDD (e.g. an iterative operator's
    * FINAL surviving generation) for release with the session's other
    * query-local state. */
  def trackRdd(session: SparkSession, rdd: org.apache.spark.rdd.RDD[_]): Unit =
    trackedRdds
      .computeIfAbsent(
        session,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[
          org.apache.spark.rdd.RDD[_]]())
      .add(rdd)

  /** Unpersist everything tracked by `session` (non-blocking) and drop
    * its registry entry. Safe when nothing is tracked. */
  def release(session: SparkSession): Unit = {
    val q = tracked.remove(session)
    if (q != null) drain(q)
    val r = trackedRdds.remove(session)
    if (r != null) drainRdds(r)
  }

  /** Unpersist every tracked dataset across all sessions and clear the
    * registry. For single-session batch consumers. */
  def releaseAll(): Unit = {
    val it = tracked.keySet().iterator()
    while (it.hasNext) {
      val q = tracked.remove(it.next())
      if (q != null) drain(q)
    }
    val rit = trackedRdds.keySet().iterator()
    while (rit.hasNext) {
      val r = trackedRdds.remove(rit.next())
      if (r != null) drainRdds(r)
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

  private def drainRdds(q: java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.rdd.RDD[_]]): Unit = {
    var rdd = q.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      rdd = q.poll()
    }
  }

  /** Number of currently tracked (unreleased) datasets — for specs. */
  def trackedCount: Int = {
    var n = 0
    val it = tracked.values().iterator()
    while (it.hasNext) n += it.next().size()
    n
  }

  /** Number of currently tracked (unreleased) checkpoint RDDs — for
    * specs. */
  def trackedCheckpointCount: Int = {
    var n = 0
    val it = trackedRdds.values().iterator()
    while (it.hasNext) n += it.next().size()
    n
  }

  /** `df.persistTracked()` / `df.checkpointTracked()` syntax for query
    * builders. */
  implicit class Syntax[T](private val ds: Dataset[T]) extends AnyVal {
    def persistTracked(): Dataset[T] = Persist.persistTracked(ds)
    def checkpointTracked(): Dataset[T] = Persist.checkpointTracked(ds)
  }
}
