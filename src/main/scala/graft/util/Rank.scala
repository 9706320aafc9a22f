package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ROW_NUMBER — the distributed replacement for
  * `row_number() OVER (ORDER BY ...)`, whose single unpartitioned
  * window partition serializes the whole table through one task.
  *
  * Shape (same as q64's inline version, factored out): range-partition
  * the rows on the sort key, count rows per partition, prefix-sum the
  * P-row count table (the ONLY unpartitioned window — P rows, not N),
  * broadcast the offsets back, and add a per-partition local
  * row_number. Range partitioning guarantees partition i's keys all
  * precede partition i+1's, so offset + local rank IS the global rank.
  *
  * The caller's sort columns must form a TOTAL order (append a unique
  * tiebreak column) or the rank is nondeterministic under reshuffle.
  */
object Rank {

  /** Adds column `rk` (1-based global BIGINT row number by `sort`).
    *
    * The range-partitioned frame is `localCheckpoint`ed, not merely
    * persisted: the offset table and the final join BOTH read partition
    * ids, and a persisted-but-evicted frame could recompute with fresh
    * range-boundary sampling, shifting `spark_partition_id` between the
    * two passes and misaligning every offset. Checkpointing pins the
    * partitioning for both reads; the checkpoint rides [[Persist]]'s
    * registry so consumers free its blocks right after the query's
    * action instead of waiting on the GC-driven ContextCleaner.
    *
    * `numParts` defaults to the session's shuffle parallelism (a fixed
    * small constant would cap the operator's scale); the internal
    * helper columns are reserved-prefixed and rejected if the caller's
    * frame already uses them. */
  def globalRowNumber(df: DataFrame, sort: Seq[Column],
      numParts: Int = -1): DataFrame = {
    val reserved = Seq("__graft_pid", "__graft_off", "rk")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"globalRowNumber reserves columns ${reserved.mkString(", ")}; " +
      s"input already has ${clash.mkString(", ")}")
    val n = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = Persist.checkpointTracked(
      df.repartitionByRange(n, sort: _*)
        .withColumn("__graft_pid", spark_partition_id()))
    val offs = ranged.groupBy(col("__graft_pid")).agg(count(lit(1)).as("_c"))
      .withColumn("__graft_off",
        sum(col("_c")).over(Window.orderBy(col("__graft_pid"))) - col("_c"))
      .select(col("__graft_pid"), col("__graft_off"))
    ranged.join(broadcast(offs), "__graft_pid")
      .withColumn("rk", (col("__graft_off") +
        row_number().over(
          Window.partitionBy(col("__graft_pid")).orderBy(sort: _*)))
        .cast("long"))
      .drop("__graft_pid", "__graft_off")
  }

  /** SQL-standard NTILE(k) bucket from a 1-based global rank and the
    * total row count, in closed-form integer arithmetic: the first
    * n mod k buckets hold ceil(n/k) rows, the rest floor(n/k) — the
    * same distribution NTILE produces in Spark and DuckDB, without any
    * global window. */
  def ntileOf(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long") // floor bucket size
    val r = (n % k).cast("long")      // buckets that get one extra row
    val big = (q + 1) * r             // rows covered by the larger buckets
    // q = 0 (n < k) keeps every rank on the `big` branch, so the /q
    // division below is never evaluated for it (CaseWhen short-circuits)
    when(rank <= big, floor((rank - 1) / (q + 1)).cast("long") + 1)
      .otherwise(r + floor((rank - 1 - big) / q).cast("long") + 1)
  }
}
