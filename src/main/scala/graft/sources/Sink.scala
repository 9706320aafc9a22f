package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output-side helpers for a 100 TB pipeline — the part of the job
  * that decides what the NEXT job's scan looks like. The reference
  * inherits DataFusion's `COPY TO` (single-node files); at cluster
  * scale the equivalent concern is layout: partition directories that
  * prune, file counts/sizes that don't melt the namenode or the next
  * scan's task scheduler, and optional within-file ordering for
  * row-group min/max skipping.
  */
object Sink {

  /** Write `df` as partitioned parquet with bounded file sizes and
    * (optionally) value-clustered files within each partition.
    *
    * - `partitionBy` becomes directory-level partition pruning for
    *   every downstream reader.
    * - `maxRecordsPerFile` bounds file size without a global count
    *   (Spark splits as it writes — no extra pass).
    * - `clusterBy` repartitions by the given keys INSIDE each output
    *   partition and sorts within files, so parquet row-group min/max
    *   statistics actually skip (a file covering the whole key range
    *   skips nothing). One shuffle, bounded by `filesPerPartition`.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionBy: Seq[String],
      maxRecordsPerFile: Long = 5000000L,
      clusterBy: Seq[String] = Nil,
      numTasks: Int = 0,
      mode: String = "overwrite"): Unit = {
    val arranged =
      if (clusterBy.isEmpty) df
      else {
        // range-partition on (partition keys, cluster keys): rows of one
        // output partition split across adjacent tasks by cluster-key
        // RANGE, so each written file covers a narrow, nearly disjoint
        // key interval — the layout row-group min/max skipping needs
        val keys = (partitionBy ++ clusterBy).map(col)
        val ranged =
          if (numTasks > 0) df.repartitionByRange(numTasks, keys: _*)
          else df.repartitionByRange(keys: _*)
        ranged.sortWithinPartitions(keys: _*)
      }
    arranged.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }
}
