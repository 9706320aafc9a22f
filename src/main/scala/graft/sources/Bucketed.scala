package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing — the co-located-join path for joins both of
  * whose sides are too big to broadcast AND recur on the same key
  * (fact-to-fact: orders⋈lineitem on the order key, events⋈events on
  * the user key). Writing both sides `bucketBy(k, key)` with the same
  * bucket count lets every later equi-join on that key plan WITHOUT a
  * shuffle on either side: Spark's `FileSourceScanExec` reports the
  * bucket spec as its output partitioning, so `EnsureRequirements`
  * inserts no Exchange. At 100 TB this converts the nightly pipeline's
  * biggest repeated shuffle into a pure scan-side property paid once at
  * write time.
  *
  * Reference surface: SURVEY §2.A A7 (probe-side shuffle planning) —
  * the reference re-partitions per query; the Spark-first answer is to
  * persist the partitioning in the table layout instead.
  *
  * (`sortBy` on the same key additionally removes the join's Sort:
  * SMJ reads both sides already bucket-sorted.)
  */
object Bucketed {

  /** Write `df` as a bucketed (+ bucket-sorted) managed Parquet table,
    * replacing any prior version. Bucket count must match on both join
    * sides for the shuffle-free plan. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (plain catalog read — the bucket spec
    * rides along in the catalog entry). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
