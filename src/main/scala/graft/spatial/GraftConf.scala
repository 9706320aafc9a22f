package graft.spatial

import org.apache.spark.sql.SparkSession

/** Session-conf knobs under `spark.graft.*` — the Spark analogue of the
  * reference's `dataclod.spatial_join.*` config namespace
  * (/root/reference/src/datafusion-extra/spatial/src/option.rs:21-105):
  * every tuning default the reference exposes as a config is settable
  * here per session, read at plan/build time.
  *
  * {{{
  * spark.conf.set("spark.graft.spatial_join.cells", 256)
  * spark.conf.set("spark.graft.spatial_join.adaptive", false)
  * }}}
  */
object GraftConf {

  /** grid cell-count target (reference partitioner sizing, option.rs:62-70) */
  def spatialCells(spark: SparkSession, explicit: Int): Int =
    if (explicit > 0) explicit
    else intConf(spark, "spark.graft.spatial_join.cells", 64)

  /** KDB-adaptive vs uniform grid scheme */
  def spatialAdaptive(spark: SparkSession, default: Boolean = true): Boolean =
    boolConf(spark, "spark.graft.spatial_join.adaptive", default)

  /** broadcast-build byte limit (reference memory plan, option.rs:49/
    * memory_plan.rs) — above this the strategy falls through */
  def buildLimitBytes(spark: SparkSession): Long =
    longConf(spark, "spark.graft.spatial_join.build_limit_bytes",
      defaultBuildLimit)

  private def defaultBuildLimit: Long = {
    val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    if (thr > 0) thr * 8 else 256L << 20
  }

  /** speculative refinement sample size (reference option.rs:49: 100) */
  def speculativeSample(spark: SparkSession): Int =
    intConf(spark, "spark.graft.spatial_join.speculative_sample", 100)

  /** min-label propagation round cap (Components.minLabel). The loop
    * exits at fixpoint; this bounds pathological chain graphs — at
    * O(diameter) rounds, 50 covers any plausible near-dup/density
    * component shape */
  def componentsMaxRounds(spark: SparkSession): Int =
    intConf(spark, "spark.graft.components.max_rounds", 50)

  /** DBSCAN density threshold: a point is core when its eps-ball holds
    * at least this many points (itself included). Default matches the
    * sp07 oracle */
  def dbscanMinPts(spark: SparkSession): Int =
    intConf(spark, "spark.graft.dbscan.min_pts", 5)

  /** DBSCAN neighbor-join grid cell count (the skew/occupancy knob at
    * scale — more cells = narrower dwithin self-join partitions) */
  def dbscanCells(spark: SparkSession): Int =
    intConf(spark, "spark.graft.dbscan.cells", 64)

  private def intConf(spark: SparkSession, key: String, default: Int): Int =
    spark.conf.getOption(key).map(_.toInt).getOrElse(default)
  private def longConf(spark: SparkSession, key: String, default: => Long): Long =
    spark.conf.getOption(key).map(_.toLong).getOrElse(default)
  private def boolConf(spark: SparkSession, key: String, default: Boolean): Boolean =
    spark.conf.getOption(key).map(_.toBoolean).getOrElse(default)
}
