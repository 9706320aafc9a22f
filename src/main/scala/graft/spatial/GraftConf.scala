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

  /** Grid cell-count target (reference partitioner sizing, option.rs:
    * 62-70). Default scales with the input (round-7 ×100-smoke fix:
    * a FIXED cell count makes per-cell occupancy — and so in-cell
    * candidate pair work — grow linearly with rows, turning the grid
    * join quadratic; sp11 hit ratio 946 at factor 100). `estRows/128`
    * keeps ~constant occupancy; the ceiling matches what a ≤20k KDB
    * envelope sample can meaningfully split. */
  def spatialCells(spark: SparkSession, explicit: Int,
      estRows: Long = -1L): Int =
    if (explicit > 0) explicit
    else spark.conf.getOption("spark.graft.spatial_join.cells").map(_.toInt)
      .getOrElse(
        if (estRows > 0)
          math.max(64L, math.min(1L << 16, estRows / 128)).toInt
        else 64)

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

  /** DBSCAN neighbor-join grid cell count. Default derives from the
    * input size so per-cell occupancy stays ~constant (~128 points):
    * with the density-scaled eps (~1/√N) and cell width ~1/√cells,
    * both the in-cell candidate cross-product AND the explode
    * duplication stay O(1) per point at every scale factor. A fixed
    * cell count would leave candidate pair work growing as N²/cells. */
  def dbscanCells(spark: SparkSession, rows: Long): Int =
    intConf(spark, "spark.graft.dbscan.cells",
      math.max(64L, math.min(1L << 20, rows / 128)).toInt)

  private def intConf(spark: SparkSession, key: String, default: Int): Int =
    spark.conf.getOption(key).map(_.toInt).getOrElse(default)
  private def longConf(spark: SparkSession, key: String, default: => Long): Long =
    spark.conf.getOption(key).map(_.toLong).getOrElse(default)
  private def boolConf(spark: SparkSession, key: String, default: Boolean): Boolean =
    spark.conf.getOption(key).map(_.toBoolean).getOrElse(default)
}
