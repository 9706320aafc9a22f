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

  /** Window-balanced grid cell count for a DERIVED (non-explicit) cell
    * target (round 7, from ×100 smoke profiling). The grid join pays
    * two side-dependent costs: explode fan-out E ≈ N·(1+u)² rows and
    * candidate-pair production C ≈ K·(1+1/u)² probe matches, where
    * u = window/side, window = 2·(radius + avg envelope dim) is the
    * pair-match reach, N = total input rows, and K = Nl·Nr·window²/area
    * is the IRREDUCIBLE window-pair count no cell size can remove.
    * Both unit costs are a row materialization, so minimizing E + C
    * over u picks the principled cell side: dense joins (K ≫ N, e.g.
    * sp11 at ×100 where K ≈ 150·N) sink toward fine cells, sparse
    * real-world joins (K ≪ N) toward sides well above the window —
    * each within ~2× of the true optimum, which is all an
    * order-of-magnitude sizing needs. Inputs are bounded statistics
    * only (plan-stats row estimates, sampled/aggregated extent and
    * mean envelope dimension) — no extra Spark job. A zero window
    * (point data, zero radius) has no pair-reach term and keeps the
    * occupancy-derived fallback. */
  def balancedCells(fallback: Int, estL: Long, estR: Long, area: Double,
      avgDim: Double, radius: Double): Int = {
    val window = 2.0 * (math.max(radius, 0.0) + math.max(avgDim, 0.0))
    if (window <= 0 || area <= 0 || !java.lang.Double.isFinite(area))
      return fallback
    val n = (estL + estR).toDouble
    val k = estL.toDouble * estR.toDouble * window * window / area
    // log-grid search over u = window/side ∈ [1/64, 64]
    val uStar = (-24 to 24).map(i => math.pow(2.0, i / 4.0)).minBy { u =>
      val e = 1.0 + u
      val c = 1.0 + 1.0 / u
      n * e * e + k * c * c
    }
    val side = window / uStar
    val cells = area / (side * side)
    math.max(64L, math.min(1L << 16, math.round(cells))).toInt
  }

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

  /** Frontier size above which minLabel's pointer-jump rounds engage:
    * the jump (an extra self-join + materialization per round) only
    * pays when many labels are still moving — i.e. deep components at
    * scale. Small/star-like graphs converge in 2-4 plain rounds with
    * tiny frontiers and must not pay it (d21 regressed 4.6→6.4 s when
    * the jump ran unconditionally). */
  def componentsJumpMinDelta(spark: SparkSession): Long =
    intConf(spark, "spark.graft.components.jump_min_delta", 100000).toLong

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
