package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins without the nested-loop trap. Spark plans a
  * bare `l.x BETWEEN r.lo AND r.hi` condition as BroadcastNestedLoop —
  * quadratic in inputs. These compositions bin the number line (the 1-D
  * version of the spatial grid join): each interval explodes to the
  * bins it overlaps, points map to one bin, the join becomes a bin-key
  * equi-join plus an exact refine, and duplicate pairs are suppressed
  * by the reference-bin rule (a pair is emitted only in the bin owning
  * the overlap start). One shuffle on the bin key; bin width trades
  * explode duplication against in-bin pair count, exactly like grid
  * cell size.
  */
object RangeJoin {

  /** Point-in-interval join: rows of `points` (value column `x`) with
    * rows of `intervals` (columns `lo`, `hi`, inclusive bounds).
    * `binWidth` must exceed 0; intervals spanning many bins explode
    * accordingly (size intervals/binWidth to the data). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      x: String, lo: String, hi: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "range join requires disjoint column names")
    val pBin = floor(col(x) / binWidth).cast("long")
    val iBins = expr(
      s"sequence(CAST(floor($lo / $binWidth) AS BIGINT), " +
        s"CAST(floor($hi / $binWidth) AS BIGINT))")
    points.withColumn("__bin", pBin)
      .join(intervals.withColumn("__bin", explode(iBins)), Seq("__bin"))
      .where(col(x) >= col(lo) && col(x) <= col(hi))
      .drop("__bin")
  }

  /** Interval-overlap self/two-sided join: pairs where
    * `[l_lo, l_hi]` and `[r_lo, r_hi]` intersect (inclusive). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "range join requires disjoint column names")
    def bins(lo: String, hi: String) = expr(
      s"sequence(CAST(floor($lo / $binWidth) AS BIGINT), " +
        s"CAST(floor($hi / $binWidth) AS BIGINT))")
    // a pair is kept only in the bin containing the overlap start, so
    // multi-bin overlaps are emitted exactly once (no distinct needed)
    val refBin = floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long")
    left.withColumn("__bin", explode(bins(lLo, lHi)))
      .join(right.withColumn("__bin", explode(bins(rLo, rHi))), Seq("__bin"))
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__bin") === refBin)
      .drop("__bin")
  }
}
