package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.spatial.SpatialFunctions

/** Grid-partitioned spatial join — the 100 TB scale path, expressed as
  * a DataFrame composition Spark executes natively (explode to cells →
  * shuffle equi-join on cell → exact refine), the Spark analogue of the
  * reference's KDB-partitioned multi-pass mode (partitioning/kdb.rs +
  * stream_repartitioner.rs). No driver materialization: the only
  * driver-side data is the 4-double global envelope (the reference
  * samples bboxes the same way, utils/bbox_sampler.rs:61-193).
  *
  * Duplicate suppression uses the reference-point technique (the
  * counterpart of the reference's Regular/None/Multi partition scheme,
  * partitioning/mod.rs:11-78): a candidate pair is emitted only in the
  * grid cell containing the top-left corner of the envelope
  * intersection, so no post-join distinct is needed.
  */
object SpatialJoin {

  /** Inner spatial join of `left` × `right` on `predicate` (an ST_
    * relation name, or st_dwithin with `distance`). Column names of the
    * two sides must be disjoint. `cells` is the target grid cell count
    * (tune ≈ shuffle parallelism² at scale).
    */
  def grid(left: DataFrame, right: DataFrame,
      leftGeom: String, rightGeom: String,
      predicate: String, distance: Double = 0.0,
      cells: Int = 64): DataFrame = {
    val spark = left.sparkSession
    SpatialFunctions.registerAll(spark)
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "grid spatial join requires disjoint column names")

    // global envelope of both sides (one cheap stats pass per side)
    def env(df: DataFrame, geom: String) = df.select(
      min(expr(s"st_xmin($geom)")).as("x0"), min(expr(s"st_ymin($geom)")).as("y0"),
      max(expr(s"st_xmax($geom)")).as("x1"), max(expr(s"st_ymax($geom)")).as("y1"))
    val bounds = env(left, leftGeom).unionByName(env(right, rightGeom))
      .agg(min("x0"), min("y0"), max("x1"), max("y1")).head()
    if (bounds.isNullAt(0)) return left.limit(0).crossJoin(right.limit(0))

    val (x0, y0, x1, y1) = (bounds.getDouble(0), bounds.getDouble(1),
      bounds.getDouble(2), bounds.getDouble(3))
    val n = math.max(1, math.sqrt(cells.toDouble).toInt)
    val w = math.max((x1 - x0) / n, 1e-12)
    val h = math.max((y1 - y0) / n, 1e-12)

    def cellX(e: String): String =
      s"greatest(0, least(${n - 1}, cast(floor((($e) - $x0) / $w) as int)))"
    def cellY(e: String): String =
      s"greatest(0, least(${n - 1}, cast(floor((($e) - $y0) / $h) as int)))"

    /** all cell ids overlapped by an envelope struct (± expand) */
    def cellsOf(box: String, expand: Double): Column = expr(
      s"""flatten(transform(
         |  sequence(${cellX(s"$box.xmin - $expand")}, ${cellX(s"$box.xmax + $expand")}),
         |  ix -> transform(
         |    sequence(${cellY(s"$box.ymin - $expand")}, ${cellY(s"$box.ymax + $expand")}),
         |    iy -> ix * $n + iy)))""".stripMargin)

    // envelopes computed ONCE per input row (one WKB parse), before the
    // cell explode; every later check is arithmetic on the struct
    val l = left.withColumn("__lbox", expr(s"st_box2d($leftGeom)"))
      .withColumn("__cell", explode(cellsOf("__lbox", distance)))
    val r = right.withColumn("__rbox", expr(s"st_box2d($rightGeom)"))
      .withColumn("__cell", explode(cellsOf("__rbox", 0.0)))

    val refine: Column = predicate.toLowerCase match {
      case "st_dwithin" => expr(s"st_dwithin($leftGeom, $rightGeom, $distance)")
      case p            => expr(s"$p($leftGeom, $rightGeom)")
    }
    // cheap arithmetic envelope prefilter ahead of the exact (WKB-
    // parsing) predicate
    val bboxOverlap = expr(
      s"""__lbox.xmin - $distance <= __rbox.xmax AND __rbox.xmin <= __lbox.xmax + $distance
         |AND __lbox.ymin - $distance <= __rbox.ymax AND __rbox.ymin <= __lbox.ymax + $distance""".stripMargin)
    // reference point: top-left corner of the envelope intersection
    // (with the probe envelope expanded by the distance bound)
    val refCell = expr(
      s"${cellX(s"greatest(__lbox.xmin - $distance, __rbox.xmin)")} * $n + " +
        s"${cellY(s"greatest(__lbox.ymin - $distance, __rbox.ymin)")}")

    l.join(r, Seq("__cell"))
      .where(col("__cell") === refCell && bboxOverlap && refine)
      .drop("__cell", "__lbox", "__rbox")
  }

  /** Broadcast-index spatial join, via the planner strategy: writing the
    * join with a spatial UDF condition lets [[graft.plans.SpatialJoinStrategy]]
    * plan a BroadcastSpatialJoinExec (or fall through to Spark if the
    * build side is too large).
    */
  def broadcastJoin(left: DataFrame, right: DataFrame,
      leftGeom: String, rightGeom: String, predicate: String,
      distance: Double = 0.0, joinType: String = "inner"): DataFrame = {
    SpatialFunctions.registerAll(left.sparkSession)
    val cond = predicate.toLowerCase match {
      case "st_dwithin" => expr(s"st_dwithin($leftGeom, $rightGeom, $distance)")
      case p            => expr(s"$p($leftGeom, $rightGeom)")
    }
    left.join(right, cond, joinType)
  }
}
