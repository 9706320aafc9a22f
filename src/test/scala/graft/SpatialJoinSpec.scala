package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin
import graft.spatial.SpatialFunctions

/** Spatial-join correctness vs brute-force cross-join oracles
  * (FIXTURES.md §5), for both execution paths: the broadcast R-tree
  * exec (planner strategy) and the grid-partitioned composition —
  * including geometries spanning multiple grid cells (duplicate
  * suppression) and all supported join types.
  */
class SpatialJoinSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  SpatialFunctions.registerAll(spark)

  // deterministic point/box clouds; boxes sized to span grid cells
  private lazy val pts: DataFrame = spark.range(0, 300).select(
    col("id").as("p_id"),
    expr("st_makepoint(cast(id * 48271 % 1009 % 100 as double) + 0.5, " +
      "cast(id * 69621 % 1009 % 100 as double) + 0.5)").as("p_geom"))
  private lazy val boxes: DataFrame = spark.range(0, 60).select(
    col("id").as("b_id"),
    expr("st_makeenvelope(cast(id * 40503 % 997 % 90 as double), " +
      "cast(id * 65599 % 997 % 90 as double), " +
      "cast(id * 40503 % 997 % 90 + id % 17 + 2 as double), " +
      "cast(id * 65599 % 997 % 90 + id % 13 + 2 as double))").as("b_geom"))

  private def bruteInner: Set[(Long, Long)] =
    pts.crossJoin(boxes).where(expr("st_within(p_geom, b_geom)"))
      .select("p_id", "b_id").as[(Long, Long)].collect().toSet

  test("strategy plans BroadcastSpatialJoinExec for spatial condition") {
    val joined = pts.join(boxes, expr("st_within(p_geom, b_geom)"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastSpatialJoin"),
      s"expected spatial exec in plan:\n$physical")
    assert(joined.select("p_id", "b_id").as[(Long, Long)].collect().toSet == bruteInner)
  }

  test("broadcast path: semi, anti, outer match brute force") {
    val matchedPts = bruteInner.map(_._1)
    val semi = SpatialJoin.broadcastJoin(pts, boxes, "p_geom", "b_geom",
      "st_within", joinType = "left_semi").select("p_id").as[Long].collect().toSet
    assert(semi == matchedPts)
    val anti = SpatialJoin.broadcastJoin(pts, boxes, "p_geom", "b_geom",
      "st_within", joinType = "left_anti").select("p_id").as[Long].collect().toSet
    assert(anti == pts.select("p_id").as[Long].collect().toSet -- matchedPts)
    val outer = SpatialJoin.broadcastJoin(pts, boxes, "p_geom", "b_geom",
      "st_within", joinType = "left")
      .select(col("p_id"), col("b_id")).collect()
    val outerPairs = outer.filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getLong(1))).toSet
    val outerNulls = outer.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    assert(outerPairs == bruteInner)
    assert(outerNulls == anti)
  }

  test("grid path: inner with multi-cell geometries, no duplicates") {
    val got = SpatialJoin.grid(pts, boxes, "p_geom", "b_geom", "st_within",
      cells = 25).select("p_id", "b_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate pairs from grid join")
    assert(got.toSet == bruteInner)
  }

  test("grid path: box-box intersects self-join matches brute force") {
    val a = boxes.select(col("b_id").as("a_id"), col("b_geom").as("a_geom"))
    val brute = a.crossJoin(boxes)
      .where(expr("st_intersects(a_geom, b_geom)") && col("a_id") < col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val got = SpatialJoin.grid(a, boxes, "a_geom", "b_geom", "st_intersects",
      cells = 36).where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
    assert(got.toSet == brute)
  }

  test("grid path: dwithin matches brute-force distance filter") {
    val sup = spark.range(0, 12).select(col("id").as("s_id"),
      expr("st_makepoint(cast(id * 37 % 100 as double), cast(id * 53 % 100 as double))").as("s_geom"))
    val brute = pts.crossJoin(sup)
      .where(expr("st_distance(p_geom, s_geom) <= 8.0"))
      .select("p_id", "s_id").as[(Long, Long)].collect().toSet
    val got = SpatialJoin.grid(pts, sup, "p_geom", "s_geom", "st_dwithin",
      distance = 8.0, cells = 16).select("p_id", "s_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
    assert(got.toSet == brute)
  }

  test("distance-comparison condition shapes plan the spatial exec") {
    for (cond <- Seq("st_distance(p_geom, b_geom) < 5.0", "5.0 > st_distance(p_geom, b_geom)")) {
      val j = pts.join(boxes, expr(cond))
      assert(j.queryExecution.executedPlan.toString.contains("BroadcastSpatialJoin"),
        s"no spatial exec for: $cond")
      val brute = pts.crossJoin(boxes).where(expr(cond))
        .select("p_id", "b_id").as[(Long, Long)].collect().toSet
      assert(j.select("p_id", "b_id").as[(Long, Long)].collect().toSet == brute)
    }
  }
}
