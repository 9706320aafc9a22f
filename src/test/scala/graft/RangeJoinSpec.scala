package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Range-join correctness vs brute force + plan shape (no nested-loop
  * fallback, exactly one bin-key shuffle pair). */
class RangeJoinSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  private lazy val points = spark.range(0, 2000).select(
    col("id").as("p_id"),
    (col("id") * 37 % 997).cast("double").as("x"))
  // intervals of varied width incl. multi-bin spans
  private lazy val intervals = spark.range(0, 200).select(
    col("id").as("i_id"),
    (col("id") * 91 % 900).cast("double").as("lo"),
    ((col("id") * 91 % 900) + (col("id") % 13) * 17 + 1).cast("double").as("hi"))

  test("point-in-interval equals brute force") {
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = 50.0)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(intervals)
      .where(col("x") >= col("lo") && col("x") <= col("hi"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("interval overlap equals brute force, no duplicate pairs") {
    val l = intervals.select(col("i_id").as("a_id"), col("lo").as("a_lo"), col("hi").as("a_hi"))
    val r = intervals.select(col("i_id").as("b_id"), col("lo").as("b_lo"), col("hi").as("b_hi"))
    val got = RangeJoin.intervalOverlap(l, r, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 40.0)
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    val brute = l.crossJoin(r)
      .where(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi") &&
        col("a_id") < col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got.toSet == brute && brute.nonEmpty)
  }

  test("plan: bin equi-join, not nested loop") {
    val df = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = 50.0)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to nested loop:\n$p")
  }
}
