package graft

import org.apache.spark.sql.functions._

/** §2.B approximate aggregates (the reference's DataFusion
  * approx_distinct / approx_percentile surface → Spark's HLL++
  * `approx_count_distinct` and `percentile_approx`): accuracy-bound
  * assertions against exact references on the lineitem fixture.
  * Approximation output is engine-specific so these are spec-verified
  * (the DuckDB oracle covers the exact forms in q11/q25 instead). */
class ApproxAggSpec extends GraftSuite {

  private lazy val li = Tables.lineitem(spark, "/root/testdata/sf0.001")

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_tight"))
      .head()
    val (exact, approx, tight) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // bounds at ~3x the configured rsd (HLL error is probabilistic)
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"$approx vs $exact")
    assert(math.abs(tight - exact).toDouble / exact < 0.03, s"$tight vs $exact")
  }

  test("percentile_approx converges to exact percentile as accuracy grows") {
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 100)").as("rough"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("fine"))
      .head()
    val (exact, rough, fine) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(math.abs(rough - exact) / exact < 0.05)
    assert(math.abs(fine - exact) / exact < 0.005)
    // grouped form stays well-formed
    val grouped = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile_approx(l_quantity, array(0.25, 0.5, 0.75), 1000)").as("q"))
      .collect()
    grouped.foreach { r =>
      val q = r.getSeq[Double](1)
      assert(q.length == 3 && q(0) <= q(1) && q(1) <= q(2))
    }
  }

  test("hll sketches: mergeable distinct counts (partial per group, union later)") {
    // The 100 TB distinct-count shape: build a REUSABLE sketch per
    // group/partition (hll_sketch_agg), persist/ship the bytes, union
    // downstream (hll_union_agg) — re-aggregation without re-scanning,
    // which approx_count_distinct alone can't do.
    val li = Tables.lineitem(spark, sf)
    val perFlag = li.groupBy(col("l_returnflag"))
      .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"),
        countDistinct(col("l_orderkey")).as("exact"))
    val rows = perFlag.collect()
    assert(rows.length >= 2)
    // per-group estimate within 5%
    val est = perFlag.select(col("l_returnflag"),
      expr("hll_sketch_estimate(sk)").as("est"), col("exact")).collect()
    est.foreach { r =>
      val (e, x) = (r.getLong(1), r.getLong(2))
      assert(math.abs(e - x).toDouble / x < 0.05, s"group ${r.getString(0)}: $e vs $x")
    }
    // union of the per-group sketches ≈ global distinct
    val union = perFlag.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("est")).head().getLong(0)
    val exactAll = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(union - exactAll).toDouble / exactAll < 0.05,
      s"union $union vs $exactAll")
  }
}
