package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketed

/** The co-located-join guarantee: equi-joining two tables bucketed on
  * the join key with equal bucket counts plans with ZERO Exchange
  * nodes — the scan's bucket spec satisfies the join's distribution
  * requirement. This is the property that makes bucketing the 100 TB
  * answer for recurring fact-to-fact joins; the spec pins it so a
  * Spark upgrade or conf drift can't silently re-introduce the
  * shuffle. */
class BucketedJoinSpec extends GraftSuite {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed fact-to-fact join plans with no join-side shuffle") {
    val ords = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice")
    Bucketed.write(ords, "b_orders", "o_orderkey", buckets = 4)
    Bucketed.write(li, "b_lineitem", "l_orderkey", buckets = 4)
    try withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the SMJ path
      "spark.sql.sources.bucketing.enabled" -> "true") {
      val j = Bucketed.read(spark, "b_orders")
        .join(Bucketed.read(spark, "b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      j.collect() // finalize the adaptive plan
      // final AQE plan only (toString repeats the initial plan below it)
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // join side: no Exchange below the SortMergeJoin; the one allowed
      // Exchange is the aggregate's o_custkey shuffle above the join
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(exchanges <= 1, s"co-located join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")

      // and the result matches the plain (shuffled) join
      val got = j.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ords.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val ords = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Bucketed.write(ords, "b_orders_8", "o_orderkey", buckets = 8)
    Bucketed.write(li, "b_lineitem_2", "l_orderkey", buckets = 2)
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = Bucketed.read(spark, "b_orders_8")
        .join(Bucketed.read(spark, "b_lineitem_2"),
          col("o_orderkey") === col("l_orderkey"))
      val n = j.count()
      val want = ords.join(li, col("o_orderkey") === col("l_orderkey")).count()
      assert(n == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_8")
      spark.sql("DROP TABLE IF EXISTS b_lineitem_2")
    }
  }
}
