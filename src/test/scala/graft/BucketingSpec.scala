package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-bucketing both sides on the join key
  * removes the shuffle entirely — the planned mechanism for repeated
  * large-fact joins at 100 TB (bucket once at write, join shuffle-free
  * forever after). */
class BucketingSpec extends GraftSuite {

  test("join of co-bucketed tables plans no exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      Tables.orders(spark, "/root/testdata/sf0.001")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      val expected = Tables.lineitem(spark, "/root/testdata/sf0.001").count()
      assert(rows.map(_.getLong(1)).sum == expected) // every lineitem matches

      val p = joined.queryExecution.executedPlan.toString
      // the join itself needs no shuffle: only the groupBy aggregates may
      // exchange, never on the bucketed join key
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles on the key:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$p")
      assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
