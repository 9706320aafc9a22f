package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted-join correctness + distribution: results equal a plain join,
  * and a hot key's rows actually spread across salt buckets. */
class SkewJoinSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  // 90% of probe rows share one hot key
  private lazy val probe = spark.range(0, 10000).select(
    when(col("id") % 10 < 9, 7L).otherwise(col("id") % 100).as("k"),
    col("id").as("payload"))
  private lazy val build = spark.range(0, 100).select(
    col("id").as("k"), concat(lit("dim_"), col("id")).as("label"))

  test("salted join equals plain join") {
    val plain = probe.join(build, Seq("k"))
      .select("k", "payload", "label").as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.salted(probe, build, Seq("k"), buckets = 8)
      .select("k", "payload", "label").as[(Long, Long, String)].collect().toSet
    assert(salted == plain && plain.size == 10000)
  }

  test("hot key spreads across salt buckets") {
    val salted = probe.withColumn("__salt", (rand(42L) * 8).cast("int"))
    val spread = salted.filter(col("k") === 7L)
      .groupBy(col("__salt")).count().collect()
    assert(spread.length == 8) // every bucket hit
    val counts = spread.map(_.getLong(1))
    assert(counts.min > counts.max / 3) // roughly uniform
  }

  test("hotKeys surfaces the skewed key first") {
    val hot = SkewJoin.hotKeys(probe, col("k"), k = 3)
      .as[(Long, Long)].collect()
    assert(hot.head._1 == 7L && hot.head._2 == 9000L)
  }
}
