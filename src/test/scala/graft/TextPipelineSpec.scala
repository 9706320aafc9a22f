package graft

import org.apache.spark.sql.functions._

import graft.functions.BottomKAgg

/** Behavioral tests for the round-3 text-pipeline additions
  * (contamination scan, repetition rules, bottom-k sampling).
  */
class TextPipelineSpec extends GraftSuite {

  test("t09: planted eval dup is flagged as contaminated") {
    val out = SparkEntry.queries("t09_eval_contamination")(spark, sf)
      .filter(col("contaminated"))
      .collect()
    // the corpus plants near-dup pairs; at sf0.01 at least one has an
    // endpoint in the eval range, and overlap must be substantial
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_shared") > 0))
    assert(out.exists(r => r.getAs[Double]("contamination") > 0.5),
      "a near-dup of an eval doc should share most shingles")
  }

  test("t10: repetition metrics bounded and keep splits the corpus") {
    val rows = SparkEntry.queries("t10_repetition_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 1 to 3 if !r.isNullAt(i)) {
      val v = r.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"metric out of range: $r")
    }
    val keeps = rows.map(_.getAs[Boolean]("keep")).toSet
    assert(keeps == Set(true, false), "thresholds should split the corpus")
  }

  test("bottom_k aggregator: order/partition invariant, tie-broken on id") {
    val agg = new BottomKAgg(3)
    val items = Seq(("b", 2L), ("a", 9L), ("a", 1L), ("c", 5L), ("b", 2L))
    // reduce in two different orders + merge partial states
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    val (p1, p2) = items.splitAt(2)
    val merged = agg.merge(
      p2.foldLeft(agg.zero)(agg.reduce),
      p1.foldLeft(agg.zero)(agg.reduce))
    // multiset semantics: the duplicate ("b",2) occupies its own slot
    val expected = items.sorted.take(3)
    assert(agg.finish(whole) == expected)
    assert(agg.finish(merged) == agg.finish(whole))
    // nulls dropped
    assert(agg.reduce(agg.zero, (null, 1L)) == agg.zero)
  }

  test("t11 plan: bounded-state aggregation with a map-side partial") {
    val df = SparkEntry.queries("t11_bottomk_sample")(spark, sf)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"no object hash agg:\n$p")
    assert(p.contains("partial_bottomkagg") ||
      p.toLowerCase.contains("partial_bottom"),
      s"no map-side partial aggregation:\n$p")
    // never a full sort+window over the corpus
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      s"bottom-k fell back to a window sort:\n$p")
  }
}
