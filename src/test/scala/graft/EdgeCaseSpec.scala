package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Components, RangeJoin, SpatialJoin, TopK}

/** Boundary behavior of the reusable operators: empty inputs, k larger
  * than the group, single-row frontiers. A 100 TB pipeline routinely
  * produces empty partitions and empty sides (a filter that matched
  * nothing, a day with no late data) — operators must degrade to empty
  * results, not throw or hang.
  */
class EdgeCaseSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  test("TopK: k larger than the group returns the whole group, ordered") {
    val df = Seq((1L, 0.3, 10L), (1L, 0.9, 11L), (2L, 0.5, 20L))
      .toDF("k", "sim", "id")
    val got = TopK.topK(df, Seq("k"), col("sim"), col("id"), 5, asc = false)
      .select(col("k"), col("id"), col("rank")).as[(Long, Long, Int)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 10L, 2), (1L, 11L, 1), (2L, 20L, 1)))
  }

  test("TopK: empty input yields an empty result, not an error") {
    val df = Seq.empty[(Long, Double, Long)].toDF("k", "sim", "id")
    assert(TopK.topK(df, Seq("k"), col("sim"), col("id"), 3, asc = true)
      .count() == 0L)
  }

  test("TopK: ties on the ordering value break by id, deterministically") {
    val df = Seq((1L, 0.5, 12L), (1L, 0.5, 10L), (1L, 0.5, 11L))
      .toDF("k", "sim", "id")
    val got = TopK.topK(df, Seq("k"), col("sim"), col("id"), 2, asc = false)
      .orderBy(col("rank")).select(col("id")).as[Long].collect().toSeq
    assert(got == Seq(10L, 11L))
  }

  test("AsOfJoin: empty right side leaves every left row unmatched") {
    val left = Seq((1L, 100L, "x")).toDF("key", "ts", "lv")
    val right = Seq.empty[(Long, Long, Double)].toDF("key", "ts", "rv")
    val got = AsOfJoin.leftAsOf(left, right, "key", "ts")
    assert(got.count() == 1L && got.filter(col("rv").isNull).count() == 1L)
  }

  test("AsOfJoin: empty left side yields an empty result") {
    val left = Seq.empty[(Long, Long, String)].toDF("key", "ts", "lv")
    val right = Seq((1L, 50L, 1.0)).toDF("key", "ts", "rv")
    assert(AsOfJoin.leftAsOf(left, right, "key", "ts").count() == 0L)
  }

  test("RangeJoin: empty intervals side yields an empty result") {
    val points = Seq((1L, 5.0)).toDF("pid", "x")
    val intervals = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", 10.0)
      .count() == 0L)
  }

  test("RangeJoin: degenerate zero-width interval still matches its point") {
    val points = Seq((1L, 5.0), (2L, 5.0000001)).toDF("pid", "x")
    val intervals = Seq((7L, 5.0, 5.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", 2.0)
    assert(got.select(col("pid")).as[Long].collect().toSeq == Seq(1L))
  }

  test("Components: empty edge set makes every vertex its own component") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L).toDF("v")
    val got = Components.minLabel(edges, vertices)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("Components: a single edge merges exactly one pair") {
    val edges = Seq((2L, 3L), (3L, 2L)).toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L).toDF("v")
    val got = Components.minLabel(edges, vertices)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("Components: pointer-jump path closes a deep chain in O(log d) rounds") {
    // a 512-vertex chain has diameter 511 — plain propagation could
    // never close it inside the 50-round cap, so this proves the jump
    // path (gate lowered to engage immediately) both terminates fast
    // and stays correct; it also exercises the jump intermediate's
    // persist/release discipline every round
    spark.conf.set("spark.graft.components.jump_min_delta", 1)
    try {
      val n = 512L
      val fwd = spark.range(0, n - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      val vertices = spark.range(0, n).select(col("id").as("v"))
      val got = Components.minLabel(edges, vertices)
      assert(got.count() == n)
      assert(got.filter(col("comp") =!= 0L).count() == 0L,
        "every chain vertex must label down to 0")
      assert(Components.lastRounds <= 16,
        s"pointer jump should close diameter 511 in O(log d) rounds, " +
          s"took ${Components.lastRounds}")
    } finally spark.conf.unset("spark.graft.components.jump_min_delta")
  }

  test("Components.minLabel frees superseded checkpoint generations") {
    // each round localCheckpoints a new label generation; without the
    // explicit release, ~2 pinned RDDs per round accumulate until the
    // GC-driven cleaner notices (a ~10-round run leaves 20+ — observed
    // OOMing a long-lived smoke JVM). With the release, only the FINAL
    // generation (what the caller reads) may stay pinned. Bound is
    // tolerant of concurrently-running suites persisting their own.
    spark.conf.set("spark.graft.components.jump_min_delta", 1)
    try {
      val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
      val n = 256L
      val fwd = spark.range(0, n - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      val got = Components.minLabel(edges, spark.range(0, n).select(col("id").as("v")))
      assert(got.filter(col("comp") =!= 0L).count() == 0L)
      assert(Components.lastRounds >= 5, "fixture should run several rounds")
      val newPinned = spark.sparkContext.getPersistentRDDs.keySet -- beforeIds
      assert(newPinned.size <= 5,
        s"${newPinned.size} new pinned RDDs after ${Components.lastRounds} " +
          "rounds — superseded generations are not being freed")
    } finally spark.conf.unset("spark.graft.components.jump_min_delta")
  }

  test("SpatialJoin.broadcastJoin: empty build side returns empty inner join") {
    graft.spatial.SpatialFunctions.registerAll(spark)
    val pts = spark.range(0, 3).selectExpr("id",
      "st_makepoint(cast(id as double), 0d) AS pt")
    val boxes = spark.range(0, 0).selectExpr("id AS bid",
      "st_makeenvelope(0d, 0d, 1d, 1d) AS box")
    assert(SpatialJoin.broadcastJoin(pts, boxes, "pt", "box", "st_within")
      .count() == 0L)
  }

  test("SpatialJoin.broadcastJoin: empty probe side with left join is empty; " +
    "empty build side with left join keeps probes") {
    graft.spatial.SpatialFunctions.registerAll(spark)
    val pts = spark.range(0, 2).selectExpr("id",
      "st_makepoint(cast(id as double), 0d) AS pt")
    val noPts = pts.where(lit(false))
    val boxes = spark.range(0, 1).selectExpr("id AS bid",
      "st_makeenvelope(0d, 0d, 1d, 1d) AS box")
    val noBoxes = boxes.where(lit(false))
    assert(SpatialJoin.broadcastJoin(noPts, boxes, "pt", "box", "st_within",
      joinType = "left").count() == 0L)
    val kept = SpatialJoin.broadcastJoin(pts, noBoxes, "pt", "box", "st_within",
      joinType = "left")
    assert(kept.count() == 2L && kept.filter(col("bid").isNull).count() == 2L)
  }
}
