package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchKernels

/** Morton key kernel: bit-level correctness vs a naive interleave, the
  * 2-D tiling property that makes it a data-skipping layout, and the
  * codegen path of the sp08 query.
  */
class ZOrderSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 31)
      z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    z
  }

  test("kernel equals a naive per-bit interleave, incl. domain edges") {
    val edges = Seq(0L, 1L, 2L, 3L, 7L, 100L, 1L << 15, (1L << 31) - 1)
    for (x <- edges; y <- edges) {
      assert(SketchKernels.zorder64(x, y) == naive(x, y), s"($x, $y)")
      assert(SketchKernels.zorder64(x, y) >= 0L, s"key must stay non-negative ($x, $y)")
    }
    // bits above 31 are masked off, not interleaved
    assert(SketchKernels.zorder64(1L << 31, 1L << 31) == 0L)
    var s = 12345L
    for (_ <- 0 until 500) {
      s = SketchKernels.mix(s)
      val x = s & 0x7FFFFFFFL; val y = SketchKernels.mix(s) & 0x7FFFFFFFL
      assert(SketchKernels.zorder64(x, y) == naive(x, y), s"($x, $y)")
    }
  }

  test("curve blocks tile the plane: 64-key blocks are exact 8x8 tiles") {
    val grid = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, SketchKernels.zorder64(x, y))
    // keys over a full 2^k x 2^k grid are a permutation of 0..n-1
    assert(grid.map(_._3).sorted == (0L until 64L * 64L))
    grid.groupBy(_._3 / 64).foreach { case (blk, pts) =>
      assert(pts.length == 64, s"block $blk")
      // every 64-key block is one 8x8 tile: bbox extents exactly 8 —
      // the tight row-group min/max that 2-D predicates prune against
      // (an x-major sort would give 1x64 stripes: tight in x, useless in y)
      assert(pts.map(_._1).max - pts.map(_._1).min == 7, s"block $blk x-extent")
      assert(pts.map(_._2).max - pts.map(_._2).min == 7, s"block $blk y-extent")
      assert(pts.map(p => (p._1 / 8, p._2 / 8)).distinct.size == 1)
    }
  }

  test("sp08 runs the native expression inside codegen (no UDF, no shuffle before sort)") {
    val df = SparkEntry.queries("sp08_zorder_keys")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"zorder64 must not fall back to a UDF:\n$plan")
    assert(plan.contains("zorder64"), s"native expression missing from plan:\n$plan")
    // key computation is per-row: the only exchange is the final
    // presentation sort's range partitioning
    assert("rangepartitioning".r.findAllIn(plan.toLowerCase).size >= 1 &&
      !plan.contains("hashpartitioning"),
      s"sp08 must not shuffle before the output sort:\n$plan")
    // SQL-registered form agrees with the kernel
    val viaSql = spark.sql("SELECT zorder64(5, 9)").as[Long].head()
    assert(viaSql == SketchKernels.zorder64(5L, 9L))
  }
}
