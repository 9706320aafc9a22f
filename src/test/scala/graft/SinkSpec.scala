package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.Sink

/** Output layout: partition directories prune, maxRecordsPerFile
  * bounds files, and range-clustering yields narrow per-file key
  * ranges (the property row-group skipping depends on).
  */
class SinkSpec extends GraftSuite {

  private lazy val out = Files.createTempDirectory("graft-sink").toString

  test("partitioned + clustered write: pruning, file bounds, narrow ranges") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Sink.writePartitioned(docs, out,
      partitionBy = Seq("lang"),
      maxRecordsPerFile = 60L,
      clusterBy = Seq("n_chars"),
      numTasks = 8)

    // directory-level partitioning
    val langDirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("lang=")).toSeq
    assert(langDirs.size >= 3, s"expected lang=* dirs, got $langDirs")

    // round-trip + partition pruning in the scan
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition pruning missing:\n$scan")

    // maxRecordsPerFile honored
    val files = Files.walk(Paths.get(out)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).map(_.toString).toSeq
    val counts = files.map(f => spark.read.parquet(f).count())
    assert(counts.nonEmpty && counts.max <= 60,
      s"file exceeded maxRecordsPerFile: $counts")

    // clustering: per-file n_chars spread is far below the global one
    val global = docs.agg(max("n_chars").cast("long") - min("n_chars").cast("long"))
      .head().getLong(0)
    val spreads = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(max("n_chars").cast("long") - min("n_chars").cast("long")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val medianSpread = spreads.sorted.apply(spreads.size / 2)
    assert(medianSpread <= global / 2,
      s"files not clustered: median spread $medianSpread vs global $global")
  }

  test("st_zorder interleaves bits exactly (vs a naive reference)") {
    import graft.spatial.ZOrderKernels
    // naive bit-by-bit interleave as the oracle
    def naive(cx: Long, cy: Long): Long =
      (0 until 21).foldLeft(0L) { (acc, i) =>
        acc | (((cx >> i) & 1L) << (2 * i)) | (((cy >> i) & 1L) << (2 * i + 1))
      }
    val scale = (1L << 21) - 1
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val (x, y) = (rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 180 - 90)
      val cx = (((x + 180) / 360) * scale).toLong
      val cy = (((y + 90) / 180) * scale).toLong
      assert(ZOrderKernels.zorder(x, y, -180, -90, 180, 90) == naive(cx, cy))
    }
    // clamping outside the bounds
    assert(ZOrderKernels.zorder(-999, -999, -180, -90, 180, 90) == 0L)
  }

  test("z-order clustering localizes both axes in written files") {
    import org.apache.spark.sql.expressions.Window
    graft.spatial.SpatialFunctions.registerAll(spark)
    graft.spatial.ZOrderExpr.register(spark, 0, 0, 101, 101)
    val pts = Tables.customer(spark, sf).select(
      col("c_custkey"),
      expr("CAST((c_custkey * 48271) % 10007 % 100 AS DOUBLE) + 0.5").as("x"),
      expr("CAST((c_custkey * 69621) % 10007 % 100 AS DOUBLE) + 0.5").as("y"))
      .withColumn("z", expr("st_zorder(x, y)"))
    val zoDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Sink.writePartitioned(pts, zoDir, partitionBy = Nil,
      maxRecordsPerFile = 200L, clusterBy = Seq("z"), numTasks = 8)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(zoDir))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    assert(files.size >= 4)
    // each file's bbox must cover a small fraction of the 100x100 world
    val areas = files.map { f =>
      val r = spark.read.parquet(f).agg(
        (max("x") - min("x")) * (max("y") - min("y"))).head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    val medianArea = areas.sorted.apply(areas.size / 2)
    assert(medianArea <= 100.0 * 100.0 / 4,
      s"z-ordered files not localized: median bbox area $medianArea of 10000")
  }
}
