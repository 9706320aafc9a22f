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
}
