package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnIndex

/** Trained-centroid IVF: determinism, full coverage, balance, and
  * recall against brute-force cosine top-k.
  */
class AnnIndexSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private lazy val assign = AnnIndex.ivfAssign(emb, "vec_id", "emb", k = 8)

  test("assignment: deterministic, covers every vector, bounded skew") {
    val n = emb.count()
    assert(assign.count() == n)
    val again = AnnIndex.ivfAssign(emb, "vec_id", "emb", k = 8)
    assert(assign.select("id", "list_id").collect().toSet ==
      again.select("id", "list_id").collect().toSet, "same seed must reproduce")
    val sizes = assign.groupBy("list_id").count().as[(Int, Long)].collect().toMap
    assert(sizes.nonEmpty && sizes.values.sum == n)
    assert(sizes.values.max <= 4 * (n / sizes.size.max(1)),
      s"a hot list dominates: $sizes")
  }

  test("search recall@5 vs brute force beats the nprobe/k scan fraction") {
    val probeIds = (0L until 10L).toSeq
    val got = AnnIndex.ivfSearch(assign, probeIds, nprobe = 2, topK = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // brute-force cosine top-5 on the same normalized vectors
    val probes = assign.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("q_id"), col("emb_n").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    val brute = assign.crossJoin(broadcast(probes))
      .where(col("id") =!= col("q_id"))
      .withColumn("sim", expr("dot_fold(emb_n, q_emb)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = probeIds.map { q =>
      val g = got.getOrElse(q, Set.empty)
      val b = brute(q)
      g.intersect(b).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    // random 2-of-8 list scanning would give ~0.25; the trained index
    // must do substantially better for the probes' own neighborhoods
    assert(mean >= 0.5, s"mean recall@5 $mean (per-probe: $recalls)")
  }

  test("persisted index: on-disk search matches in-memory, scan is partition-pruned") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    AnnIndex.save(assign, path)
    val probeIds = (0L until 10L).toSeq

    val onDisk = AnnIndex.ivfSearchOnDisk(spark, path, probeIds, nprobe = 2, topK = 5)
    val got = onDisk.select("q_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val inMem = AnnIndex.ivfSearch(assign, probeIds, nprobe = 2, topK = 5)
      .select("q_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == inMem && got.nonEmpty)

    // the search plan must contain a partition-pruned lists scan (the
    // on-disk inverted-file contract: nprobe/k of the index read)...
    val plan = onDisk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id#") ||
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*list_id.*"),
      s"no partition filter on the lists scan:\n$plan")
    // ...and the partitioned layout itself prunes: an isin filter on
    // list_id becomes a PartitionFilter (directory-level skip), and the
    // pruned read returns exactly those lists' rows
    val twoLists = spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(0, 1))
    val scan = twoLists.queryExecution.executedPlan.toString
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*list_id[^\\]]*\\].*"),
      s"isin(list_id) did not become a partition filter:\n$scan")
    val expectRows = assign.filter(col("list_id").isin(0, 1)).count()
    assert(twoLists.count() == expectRows && expectRows > 0)
  }

  test("append: a fresh batch joins the stored centroids' lists without a rebuild") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    val base = emb.filter(col("vec_id") < 450)
    AnnIndex.save(AnnIndex.ivfAssign(base, "vec_id", "emb", k = 8), path)
    val fresh = emb.filter(col("vec_id") >= 450)
    AnnIndex.append(spark, path, fresh, "vec_id", "emb")

    val lists = spark.read.parquet(s"$path/lists")
    assert(lists.count() == emb.count(), "index must hold base + appended")

    // independent single-node replay: appended ids must sit in the
    // argmax list of the STORED centroids (tiebreak: smaller list_id)
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getAs[Number]("list_id").intValue,
        r.getSeq[Double](r.fieldIndex("c_emb"))))
    val gotLists = lists.filter(col("id") >= 450)
      .select(col("id"), col("list_id").cast("int"))
      .as[(Long, Int)].collect().toMap
    val freshVecs = fresh.as[(Long, Seq[Double])].collect()
    assert(gotLists.size == freshVecs.length)
    freshVecs.foreach { case (id, e) =>
      val nrm = math.sqrt(e.foldLeft(0.0)((a, x) => a + x * x))
      val en = e.map(_ / nrm)
      val best = cents.map { case (l, c) =>
        (l, en.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2))
      }.maxBy { case (l, s) => (s, -l) }._1
      assert(gotLists(id) == best, s"vec $id: list ${gotLists(id)} != argmax $best")
    }
  }

  test("searchVectors: external probes served; a member probe's top hit is itself") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-srv").toString
    AnnIndex.save(assign, path)
    val probeIds = (0L until 6L).toSeq
    val probes = emb.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val served = AnnIndex.searchVectors(spark, path, probes, nprobe = 2, topK = 5)
      .select("q_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val byProbe = served.groupBy(_._1)
    assert(byProbe.keySet == probeIds.toSet)
    byProbe.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5), s"ranks not contiguous for $q")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted(Ordering[Double].reverse).toSeq)
      assert(sorted.head._2 == q && sorted.head._3 > 0.999999,
        s"member probe $q must retrieve itself first, got ${sorted.head}")
    }
    // modulo the self row, external serving equals the member path
    val member = AnnIndex.ivfSearchOnDisk(spark, path, probeIds, nprobe = 2, topK = 5)
      .select("q_id", "vec_id", "sim").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(-_._3).take(4).map(r => (r._2, r._3)).toList).toMap
    byProbe.foreach { case (q, rows) =>
      val tail = rows.sortBy(_._4).tail.map(r => (r._2, r._3)).toList
      assert(tail == member(q), s"probe $q: serving tail $tail != member search ${member(q)}")
    }
  }

  test("annServe: streamed probe batches equal the batch serving path") {
    import graft.streaming.StreamingOps
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-str").toString
    AnnIndex.save(assign, path)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingOps.ProbeIn]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val chk = java.nio.file.Files.createTempDirectory("graft-ivf-chk").toString
    val q = StreamingOps.annServe(ms.toDF(), path, chk, nprobe = 2, topK = 5) { (res, _) =>
      results ++= res.select("q_id", "vec_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect()
    }
    val probeRows = emb.filter(col("vec_id") < 6)
      .as[(Long, Seq[Double])].collect()
      .map { case (i, e) => StreamingOps.ProbeIn(i, e) }
    ms.addData(probeRows.take(3).toSeq)
    q.processAllAvailable()
    ms.addData(probeRows.drop(3).toSeq)
    q.processAllAvailable()
    q.stop()
    val probes = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val batch = AnnIndex.searchVectors(spark, path, probes, nprobe = 2, topK = 5)
      .select("q_id", "vec_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(results.toSet == batch && batch.nonEmpty)
  }
}
