package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.{DedupOps, VectorOps}

/** Behavioral checks for the sketch dedup + vector ops on synthetic
  * fixtures with KNOWN duplicates/neighbors (the driver fixtures have
  * none at sf0.001, so these are the real semantic tests).
  */
class DedupVectorSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-fixture").toString
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away to the old green hill where it sleeps all day long"
    val docs = Seq(
      (0L, base, "en", "srcA", base.length.toLong),
      (1L, base, "en", "srcB", base.length.toLong), // exact dup of 0
      (2L, base.replace("green", "blue"), "en", "srcA",
        base.length.toLong), // near dup of 0
      (3L, "completely unrelated words about spark catalyst optimizer " +
        "plans and distributed shuffle execution at massive scale here",
        "en", "srcA", 110L),
      (4L, "", "de", "srcC", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    def vec(f: Int => Float): Array[Float] = Array.tabulate(64)(f)
    val vecs = Seq(
      (0L, vec(i => math.sin(i + 1).toFloat), 0),
      (1L, vec(i => math.sin(i + 1).toFloat * 1.01f + 0.001f), 0), // ~v0
      (2L, vec(i => math.cos(i * 3 + 2).toFloat), 1),
      (3L, vec(i => if (i % 2 == 0) 1f else -1f), 1),
      (4L, vec(i => math.sin(i + 1).toFloat * -1f), 0)) // antipode of v0
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def q(name: String) =
    (DedupOps.defs ++ VectorOps.defs).find(_.name == name).get.fn(spark, dir)

  test("minhash LSH finds exact and near dups, skips unrelated") {
    val pairs = q("d01_minhash_lsh_pairs")
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // exact dup: identical shingle sets
    assert(pairs.get((0L, 1L)).contains(1.0))
    // near dup: high but < 1 exact jaccard
    assert(pairs.get((0L, 2L)).exists(j => j >= 0.5))
    assert(pairs.get((1L, 2L)).exists(j => j >= 0.5))
    // unrelated doc never pairs
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("d07 edit-distance verify: exact dup at 0, metrics agree with in-memory DP") {
    val out = q("d07_editdist_verify")
      .select("a", "b", "edit_dist", "edit_sim", "is_dup")
      .as[(Long, Long, Int, Double, Boolean)].collect()
    assert(out.nonEmpty)
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    // docs 0/1 are exact text dups in the planted corpus → distance 0
    assert(byPair.get((0L, 1L)).exists(r => r._3 == 0 && r._4 == 1.0 && r._5))
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    for ((_, (a, b, dist, sim, dup)) <- byPair.take(10)) {
      val want = lev(texts(a), texts(b))
      assert(dist == want, s"pair ($a,$b): dist $dist != DP $want")
      val mx = math.max(texts(a).length, texts(b).length)
      assert(math.abs(sim - (1.0 - dist.toDouble / mx)) == 0.0)
      assert(dup == (sim >= 0.8))
    }
  }

  test("dedup components equal union-find over the verified pairs") {
    val pairs = q("d01_minhash_lsh_pairs")
      .select("a", "b").as[(Long, Long)].collect()
    // reference union-find on the driver (test-only)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) parent(find(a)) = find(b)
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => v -> find(v)).toMap
    val expectedComp = expected.map { case (v, r) =>
      v -> expected.collect { case (u, s) if s == r => u }.min }
    val got = q("d06_dedup_components")
      .select("doc_id", "component", "csize", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    assert(got.map(r => r._1 -> r._2).toMap == expectedComp)
    // exactly one canonical doc per component, equal to the min member
    val byComp = got.groupBy(_._2)
    for ((comp, members) <- byComp) {
      assert(members.count(_._4) == 1)
      assert(members.filter(_._4).head._1 == comp)
      assert(members.map(_._1).min == comp)
      assert(members.forall(_._3 == members.length))
    }
  }

  test("cdc chunks re-synchronize after an insertion (fixed windows cannot)") {
    // deterministic pseudo-random words so boundary grams occur
    val words = (0 until 60).map(i => s"w${(i * 7919) % 101}")
    val inserted = Seq("xx", "yy", "zz") ++ words
    val docs = Seq((0L, words.mkString(" ")), (1L, inserted.mkString(" ")))
      .toDF("doc_id", "text")
    val out = DedupOps.cdcChunks(docs)
      .select("doc_id", "chunk_hash", "keep", "n_tok")
      .as[(Long, Long, Boolean, Long)].collect()
    val a = out.filter(_._1 == 0L); val b = out.filter(_._1 == 1L)
    assert(a.nonEmpty && b.nonEmpty)
    assert(out.forall(c => c._4 > 0), "no empty chunks")
    val shared = a.map(_._2).toSet.intersect(b.map(_._2).toSet)
    assert(shared.nonEmpty,
      s"an inserted prefix must not destroy all downstream chunks (a=${a.length}, b=${b.length})")
    // first-occurrence-wins: every shared chunk keeps doc 0's copy
    shared.foreach { h =>
      assert(a.filter(_._2 == h).exists(_._3), s"doc 0 must keep $h")
      assert(b.filter(_._2 == h).forall(!_._3), s"doc 1 must drop $h")
    }
    // and the same re-sync under t15-style FIXED chunking would fail:
    // a 3-token shift misaligns every 10-token window
    val aTok = words.grouped(10).map(_.mkString(" ")).toSet
    val bTok = inserted.grouped(10).map(_.mkString(" ")).toSet
    assert(aTok.intersect(bTok).isEmpty, "fixed windows should NOT re-sync here")
  }

  test("simhash pairs exact dup at hamming 0") {
    val rows = q("d02_simhash_pairs")
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
    assert(rows.exists { case (a, b, h) => a == 0L && b == 1L && h == 0 })
    assert(!rows.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  test("ngram jaccard: dup pair = 1.0, near pair high, blocked join") {
    val rows = q("d03_ngram_jaccard_pairs")
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    assert(rows.exists { case (a, b, j) => a == 0L && b == 1L && j == 1.0 })
    assert(rows.exists { case (a, b, j) => a == 0L && b == 2L && j > 0.7 && j < 1.0 })
  }

  test("langid predicts en for english docs, deterministic on empty") {
    val rows = q("d04_langid")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(rows(0L) == "en" && rows(3L) == "en")
    assert(rows(4L) != null) // empty doc still gets the tie-break arm
  }

  test("winnow fingerprints: identical docs share fingerprint digests") {
    val rows = q("d05_winnow_fingerprints")
      .select("doc_id", "n_fp", "fp_min", "fp_max", "fp_xor")
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rows(0L) == rows(1L))
    assert(rows(0L) != rows(3L))
    assert(rows(4L)._1 == 1) // empty text → single whole-text hash
  }

  test("brute knn: v1 is v0's top neighbor, antipode ranks last") {
    val rows = q("v01_knn_brute")
      .select("q_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    val v0 = rows.filter(_._1 == 0L).sortBy(_._3).map(_._2)
    assert(v0.head == 1L)   // nearly identical vector
    assert(v0.last == 4L)   // cosine -1 antipode
  }

  test("label stats cover all labels with positive norms") {
    val rows = q("v02_label_stats")
      .select("label", "n", "avg_norm").as[(Int, Long, Double)].collect()
    assert(rows.map(_._1).toSet == Set(0, 1))
    assert(rows.forall(_._3 > 0))
  }

  test("lsh knn returns subset of brute-force results with same sims") {
    val brute = q("v01_knn_brute")
      .select("q_id", "vec_id", "sim").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val lsh = q("v03_knn_lsh")
      .select("q_id", "vec_id", "sim").as[(Long, Long, Double)].collect()
    // every LSH hit's exact sim matches the brute-force sim when present
    for ((qid, vid, sim) <- lsh; bs <- brute.get((qid, vid)))
      assert(math.abs(bs - sim) < 1e-12)
  }
  test("ivf knn: well-formed ranks, candidates from probed lists only") {
    val sf = "/root/testdata/sf0.001"
    val rows = VectorOps.defs.find(_.name == "v05_knn_ivf").get.fn(spark, sf)
      .select("q_id", "vec_id", "list_id", "sim", "rank")
      .as[(Long, Long, Long, Double, Int)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty && byQ.forall(_._2.length <= 5))
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1 to sorted.length))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq) // sims desc
      assert(sorted.map(_._3).toSet.size <= 2) // nprobe = 2 lists
    }
    // centroid ids are real vectors: every list id is one of the 8 seeds
    assert(rows.map(_._3).toSet.subsetOf((100L to 107L).toSet))
  }

  test("v08 int8 quantization keeps cosine ~1 with small error") {
    val rows = VectorOps.defs.find(_.name == "v08_int8_quant_audit").get
      .fn(spark, "/root/testdata/sf0.001")
      .select("amax", "cos_keep", "mse").as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // int8 symmetric quantization: cosine degradation is tiny, error
    // bounded by (amax/254)² per component
    assert(rows.forall { case (amax, cos, mse) =>
      amax > 0 && cos > 0.999 && mse >= 0 &&
        mse <= math.pow(amax / 254.0, 2) * 1.0001
    }, rows.take(3).mkString(","))
  }

  test("v09 pq-adc: well-formed ranking with positive recall vs brute force") {
    val sf01 = "/root/testdata/sf0.001"
    val adc = VectorOps.defs.find(_.name == "v09_pq_adc_knn").get.fn(spark, sf01)
      .select("q_id", "vec_id", "adc_d2", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val byQ = adc.groupBy(_._1)
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq) // asc distance
      assert(sorted.forall(_._3 >= 0))
    }
    // 2-bit-per-subspace codes are very lossy, but top-5 ADC should
    // still overlap the exact top-5 for SOME probes (sanity, not a
    // quality bar — quality tuning is k/M choice, out of scope here)
    val brute = VectorOps.defs.find(_.name == "v01_knn_brute").get.fn(spark, sf01)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val overlap = byQ.map { case (q, g) =>
      g.map(_._2).toSet.intersect(brute.getOrElse(q, Set.empty)).size
    }.sum
    assert(overlap > 0, "ADC ranking should recover at least some exact neighbors")
  }

  test("v10 mmr: three distinct picks per probe, first pick = exact top-1") {
    val sf01 = "/root/testdata/sf0.001"
    val mmr = VectorOps.defs.find(_.name == "v10_mmr_rerank").get.fn(spark, sf01)
      .select("q_id", "vec_id", "mmr_rank").as[(Long, Long, Int)].collect()
    val byQ = mmr.groupBy(_._1)
    assert(byQ.size == 10 && byQ.values.forall(g =>
      g.length == 3 && g.map(_._2).distinct.length == 3))
    val top1 = VectorOps.defs.find(_.name == "v01_knn_brute").get.fn(spark, sf01)
      .filter(col("rank") === 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    for ((q, g) <- byQ)
      assert(g.find(_._3 == 1).map(_._2) == top1.get(q),
        s"probe $q: MMR rank 1 must be the relevance top-1")
  }

  test("v11 semdedup: keep decisions match a per-list greedy replay") {
    val sfd = "/root/testdata/sf0.001"
    val out = VectorOps.defs.find(_.name == "v11_semdedup_keep").get.fn(spark, sfd)
      .select("vec_id", "list_id", "ccos", "kept")
      .as[(Long, Long, Double, Boolean)].collect()
    val n = graft.Tables.embeddings(spark, sfd).count()
    assert(out.length == n, "every vector gets a keep/drop decision")
    assert(out.exists(!_._4), "tau=0.3 must drop something on this corpus")
    assert(out.count(_._4) > out.length / 2, "most of the corpus survives")
    // replay the paper's rule per list in memory: drop x iff some
    // earlier point (asc ccos, vec_id) has cosine >= tau with x
    val embs = graft.Tables.embeddings(spark, sfd)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((_, members) <- out.groupBy(_._2)) {
      val ordered = members.sortBy(m => (m._3, m._1))
      for ((m, i) <- ordered.zipWithIndex) {
        val expectDrop = ordered.take(i).exists(p => cos(embs(p._1), embs(m._1)) >= 0.3)
        assert(m._4 == !expectDrop, s"vec ${m._1}: kept=${m._4}, greedy says ${!expectDrop}")
      }
    }
  }

  test("v12 nprobe sweep: recall and scan cost both rise monotonically") {
    val rows = SparkEntry.queries("v12_nprobe_recall")(spark, sf)
      .orderBy(col("n_probe"))
      .select("n_probe", "mean_recall", "mean_candidates")
      .as[(Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 <= b._2 },
      s"recall must not drop as nprobe grows: ${rows.toSeq}")
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 < b._3 },
      s"scan cost must grow with nprobe: ${rows.toSeq}")
    assert(rows.last._2 > rows.head._2, "widening the probe set must help recall here")
  }

  test("kmeans-trained ivf: total assignment, consistent sizes, training moves centroids") {
    val sf = "/root/testdata/sf0.001"
    val n = graft.Tables.embeddings(spark, sf).count()
    val rows = VectorOps.defs.find(_.name == "v07_kmeans_ivf_train").get.fn(spark, sf)
      .select("vec_id", "list_id", "csize", "c_norm")
      .as[(Long, Long, Long, Double)].collect()
    // every vector is assigned exactly once and sizes add up
    assert(rows.length == n && rows.map(_._1).distinct.length == n)
    val byList = rows.groupBy(_._2)
    assert(byList.forall { case (_, g) => g.forall(_._3 == g.length) })
    assert(byList.values.map(_.length.toLong).sum == n)
    assert(rows.forall(_._4 > 0))
    // trained centroids are means, not the seed embeddings: norms differ
    val seedNorms = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(100, 107))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", expr("sqrt(aggregate(e, 0D, (a, x) -> a + x * x))"))
      .select("vec_id", "nrm").as[(Long, Double)].collect().toMap
    val trainedNorms = rows.groupBy(_._2).map { case (l, g) => l -> g.head._4 }
    assert(trainedNorms.exists { case (l, nm) =>
      seedNorms.get(l).exists(sn => math.abs(sn - nm) > 1e-9) })
  }
}
