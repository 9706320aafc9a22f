package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Single-node replays for the round-3 additions: segment-level dedup
  * (t25), triangle stats on the near-dup graph (d10), binary Hamming
  * retrieval (v13), and audio voice-activity segmentation (mm06). Each
  * test recomputes the full expected answer in plain Scala and compares
  * exactly — the same bar as the DuckDB oracle, from an independent
  * implementation.
  */
class Round3OpsSpec extends GraftSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  private def docs(): Array[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("t25: segment dedup equals a first-occurrence-wins replay") {
    val segs = docs().flatMap { case (id, text) =>
      text.split("\\s+").filter(_.nonEmpty).grouped(8).zipWithIndex
        .map { case (g, i) => (id, i, g.mkString(" ")) }
    }
    val firstOrd = segs.groupBy(_._3).view
      .mapValues(_.map(s => s._1 * 1000000L + s._2).min).toMap
    val expected = segs.groupBy(_._1).map { case (id, ss) =>
      val kept = ss.filter(s => s._1 * 1000000L + s._2 == firstOrd(s._3))
        .sortBy(_._2)
      (id, ss.length.toLong, kept.length.toLong,
        if (kept.isEmpty) null
        else md5hex(kept.map(_._3).mkString(" ")))
    }
    val out = SparkEntry.queries("t25_segment_dedup")(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (_, nSegs, nKept, md5) = expected.find(_._1 == r.getLong(0)).get
      assert(r.getLong(1) == nSegs, s"doc ${r.getLong(0)} n_segs")
      assert(r.getLong(2) == nKept, s"doc ${r.getLong(0)} n_kept")
      assert(r.getLong(3) == nSegs - nKept, s"doc ${r.getLong(0)} n_dropped")
      assert(r.getAs[String]("kept_md5") == md5, s"doc ${r.getLong(0)} md5")
    }
    // the fixture plants near-dups, so some segments must actually dedup
    assert(out.map(_.getLong(3)).sum > 0, "corpus should contain dup segments")
  }

  test("d10: triangle counts equal brute-force enumeration of the d01 graph") {
    val edges = SparkEntry.queries("d01_minhash_lsh_pairs")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(a) intersect adj(b) if c > b) {
      // a<b<c enumerates each triangle once
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val out = SparkEntry.queries("d10_triangle_stats")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == adj.keySet)
    out.foreach { r =>
      val (id, deg) = (r.getLong(0), r.getLong(1))
      assert(deg == adj(id).size.toLong, s"node $id degree")
      assert(r.getLong(2) == triPerNode(id), s"node $id triangles")
      val cc = r.getAs[java.lang.Double]("clustering")
      if (deg < 2) assert(cc == null)
      else assert(cc == 2.0 * triPerNode(id) / (deg * (deg - 1.0)))
    }
    assert(out.map(_.getLong(2)).sum > 0, "dup cliques should close triangles")
  }

  test("v13: hamming top-5 equals a sign-bit replay") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def pack(v: Array[Float], w: Int): Long =
      (0 until 32).map(i => if (v(w * 32 + i) < 0f) 1L << i else 0L).sum
    val packed = vecs.map { case (id, v) => (id, pack(v, 0), pack(v, 1)) }
    val expected = packed.filter(_._1 < 10).flatMap { case (q, q0, q1) =>
      packed.filter(_._1 != q)
        .map { case (c, w0, w1) =>
          (q, c, java.lang.Long.bitCount(q0 ^ w0) + java.lang.Long.bitCount(q1 ^ w1))
        }
        .sortBy(t => (t._3, t._2)).take(5).zipWithIndex
        .map { case ((qq, c, h), i) => (qq, c, h, i + 1) }
    }.toSet
    val out = SparkEntry.queries("v13_hamming_knn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(out == expected)
  }

  test("t26: LM quality ratios equal a single-node bigram-LM replay") {
    val rows = docs().map { case (id, text) =>
      (id, text, md5hex(text).charAt(0) <= '2',
        text.split("\\s+").filter(_.nonEmpty))
    }
    val trainBigrams = rows.filter(_._3 == false)
      .flatMap(_._4.sliding(2).filter(_.length == 2).map(p => (p(0), p(0) + " " + p(1))))
    val c2 = trainBigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val c1 = trainBigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val v = rows.filter(_._3 == false).flatMap(_._4).distinct.length.toLong
    val expected = rows.map { case (id, _, isEval, tk) =>
      val rs = tk.sliding(2).filter(_.length == 2).map { p =>
        val big = p(0) + " " + p(1)
        v.toDouble * (c2.getOrElse(big, 0L) + 1) / (c1.getOrElse(p(0), 0L) + v)
      }.toSeq
      val ratio =
        if (rs.isEmpty) null
        else java.lang.Double.valueOf(
          rs.map(r => BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble / rs.length)
      (id, if (isEval) "eval" else "train", rs.length.toLong, ratio)
    }
    val trainRatios = expected.filter(e => e._2 == "train" && e._4 != null)
      .map(_._4.toDouble)
    val mu = trainRatios
      .map(r => BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / trainRatios.length
    val out = SparkEntry.queries("t26_lm_quality")(spark, sf).collect()
    assert(out.length == expected.length)
    out.foreach { r =>
      val (_, split, n, ratio) = expected.find(_._1 == r.getLong(0)).get
      assert(r.getString(1) == split)
      assert(r.getLong(2) == n)
      assert(r.getAs[java.lang.Double]("lm_ratio") == ratio, s"doc ${r.getLong(0)}")
      assert(r.getBoolean(4) == (ratio != null && ratio >= mu))
    }
    assert(out.count(_.getBoolean(4)) > 0, "above-mean docs must keep")
    assert(out.count(!_.getBoolean(4)) > 0, "below-mean docs must drop")
    // train text must score as more predictable than uniform on average
    val trainMean = out.filter(_.getString(1) == "train")
      .flatMap(r => Option(r.getAs[java.lang.Double]("lm_ratio"))).map(_.toDouble)
    assert(trainMean.sum / trainMean.length > 1.0)
  }

  test("d11: incremental accept/reject equals pair classification of the d01 graph") {
    val srcs = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def isNew(id: Long) = srcs(id) == "src18" || srcs(id) == "src19"
    val pairs = SparkEntry.queries("d01_minhash_lsh_pairs")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val partners = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val out = SparkEntry.queries("d11_incremental_dedup")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == srcs.keySet.filter(isNew))
    out.foreach { r =>
      val id = r.getLong(0)
      val ps = partners.getOrElse(id, Array.empty[Long])
      val nBase = ps.count(!isNew(_)).toLong
      val nEarlier = ps.count(p => isNew(p) && p < id).toLong
      assert(r.getLong(1) == nBase, s"doc $id base dups")
      assert(r.getLong(2) == nEarlier, s"doc $id earlier-new dups")
      assert(r.getBoolean(3) == (nBase == 0 && nEarlier == 0), s"doc $id accept")
    }
    assert(out.exists(!_.getBoolean(3)), "some new doc should be rejected")
    assert(out.count(_.getBoolean(3)) > out.length / 2, "most should be accepted")
  }

  test("t27: scaled scores are internally consistent and lang-centered") {
    val out = SparkEntry.queries("t27_robust_scores")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.lang.Double]("score"),
        r.getAs[java.lang.Double]("scaled"), r.getBoolean(4)))
    assert(out.length == Tables.documents(spark, sf).count())
    out.foreach { case (id, _, _, scaled, outlier) =>
      assert(outlier == (scaled != null && math.abs(scaled) > 1.5), s"doc $id")
    }
    // scaled = (score - med)/iqr must invert: per lang, the count of
    // negative scaled values equals the count of scores below the median
    for ((lang, rows) <- out.groupBy(_._2)) {
      val scores = rows.flatMap(r => Option(r._3)).map(_.toDouble).sorted
      val n = scores.length
      val pos = 0.5 * (n - 1)
      val med = scores(pos.toInt) +
        (pos - pos.toInt) * (scores(math.min(pos.toInt + 1, n - 1)) - scores(pos.toInt))
      rows.filter(_._3 != null).foreach { r =>
        if (r._4 != null)
          assert((r._4 < 0) == (r._3 < med) || r._3.toDouble == med,
            s"lang $lang doc ${r._1}: scaled sign disagrees with median side")
      }
    }
    assert(out.exists(_._5), "heavy-tailed synthetic scores should flag outliers")
  }

  test("d13: calibration buckets cover all sample pairs; dups concentrate low") {
    val out = SparkEntry.queries("d13_sketch_calibration")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // round-6 sample: the 1000 smallest-h64(doc_id) docs (absolute cap)
    val n = math.min(Tables.documents(spark, sf).count(), 1000L)
    assert(out.map(_._2).sum == n * (n - 1) / 2, "every sample pair is audited")
    // true dups exist, start in the lowest hamming bucket, and
    // concentrate there (the majority of dups; higher buckets carry at
    // most stragglers — the decay d02's hamming gate relies on)
    assert(out.map(_._3).sum > 0)
    assert(out.filter(_._3 > 0).map(_._1).min == out.map(_._1).min,
      s"lowest bucket must hold dups: ${out.mkString(", ")}")
    assert(out.head._3 * 2 > out.map(_._3).sum,
      s"dups must concentrate in the lowest bucket: ${out.mkString(", ")}")
    val dupRate = out.map(r => r._3.toDouble / r._2)
    assert(dupRate.head == dupRate.max,
      s"dup RATE must peak in the lowest bucket: ${out.mkString(", ")}")
    // mean jaccard decays with hamming distance at the curve's head
    assert(out.head._4 > out(1)._4,
      "bucket 0 must be more similar than bucket 1 on average")
  }

  test("sp10: tile pyramid equals a floor-arithmetic replay; levels conserve mass") {
    val keys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
    def px(k: Long) = ((k * 48271) % 10007) % 100 + 0.5
    def py(k: Long) = ((k * 69621) % 10007) % 100 + 0.5
    val z3 = keys.groupBy(k =>
        (math.floor(px(k) * 8 / 100).toLong, math.floor(py(k) * 8 / 100).toLong))
      .view.mapValues(_.length.toLong).toMap
    val expected = (0 to 3).flatMap { z =>
      val k = 1 << (3 - z)
      z3.groupBy { case ((tx, ty), _) => (tx / k, ty / k) }
        .map { case ((tx, ty), m) => (z, tx, ty, m.values.sum) }
    }.toSet
    val out = SparkEntry.queries("sp10_tile_pyramid")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == expected)
    // every zoom level carries the full corpus
    (0 to 3).foreach { z =>
      assert(out.filter(_._1 == z).map(_._4).sum == keys.length.toLong, s"zoom $z")
    }
    val outRows = SparkEntry.queries("sp10_tile_pyramid")(spark, sf).collect()
    outRows.foreach { r =>
      val (z, tx, ty) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(r.getDouble(4) == (tx + 0.5) * (100.0 / (1 << z)), "center_x")
      assert(r.getDouble(5) == (ty + 0.5) * (100.0 / (1 << z)), "center_y")
    }
  }

  test("q41: upsert view equals a latest-wins replay of the changelog") {
    val log = Tables.events(spark, sf)
      .select("user_id", "event_type", "value", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000,
        r.getLong(4)))
    val expected = log.groupBy(e => (e._1, e._2)).map { case ((u, t), es) =>
      val latest = es.maxBy(e => (e._4, e._5))
      (u, t, latest._3, latest._4, es.length.toLong)
    }.toSet
    val out = SparkEntry.queries("q41_upsert_latest")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out == expected)
    assert(out.toSeq.map(_._5).sum == log.length.toLong, "versions cover the log")
  }

  test("q40: recursive CTE depth histogram equals closed-form tree depths") {
    val keys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
    // customer k>=1 sits at depth floor(log2(k)) of the k->k div 2 tree;
    // k=0 is a depth-0 anchor root
    val expected = keys.map { k =>
      if (k <= 1) 0 else 63 - java.lang.Long.numberOfLeadingZeros(k)
    }.groupBy(identity).map { case (dep, ks) => (dep, ks.length.toLong) }
    val out = SparkEntry.queries("q40_recursive_hierarchy")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.map(_._2).sum == keys.length, "every customer reached once")
    assert(out.toMap == expected)
  }

  test("v14: two-stage retrieval equals prefilter+rerank replay") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def pack(v: Array[Double], w: Int): Long =
      (0 until 32).map(i => if (v(w * 32 + i) < 0d) 1L << i else 0L).sum
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val packed = vecs.map { case (id, v) => (id, v, pack(v, 0), pack(v, 1)) }
    val expected = packed.filter(_._1 < 10).flatMap { case (q, qv, q0, q1) =>
      val cand = packed.filter(_._1 != q)
        .map { case (c, cv, w0, w1) =>
          (c, cv, java.lang.Long.bitCount(q0 ^ w0) + java.lang.Long.bitCount(q1 ^ w1))
        }
        .sortBy(t => (t._3, t._1)).take(50)
      cand.map { case (c, cv, h) =>
        (c, h, dot(qv, cv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(cv, cv))))
      }.sortBy(t => (-t._3, t._1)).take(5).zipWithIndex
        .map { case ((c, h, sim), i) => (q, c, h, sim, i + 1) }
    }.toSet
    val out = SparkEntry.queries("v14_binary_rerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
      .toSet
    assert(out == expected)
  }

  test("v15: IVFPQ equals an assign+code+LUT replay") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val byId = vecs.toMap
    val cents = (100L to 107L).map(c => (c, byId(c)))
    // IVF assignment: nearest centroid by cosine, ties to lower c_id
    def listOf(v: Array[Double]): Long =
      cents.map { case (c, cv) => (c, cos(v, cv)) }
        .sortBy { case (c, s) => (-s, c) }.head._1
    val assign = vecs.map { case (id, v) => (id, listOf(v)) }.toMap
    // PQ codes: 8 subspaces x 4 centroids (vec 100-103 slices), L2 argmin
    def sub(v: Array[Double], m: Int): Array[Double] = v.slice(m * 8, m * 8 + 8)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    def codeOf(v: Array[Double], m: Int): Int =
      (0 to 3).map(pc => (pc, l2(sub(v, m), sub(byId(100L + pc), m))))
        .sortBy { case (pc, d) => (d, pc) }.head._1
    val expected = vecs.filter(_._1 < 10).flatMap { case (q, qv) =>
      val lists = cents.map { case (c, cv) => (c, cos(qv, cv)) }
        .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1).toSet
      val lut = Array.tabulate(8, 4)((m, pc) => l2(sub(qv, m), sub(byId(100L + pc), m)))
      vecs.filter { case (id, _) => id != q && lists(assign(id)) }
        .map { case (id, v) =>
          val adc = (0 until 8)
            .map(m => BigDecimal(lut(m)(codeOf(v, m)))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble
          (q, id, assign(id), adc)
        }
        .sortBy { case (_, id, _, adc) => (adc, id) }.take(5).zipWithIndex
        .map { case ((qq, id, l, adc), i) => (qq, id, l, adc, i + 1) }
    }.toSet
    val out = SparkEntry.queries("v15_ivfpq_knn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
      .toSet
    assert(out == expected)
  }

  test("v16: matryoshka recall equals a prefix-cosine replay") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def dotP(a: Array[Double], b: Array[Double], d: Int): Double = {
      var s = 0.0; var i = 0
      while (i < d) { s += a(i) * b(i); i += 1 }; s
    }
    def top5(d: Int): Map[Long, Set[Long]] =
      vecs.filter(_._1 < 10).map { case (q, qv) =>
        q -> vecs.filter(_._1 != q)
          .map { case (c, cv) =>
            (c, dotP(qv, cv, d) / (math.sqrt(dotP(qv, qv, d)) * math.sqrt(dotP(cv, cv, d))))
          }
          .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1).toSet
      }.toMap
    val full = top5(64)
    val expected = Seq(8, 16, 32).map { d =>
      val t = top5(d)
      (d, t.map { case (q, ids) => (ids intersect full(q)).size }.sum.toLong)
    }.toMap
    val out = SparkEntry.queries("v16_matryoshka_recall")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(r => (r._1, r._2)).toMap == expected)
    out.foreach(r => assert(r._3 == r._2.toDouble / 50))
    // more dims should not hurt recall on this corpus
    val byDim = out.map(r => (r._1, r._2)).toMap
    assert(byDim(32) >= byDim(8))
  }

  test("d12: no near-dup pair crosses the component split; t08's does leak") {
    val out = SparkEntry.queries("d12_leakfree_split")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docsAll = Tables.documents(spark, sf)
    assert(out.length == docsAll.count())
    val split = out.map(r => (r._1, r._4)).toMap
    val compOf = out.map(r => (r._1, r._2)).toMap
    // every member of a component shares its split
    out.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._4).distinct.length == 1)
    }
    val pairs = SparkEntry.queries("d01_minhash_lsh_pairs")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) crosses the d12 split")
      assert(compOf(a) == compOf(b), s"pair ($a,$b) not in one component")
    }
    // the naive doc-level split (t08's rule) DOES leak on this corpus —
    // that is the failure d12 exists to close
    val t08split = docsAll.select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        if (md5hex(r.getString(1)).charAt(0) <= '2') "eval" else "train")).toMap
    assert(pairs.exists { case (a, b) => t08split(a) != t08split(b) },
      "expected at least one near-dup pair to cross the naive split")
    assert(out.exists(_._4 == "eval") && out.exists(_._4 == "train"))
  }

  test("mm07: shot boundaries equal a consecutive-frame aHash replay") {
    def ahash(frame: Array[Byte]): Long = {
      val b = frame.take(60).map(x => (x & 0xff).toLong)
      val s = b.sum
      b.indices.map(i => if (b(i) * 60 > s) 1L << i else 0L).sum
    }
    val expected = docs().filter(_._1 % 3 == 2).map { case (id, text) =>
      val bytes = text.getBytes(UTF_8)
      val nf = math.max(1, bytes.length / 64)
      val hashes = (0 until nf)
        .map(i => bytes.slice(i * 64, math.min(i * 64 + 64, bytes.length)))
        .filter(_.length >= 60).map(ahash)
      val dists = hashes.sliding(2).filter(_.length == 2)
        .map(p => java.lang.Long.bitCount(p(0) ^ p(1))).toSeq
      (id, math.max(1, hashes.length).toLong,
        dists.count(_ >= 16).toLong,
        dists.count(_ >= 16).toLong + 1,
        if (dists.isEmpty) 0 else dists.max)
    }
    val out = SparkEntry.queries("mm07_shot_boundaries")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(out.toSeq.sortBy(_._1) == expected.toSeq.sortBy(_._1))
    assert(out.exists(_._3 > 0), "cuts must exist")
    assert(out.exists(t => t._2 > 1 && t._3 < t._2 - 1), "not every transition is a cut")
  }

  test("mm06: VAD segmentation equals a PCM-window replay") {
    val expected = docs().filter(_._1 % 3 == 1).map { case (id, text) =>
      val bytes = text.getBytes(UTF_8)
      val nw = math.max(1, bytes.length / 64)
      val energies = (0 until nw).map { i =>
        bytes.slice(i * 64, math.min(i * 64 + 64, bytes.length))
          .map { b => val v = (b & 0xff) - 128; v.toLong * v }.sum
      }
      val tot = energies.sum
      val voiced = energies.map(_ * nw > tot)
      var segLens = List.empty[Long]
      var cur = 0L
      voiced.foreach { v =>
        if (v) cur += 1
        else { if (cur > 0) segLens ::= cur; cur = 0 }
      }
      if (cur > 0) segLens ::= cur
      (id, nw.toLong, voiced.count(identity).toLong, segLens.length.toLong,
        if (segLens.isEmpty) 0L else segLens.max)
    }
    val out = SparkEntry.queries("mm06_audio_vad")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq.sortBy(_._1) == expected.toSeq.sortBy(_._1))
    assert(out.exists(_._4 >= 1), "some audio file should have voiced segments")
  }
}
