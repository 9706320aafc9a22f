package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Single-node replays for the round-5 additions: BM25 retrieval (t37),
  * stratified sampling (t38), reciprocal-rank fusion (v23), the JL
  * sign-projection audit (v24), and c-TF-IDF cluster labels (v25).
  * Each test recomputes the full expected answer in plain Scala —
  * every IEEE operation in the same order as the Spark expression —
  * and compares exactly, the same bar as the DuckDB oracle.
  */
class Round5OpsSpec extends GraftSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  private def toks(text: String): Seq[String] =
    text.split("\\s+").toSeq.filter(_.nonEmpty)

  private lazy val docs: Seq[(Long, String, String, Long)] =
    Tables.documents(spark, sf).select("doc_id", "text", "lang", "n_chars")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private lazy val vecs: Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().toSeq
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("t37: BM25 top-10 equals an exact single-node replay") {
    val tf = docs.flatMap { case (id, text, _, _) =>
      toks(text).groupBy(identity).map { case (t, g) => (id, t, g.size.toLong) }
    }
    val dl = tf.groupBy(_._1).map { case (id, g) => id -> g.map(_._3).sum }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val nDocs = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nDocs
    val stop = Set("the", "a", "of", "and", "to", "in")
    val qTerms = df.toSeq.filterNot(t => stop(t._1))
      .sortBy { case (t, d) => (-d, t) }.take(5).toMap
    val expected = tf.filter(r => qTerms.contains(r._2)).map {
      case (id, t, f) =>
        val dfd = qTerms(t).toDouble
        val idf = (nDocs.toDouble - dfd + 0.5) / (dfd + 0.5)
        val tfd = f.toDouble
        val dld = dl(id).toDouble
        val score = idf * ((tfd * 2.2) / (tfd + 1.2 * (0.25 + 0.75 * (dld / avgdl))))
        (t, id, f, dl(id), score)
    }.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      g.sortBy { case (_, id, _, _, sc) => (-sc, id) }.take(10).zipWithIndex
        .map { case ((_, id, f, d, sc), i) => (t, i + 1, id, f, d, sc) }
    }.sortBy(r => (r._1, r._2))

    val got = SparkEntry.queries("t37_bm25_topk")(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got == expected)
  }

  test("t38: stratified sample equals an NTILE + md5-rank replay") {
    val expected = docs.groupBy(_._3).toSeq.flatMap { case (lang, g) =>
      val sorted = g.sortBy(r => (r._4, r._1))
      val n = sorted.size
      val base = n / 4; val rem = n % 4
      // NTILE(4): first `rem` buckets get base+1 rows
      val quart = sorted.zipWithIndex.map { case (r, i) =>
        val cut1 = (base + 1) * rem
        val q = if (i < cut1) i / (base + 1) + 1
          else (i - cut1) / base + rem + 1
        (r._1, lang, q, r._4)
      }
      quart.groupBy(_._3).toSeq.flatMap { case (q, rows) =>
        val k = math.ceil(rows.size / 10.0).toLong
        rows.sortBy(r => (md5hex(r._1.toString), r._1)).take(k.toInt)
          .map(r => (lang, q, r._1, r._4))
      }
    }.sortBy(r => (r._1, r._2, r._3))

    val got = SparkEntry.queries("t38_stratified_sample")(spark, sf)
      .collect().toSeq
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got == expected)
    // each stratum contributes ~10%: global fraction stays near 0.1
    assert(got.size >= docs.size / 10 && got.size <= docs.size / 10 + 16)
  }

  private def signBits(v: Array[Double], w: Int): Long =
    (0 until 32).foldLeft(0L) { (acc, i) =>
      acc + (if (v(w * 32 + i) < 0.0) 1L << i else 0L)
    }

  test("v23: RRF fusion equals replayed cosine + hamming rank lists") {
    val probes = vecs.filter(_._1 < 10)
    def cosRanks(q: (Long, Array[Double])): Seq[((Long, Long), Int)] =
      vecs.filter(_._1 != q._1)
        .map(c => (c._1, dot(c._2, q._2) / (math.sqrt(dot(q._2, q._2)) * math.sqrt(dot(c._2, c._2)))))
        .sortBy { case (id, sim) => (-sim, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => ((q._1, id), i + 1) }
    def hamRanks(q: (Long, Array[Double])): Seq[((Long, Long), Int)] = {
      val qw = (signBits(q._2, 0), signBits(q._2, 1))
      vecs.filter(_._1 != q._1)
        .map { c =>
          val h = java.lang.Long.bitCount(signBits(c._2, 0) ^ qw._1) +
            java.lang.Long.bitCount(signBits(c._2, 1) ^ qw._2)
          (c._1, h)
        }
        .sortBy { case (id, h) => (h, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => ((q._1, id), i + 1) }
    }
    val cr = probes.flatMap(cosRanks).toMap
    val hr = probes.flatMap(hamRanks).toMap
    val expected = (cr.keySet ++ hr.keySet).toSeq.map { k =>
      val rrf = cr.get(k).map(r => 1.0 / (60.0 + r.toDouble)).getOrElse(0.0) +
        hr.get(k).map(r => 1.0 / (60.0 + r.toDouble)).getOrElse(0.0)
      (k._1, k._2, cr.get(k), hr.get(k), rrf)
    }.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (_, id, _, _, rrf) => (-rrf, id) }.take(10).zipWithIndex
        .map { case ((q, id, c, h, rrf), i) => (q, id, c, h, rrf, i + 1) }
    }.sortBy(r => (r._1, r._6))

    val got = SparkEntry.queries("v23_hybrid_rrf")(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getDouble(4), r.getInt(5)))
    assert(got == expected)
  }

  test("v24: JL projection audit equals an exact replay, distortion bounded") {
    val signs = Array.tabulate(16, 64) { (j, i) =>
      if (Math.floorMod(graft.functions.SketchKernels.mix(8192L + j * 64L + i), 2L) == 0L)
        -1.0 else 1.0
    }
    val probes = vecs.filter(_._1 < 10)
      .map { case (id, v) => (id, v, signs.map(row => dot(v, row))) }
    val expected = (for {
      (q1, e1, p1) <- probes; (q2, e2, p2) <- probes if q1 < q2
    } yield {
      val c64 = dot(e1, e2) / (math.sqrt(dot(e1, e1)) * math.sqrt(dot(e2, e2)))
      val c16 = dot(p1, p2) / (math.sqrt(dot(p1, p1)) * math.sqrt(dot(p2, p2)))
      (q1, q2, c64, c16, c16 - c64)
    }).sortBy(r => (r._1, r._2))

    val got = SparkEntry.queries("v24_jl_projection_audit")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got == expected)
    assert(got.size == 45)
    // 16-d sign projections keep cosine within a loose JL band (the
    // corpus' observed max distortion is ~0.64 — the audit exists
    // precisely to surface this before committing to 16 dims)
    assert(got.map(r => math.abs(r._5)).max < 0.8)
  }

  test("v25: c-TF-IDF labels equal a quantizer + token replay") {
    val cents = vecs.filter(v => v._1 >= 100 && v._1 <= 107)
    val assign = vecs.map { case (id, v) =>
      val best = cents
        .map(c => (c._1, dot(v, c._2) / (math.sqrt(dot(v, v)) * math.sqrt(dot(c._2, c._2)))))
        .sortBy { case (cid, sim) => (-sim, cid) }.head._1
      id -> best
    }.toMap
    val ctf = docs.filter(d => assign.contains(d._1)).flatMap {
      case (id, text, _, _) => toks(text).map(t => (assign(id), t))
    }.groupBy(identity).map { case ((l, t), g) => (l, t, g.size.toLong) }.toSeq
    val cdf = ctf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val expected = ctf.map { case (l, t, f) =>
      (l, t, f, cdf(t), f.toDouble * 8.0 / cdf(t).toDouble)
    }.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (_, t, _, _, sc) => (-sc, t) }.take(5).zipWithIndex
        .map { case ((l, t, f, d, sc), i) => (l, i + 1, t, f, d, sc) }
    }.sortBy(r => (r._1, r._2))

    val got = SparkEntry.queries("v25_cluster_labels")(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got == expected)
    // every list gets a full 5-term label
    assert(got.size == 40)
  }
}
