package graft

/** Single-node replays for the third round-5 batch: term burstiness
  * (t41), collocation lift (t42), containment dedup (d19), and the
  * filtered-ANN recall audit (v27). Each test recomputes the full
  * expected answer in plain Scala — every IEEE operation in the same
  * order as the Spark expression — and compares exactly.
  */
class Round5cOpsSpec extends GraftSuite {

  private def toks(text: String): Seq[String] =
    text.split("\\s+").toSeq.filter(_.nonEmpty)

  private val stop = Set("the", "a", "of", "and", "to", "in")

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))

  private lazy val vecs: Seq[(Long, Int, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("t41: burstiness equals a three-integer-sum VMR replay") {
    val nDocs = docs.size.toDouble
    val tf = docs.flatMap { case (id, text) =>
      toks(text).groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    }
    val expected = tf.groupBy(_._1).toSeq.collect {
      case (t, g) if g.size >= 50 =>
        val df = g.size.toLong
        val s1 = g.map(_._2).sum
        val s2 = g.map(v => v._2 * v._2).sum
        val mean = s1.toDouble / nDocs
        val vmr = ((s2.toDouble / nDocs) - mean * mean) / mean
        (t, df, s1, vmr)
    }.sortBy { case (t, _, _, vmr) => (-vmr, t) }.take(20).zipWithIndex
      .map { case ((t, df, s1, vmr), i) => (i + 1, t, df, s1, vmr) }

    val got = SparkEntry.queries("t41_term_burstiness")(spark, sf)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got == expected)
  }

  test("t42: collocation lift equals a doc-set pair replay") {
    val sets = docs.map { case (id, text) => id -> toks(text).toSet }
    val df = sets.flatMap(_._2).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val top = df.toSeq.filterNot(t => stop(t._1))
      .sortBy { case (t, d) => (-d, t) }.take(20).toMap
    val n = docs.size.toLong
    val expected = (for {
      (_, s) <- sets
      a <- s if top.contains(a); b <- s if top.contains(b) && a < b
    } yield (a, b)).groupBy(identity).toSeq.map { case ((a, b), g) =>
      val (dfa, dfb, dfab) = (top(a), top(b), g.size.toLong)
      (a, b, dfa, dfb, dfab,
        (n * dfab).toDouble / (dfa * dfb).toDouble)
    }.sortBy(r => (r._1, r._2))

    val got = SparkEntry.queries("t42_collocation_lift")(spark, sf)
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got == expected)
  }

  test("d19: containment pairs equal a brute-force shingle replay") {
    val sh = docs.map { case (id, text) =>
      val tk = toks(text)
      val set =
        if (tk.size >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
        else Set(text)
      id -> set
    }
    val expected = (for {
      (a, sa) <- sh; (b, sb) <- sh if a != b
      inter = sa.count(sb.contains)
      c = inter.toDouble / sa.size.toDouble if c >= 0.8
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong, c))
      .sortBy(r => (r._1, r._2))

    val got = SparkEntry.queries("d19_containment_pairs")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got == expected)
    // containment is directional: every exact-duplicate pair appears twice
    val dups = got.filter(r => r._6 == 1.0 && r._3 == r._4 && r._4 == r._5)
    assert(dups.forall(r => got.exists(o => o._1 == r._2 && o._2 == r._1)))
  }

  test("d20: dedup agreement equals brute-force lexical + semantic replays") {
    // lexical: all-pairs exact Jaccard >= 0.5 over word-3-gram shingles
    // (d01's LSH set is oracle-proven equal to this brute-force set)
    val sh = docs.map { case (id, text) =>
      val tk = toks(text)
      id -> (if (tk.size >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
             else Set(text))
    }
    val lex = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = sa.count(sb.contains)
      union = sa.size + sb.size - inter if union > 0
      j = inter.toDouble / union.toDouble if j >= 0.5
    } yield (a, b)).toSet
    // semantic: IVF-list-blocked cosine > 0.3 (v04's set)
    val cents = vecs.filter(v => v._1 >= 100 && v._1 <= 107)
    val assign = vecs.map { case (id, _, v) =>
      id -> cents.map(c => (c._1, cos(v, c._3)))
        .sortBy { case (cid, sim) => (-sim, cid) }.head._1
    }.toMap
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val aseq = assign.toSeq
    val sem = (for {
      (a, la) <- aseq; (b, lb) <- aseq
      if a < b && la == lb && cos(byId(a), byId(b)) > 0.3
    } yield (a, b)).toSet
    val expected = Seq(
      "both" -> (lex & sem).size.toLong,
      "lexical_only" -> (lex -- sem).size.toLong,
      "semantic_only" -> (sem -- lex).size.toLong,
    ).filter(_._2 > 0).sortBy(_._1)

    val got = SparkEntry.queries("d20_dedup_agreement")(spark, sf)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(got == expected)
  }

  test("sp13: hex binning equals an axial cube-rounding replay") {
    val keys = Tables.customer(spark, sf).select("c_custkey")
      .collect().toSeq.map(_.getLong(0))
    def hexOf(key: Long): (Long, Long) = {
      val x = ((key * 48271) % 10007) % 100 + 0.5
      val y = ((key * 69621) % 10007) % 100 + 0.5
      val qf = (math.sqrt(3.0) / 3.0 * x - y / 3.0) / 5.0
      val rf = (2.0 * y / 3.0) / 5.0
      val yf = -qf - rf
      val (rq, ry, rr) =
        (math.floor(qf + 0.5), math.floor(yf + 0.5), math.floor(rf + 0.5))
      val (dq, dy, dr) =
        (math.abs(rq - qf), math.abs(ry - yf), math.abs(rr - rf))
      val hq = if (dq > dy && dq > dr) -ry - rr else rq
      val hr = if (!(dq > dy && dq > dr) && !(dy > dr)) -rq - ry else rr
      (hq.toLong, hr.toLong)
    }
    val expected = keys.map(hexOf).groupBy(identity).toSeq.map {
      case ((q, r), g) =>
        (q, r, g.size.toLong,
          5.0 * (math.sqrt(3.0) * (q.toDouble + r.toDouble / 2.0)),
          5.0 * (1.5 * r.toDouble))
    }.sortBy(t => (t._1, t._2))

    val got = SparkEntry.queries("sp13_hex_hotspots")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got == expected)
    // every customer lands in exactly one hexagon
    assert(got.map(_._3).sum == keys.size.toLong)
  }

  test("v28: retrieval eval equals a brute + hyperplane-bucket replay") {
    val hp: Array[Array[Double]] = Array.tabulate(8, 64) { (p, i) =>
      (Math.floorMod(graft.functions.SketchKernels.mix(p * 64L + i + 1L), 2001L)
        - 1000L).toDouble / 1000.0
    }
    def bucketOf(v: Array[Double]): Long =
      (0 until 8).map(p => if (dot(v, hp(p)) > 0) 1L << p else 0L).sum
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val buckets = vecs.map(v => v._1 -> bucketOf(v._3)).toMap
    val probes = vecs.filter(_._1 < 10).sortBy(_._1)
    val expected = probes.map { case (qId, _, qEmb) =>
      val gt = vecs.filter(_._1 != qId)
        .map { case (id, _, v) => (id, cos(qEmb, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      val cand = vecs.filter(v => v._1 != qId && buckets(v._1) == buckets(qId))
      val l20 = cand.map { case (id, _, v) => (id, cos(qEmb, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => (id, i + 1) }
      val rel = l20.filter(r => gt.contains(r._1))
      val first = rel.map(_._2).minOption
      (qId, cand.size.toLong, first,
        first.map(r => 1.0 / r.toDouble).getOrElse(0.0),
        rel.count(_._2 <= 5).toLong, rel.size.toLong)
    }

    val got = SparkEntry.queries("v28_retrieval_eval")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    assert(got == expected)
  }

  test("v27: filtered-ANN recall equals a pre/post-filter replay") {
    val probes = vecs.filter(_._1 < 10)
    val expected = probes.sortBy(_._1).map { case (qId, qLabel, qEmb) =>
      val ranked = vecs.filter(_._1 != qId)
        .map { case (id, lab, v) => (id, lab, cos(qEmb, v)) }
        .sortBy { case (id, _, sim) => (-sim, id) }
      val pre = ranked.filter(_._2 == qLabel).take(5).map(_._1).toSet
      val post = ranked.take(20).filter(_._2 == qLabel).take(5).map(_._1).toSet
      val hit = (pre & post).size.toLong
      (qId, qLabel, pre.size.toLong, post.size.toLong, hit,
        hit.toDouble / pre.size.toDouble)
    }

    val got = SparkEntry.queries("v27_filtered_knn")(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got == expected)
    // the audit is non-trivial only if some probe loses recall post-filter
    assert(got.map(_._6).min <= 1.0)
  }
}
