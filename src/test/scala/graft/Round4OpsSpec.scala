package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Single-node replays for the round-4 additions: the Bloom dedup
  * pre-filter (d14), canonical selection per near-dup cluster (d15),
  * boilerplate chunk detection (t28), and int8 retrieval (v17). Each
  * test recomputes the full expected answer in plain Scala and
  * compares exactly — the same bar as the DuckDB oracle, from an
  * independent implementation.
  */
class Round4OpsSpec extends GraftSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  private def chunksOf(text: String): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).grouped(8)
      .map(g => md5hex(g.mkString(" "))).toSeq

  private def h64(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("d14: bloom flags and false-positive counts equal a bitset replay") {
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val isNew = (src: String) => src == "src18" || src == "src19"
    val baseChunks = rows.filterNot(r => isNew(r._3)).flatMap(r => chunksOf(r._2))
    val bloom = new java.util.BitSet(16384)
    for (dg <- baseChunks; i <- 0 until 4)
      bloom.set((h64(s"$dg#$i") % 16384).toInt)
    val baseSet = baseChunks.toSet
    def maybe(dg: String): Boolean =
      (0 until 4).forall(i => bloom.get((h64(s"$dg#$i") % 16384).toInt))

    val expected = rows.filter(r => isNew(r._3)).map { case (id, text, _) =>
      val dgs = chunksOf(text).distinct
      val nMaybe = dgs.count(maybe)
      val nExact = dgs.count(baseSet)
      id -> ((dgs.size.toLong, nMaybe.toLong, nExact.toLong))
    }.toMap
    val out = SparkEntry.queries("d14_bloom_prefilter")(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (nc, nm, ne) = expected(r.getLong(0))
      assert(r.getLong(1) == nc && r.getLong(2) == nm && r.getLong(3) == ne &&
        r.getLong(4) == nm - ne, s"doc ${r.getLong(0)}")
    }
    // a Bloom hit can never miss a true duplicate (no false negatives)
    out.foreach(r => assert(r.getLong(2) >= r.getLong(3)))
  }

  test("d15: canonical keep equals union-find + keep-longest replay") {
    // components from the engine's own verified pair output (d01)
    val pairs = SparkEntry.queries("d01_minhash_lsh_pairs")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) { val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }

    val toks = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").count(_.nonEmpty).toLong))
    val comp = toks.map { case (id, _) => id -> find(id) }.toMap
    val best = toks.groupBy(t => comp(t._1)).view.mapValues(ms =>
      ms.minBy(t => (-t._2, t._1))._1).toMap

    val out = SparkEntry.queries("d15_canonical_keep")(spark, sf).collect()
    assert(out.length == toks.length)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == comp(id), s"doc $id component")
      assert(r.getBoolean(3) == (best(comp(id)) == id), s"doc $id keep")
    }
    // exactly one keeper per component, and some component actually drops
    assert(out.count(_.getBoolean(3)) == comp.values.toSet.size)
    assert(out.exists(r => !r.getBoolean(3)), "fixture should have dup clusters")
  }

  test("t28: boilerplate ratios equal a chunk-frequency replay") {
    val rows = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val occ = rows.flatMap { case (id, t) => chunksOf(t).map(dg => (id, dg)) }
    val df = occ.distinct.groupBy(_._2).view.mapValues(_.length).toMap
    val boiler = df.filter(_._2 >= 3).keySet
    val expected = occ.groupBy(_._1).map { case (id, os) =>
      id -> ((os.length.toLong, os.count(o => boiler(o._2)).toLong))
    }
    val out = SparkEntry.queries("t28_boilerplate_chunks")(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (n, nb) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == nb, s"doc ${r.getLong(0)}")
      assert(r.getDouble(3) == nb.toDouble / n)
    }
    assert(out.exists(_.getLong(2) > 0), "fixture should contain boilerplate")
  }

  test("v17: int8 ranking equals a single-node quantized-cosine replay") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def quant(v: Array[Double]): Array[Long] = {
      val amax = v.map(math.abs).max
      // HALF_UP away from zero, matching Spark/DuckDB round() — Java
      // Math.round is floor(x+0.5), which differs on negative .5 ties
      v.map { x =>
        val y = x * (127.0 / amax)
        (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
      }
    }
    val q = vecs.map { case (id, v) => id -> quant(v) }.toMap
    def cos8(a: Array[Long], b: Array[Long]): Double = {
      def dot(x: Array[Long], y: Array[Long]): Long =
        x.zip(y).map { case (u, v) => u * v }.sum
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    }
    val expected = (for ((qid, qv) <- q.toSeq if qid < 10) yield {
      val top = q.toSeq.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos8(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(5)
      top.zipWithIndex.map { case ((cid, s), i) => (qid, cid) -> ((s, i + 1)) }
    }).flatten.toMap
    val out = SparkEntry.queries("v17_int8_knn")(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (s, rank) = expected((r.getLong(0), r.getLong(1)))
      assert(r.getDouble(2) == s && r.getInt(3) == rank,
        s"probe ${r.getLong(0)} cand ${r.getLong(1)}")
    }
  }

  test("t29: duplicated-span tiers equal a sliding-gram replay") {
    val rows = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    def grams(tk: Array[String], n: Int): Set[String] =
      if (tk.length < n) Set.empty
      else tk.sliding(n).map(_.mkString(" ")).toSet
    val tiers = Seq(4, 8, 16)
    // gram -> set of docs, per tier; dup = present in >= 2 docs
    val expected = rows.map { case (id, _) => id ->
      scala.collection.mutable.Map(tiers.map(n => n -> 0L): _*) }.toMap
    for (n <- tiers) {
      val byGram = scala.collection.mutable.Map.empty[String, Set[Long]]
      for ((id, tk) <- rows; g <- grams(tk, n))
        byGram(g) = byGram.getOrElse(g, Set.empty) + id
      val dup = byGram.filter(_._2.size >= 2).keySet
      for ((id, tk) <- rows)
        expected(id)(n) = grams(tk, n).count(dup).toLong
    }
    val out = SparkEntry.queries("t29_dup_span_tiers")(spark, sf).collect()
    assert(out.length == rows.length)
    out.foreach { r =>
      val e = expected(r.getLong(0))
      assert(r.getLong(1) == e(4) && r.getLong(2) == e(8) && r.getLong(3) == e(16),
        s"doc ${r.getLong(0)}")
      val want = if (e(16) > 0) 16 else if (e(8) > 0) 8 else if (e(4) > 0) 4 else 0
      assert(r.getInt(4) == want, s"doc ${r.getLong(0)} max tier")
    }
    // tier monotonicity: a doc with a shared 16-gram has shared 8/4-grams
    out.foreach { r =>
      if (r.getLong(3) > 0) assert(r.getLong(2) > 0 && r.getLong(1) > 0)
    }
    assert(out.exists(_.getInt(4) == 16), "fixture should contain long dup spans")
  }

  test("v18: IVF load factors equal a nearest-centroid counting replay") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val cents = vecs.filter(v => v._1 >= 100 && v._1 <= 107)
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    for ((_, v) <- vecs) {
      val best = cents.map { case (cid, c) =>
        (cid, dot(v, c) / (math.sqrt(dot(v, v)) * math.sqrt(dot(c, c))))
      }.minBy { case (cid, s) => (-s, cid) }._1
      counts(best) = counts.getOrElse(best, 0L) + 1
    }
    val out = SparkEntry.queries("v18_ivf_balance")(spark, sf).collect()
    assert(out.length == counts.size)
    val total = counts.values.sum
    out.foreach { r =>
      val n = counts(r.getLong(0))
      assert(r.getLong(1) == n, s"list ${r.getLong(0)}")
      assert(r.getDouble(2) == n.toDouble * counts.size / total)
    }
  }

  test("d16: impact histogram equals a union-find + token-count replay") {
    val pairs = SparkEntry.queries("d01_minhash_lsh_pairs")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) { val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val toks = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").count(_.nonEmpty).toLong))
    val byComp = toks.groupBy { case (id, _) => find(id) }
    // min-union keeps the min id as root, so keeper ⇔ find(id) == id
    val expected = byComp.values.groupBy(_.size).map { case (csize, cls) =>
      csize.toLong -> ((cls.size.toLong,
        cls.map(_.map(_._2).sum).sum,
        cls.map(_.filter { case (id, _) => find(id) != id }.map(_._2).sum).sum))
    }
    val out = SparkEntry.queries("d16_dedup_impact")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == expected.keySet)
    var docsTotal = 0L
    out.foreach { r =>
      val (nc, toksTotal, toksRm) = expected(r.getLong(0))
      assert(r.getLong(1) == nc, s"size ${r.getLong(0)} clusters")
      assert(r.getLong(2) == r.getLong(0) * nc, "n_docs")
      assert(r.getLong(3) == (r.getLong(0) - 1) * nc, "n_removed")
      assert(r.getLong(4) == toksTotal, s"size ${r.getLong(0)} tokens_total")
      assert(r.getLong(5) == toksRm, s"size ${r.getLong(0)} tokens_removed")
      docsTotal += r.getLong(2)
    }
    // corpus-complete: histogram covers every document exactly once
    assert(docsTotal == toks.length.toLong)
    assert(out.exists(_.getLong(0) >= 2), "fixture should have dup clusters")
  }

  test("q43: per-type top users equal an exact-decimal-sum replay") {
    val rows = Tables.events(spark, sf)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val sums = rows.groupBy(r => (r._1, r._2)).map { case ((t, u), es) =>
      // Det.dsum: each addend cast to decimal(30,6) (HALF_UP), exact sum
      val s = es.map(e => BigDecimal(e._3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      (t, u, s.toDouble, es.length.toLong)
    }
    val expected = sums.groupBy(_._1).flatMap { case (t, us) =>
      us.toSeq.sortBy { case (_, u, s, _) => (-s, u) }.take(5).zipWithIndex
        .map { case ((_, u, s, n), i) => (t, i + 1) -> ((u, s, n)) }
    }
    val out = SparkEntry.queries("q43_type_top_users")(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (u, s, n) = expected((r.getString(0), r.getInt(4)))
      assert(r.getLong(1) == u && r.getDouble(2) == s && r.getLong(3) == n,
        s"${r.getString(0)} rank ${r.getInt(4)}")
    }
  }

  test("t30: dup-span removal equals a covered-position replay") {
    val rows = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val N = 16
    // gram text -> docs; dup grams appear in >= 2 docs
    val byGram = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, tk) <- rows; if tk.length >= N; g <- tk.sliding(N).map(_.mkString(" ")))
      byGram(g) = byGram.getOrElse(g, Set.empty) + id
    val dup = byGram.filter(_._2.size >= 2).keySet
    val expected = rows.map { case (id, tk) =>
      val covered = (for {
        (w, i) <- tk.sliding(N).zipWithIndex if tk.length >= N
        if dup(w.mkString(" "))
        p <- i until i + N
      } yield p).toSet
      val kept = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((tk.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
    val out = SparkEntry.queries("t30_dup_span_removal")(spark, sf).collect()
    assert(out.length == rows.length)
    out.foreach { r =>
      val (nt, nr, tc) = expected(r.getLong(0))
      assert(r.getLong(1) == nt && r.getLong(2) == nr,
        s"doc ${r.getLong(0)} counts")
      assert(r.getString(3) == tc, s"doc ${r.getLong(0)} text")
    }
    // the fixture has verbatim near-copies: some docs collapse entirely
    assert(out.exists(r => r.getLong(2) == r.getLong(1) && r.getLong(1) > 0),
      "expected fully-removed docs")
    assert(out.exists(r => r.getLong(2) == 0), "expected untouched docs")
  }

  test("t31: source report equals a per-group replay") {
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "text", "source", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    val digests = rows.groupBy(r => md5hex(r._2)).view.mapValues(_.size).toMap
    def gopherKeep(text: String): Boolean = {
      val tk = text.split("\\s+").filter(_.nonEmpty)
      val n = tk.length
      val nonspace = text.replace(" ", "").length
      val sym = tk.count(_.exists(c => "#%$@".contains(c)))
      val alpha = tk.count(_.exists(_.isLetter))
      val lines = text.split("\n", -1)
      val ell = lines.count(_.startsWith("..."))
      n >= 30 && n <= 50000 &&
        n > 0 && nonspace.toDouble / n >= 2.0 && nonspace.toDouble / n <= 12.0 &&
        sym.toDouble / n < 0.5 &&
        (lines.length == 0 || ell.toDouble / lines.length <= 0.3) &&
        alpha.toDouble / n >= 0.6
    }
    val expected = rows.groupBy(r => (r._3, r._4)).map { case (k, rs) =>
      k -> ((rs.length.toLong,
        rs.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum,
        rs.map(_._5).sum.toDouble / rs.length,
        rs.count(r => gopherKeep(r._2)).toLong,
        rs.count(r => digests(md5hex(r._2)) > 1).toLong))
    }
    val out = SparkEntry.queries("t31_source_report")(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (nd, tt, mc, nk, ndup) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == nd && r.getLong(3) == tt && r.getLong(5) == nk &&
        r.getLong(6) == ndup, s"${r.getString(0)}/${r.getString(1)}")
      assert(r.getDouble(4) == mc, s"${r.getString(0)}/${r.getString(1)} mean")
    }
  }

  test("sp12: hotspot ratios equal an exact-decimal grid replay") {
    def coord(key: Long, mul: Long): Double = ((key * mul) % 10007) % 100 + 0.5
    val custs = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
    val rev = Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cellRv = scala.collection.mutable.Map.empty[(Long, Long), BigDecimal]
      .withDefaultValue(BigDecimal(0))
    val cellN = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for (c <- custs) {
      val k = (math.floor(coord(c, 48271) / 10).toLong,
        math.floor(coord(c, 69621) / 10).toLong)
      cellRv(k) += rev.getOrElse(c, BigDecimal(0))
      cellN(k) += 1
    }
    val grid = for (gx <- 0L to 9L; gy <- 0L to 9L) yield (gx, gy)
    val s = grid.map(cellRv).sum
    val out = SparkEntry.queries("sp12_revenue_hotspots")(spark, sf).collect()
    assert(out.length == 100)
    out.foreach { r =>
      val id = r.getLong(0); val k = (id / 10, id % 10)
      val nbrs = grid.filter(b =>
        math.abs(b._1 - k._1) <= 1 && math.abs(b._2 - k._2) <= 1)
      val w = nbrs.map(cellRv).sum
      assert(r.getLong(1) == cellN(k), s"cell $id count")
      assert(r.getDouble(2) == cellRv(k).toDouble, s"cell $id revenue")
      assert(r.getDouble(3) == (cellRv(k) * 100).toDouble / s.toDouble,
        s"cell $id ratio")
      assert(r.getDouble(4) == (w * 100).toDouble / (s * nbrs.length).toDouble,
        s"cell $id smooth")
      assert(r.getBoolean(5) == (r.getDouble(3) >= 1.25) &&
        r.getBoolean(6) == (r.getDouble(3) <= 0.75), s"cell $id flags")
    }
  }

  test("q44: CUSUM changepoint equals an integer prefix-sum replay") {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:00").withZone(java.time.ZoneOffset.UTC)
    val byType = Tables.events(spark, sf).select("event_type", "ts").collect()
      .map(r => (r.getString(0), fmt.format(r.getTimestamp(1).toInstant)))
      .groupBy(_._1)
    val expected = byType.map { case (t, es) =>
      val hourly = es.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val hTot = hourly.length.toLong
      val sTot = hourly.map(_._2).sum
      var pf = 0L
      val nums = hourly.zipWithIndex.map { case ((hr, c), i) =>
        pf += c
        (hr, c, hTot * pf - (i + 1) * sTot)
      }
      val (hr, c, num) = nums.minBy { case (h, _, n) => (-math.abs(n), h) }
      t -> ((hr, c, num.toDouble / hTot, num < 0))
    }
    val out = SparkEntry.queries("q44_cusum_changepoint")(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (hr, c, peak, rising) = expected(r.getString(0))
      assert(r.getString(1) == hr && r.getLong(2) == c &&
        r.getDouble(3) == peak && r.getBoolean(4) == rising,
        s"type ${r.getString(0)}")
    }
    // a changepoint exists for every type and peaks are nonzero
    assert(out.forall(r => math.abs(r.getDouble(3)) > 0))
  }

  test("t32: snapshot diff equals a two-version replay") {
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def ntok(t: String): Long = t.split("\\s+").count(_.nonEmpty).toLong
    val v1 = rows.filter(_._1 < 450).map(r => r._1 -> r).toMap
    val v2 = rows.filter(_._1 >= 50).map { case (id, src, t) =>
      val t2 = if (id % 7 == 0) t + " [rev2]" else t
      id -> ((id, src, t2))
    }.toMap
    val statuses = (v1.keySet ++ v2.keySet).toSeq.map { id =>
      val st = (v1.get(id), v2.get(id)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(a), Some(b)) => if (a._3 != b._3) "changed" else "unchanged"
      }
      val src = v1.get(id).orElse(v2.get(id)).get._2
      (src, st, v1.get(id).map(r => ntok(r._3)).getOrElse(0L),
        v2.get(id).map(r => ntok(r._3)).getOrElse(0L))
    }
    val expected = statuses.groupBy(s => (s._1, s._2)).view.mapValues(g =>
      (g.length.toLong, g.map(_._3).sum, g.map(_._4).sum)).toMap
    val out = SparkEntry.queries("t32_snapshot_diff")(spark, sf).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (n, t1, t2) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n && r.getLong(3) == t1 && r.getLong(4) == t2,
        s"${r.getString(0)}/${r.getString(1)}")
    }
    Seq("added", "removed", "changed", "unchanged").foreach(st =>
      assert(out.exists(_.getString(1) == st), s"missing status $st"))
  }

  test("v19: rerank recall dominates ADC recall; hits match a replay") {
    val out = SparkEntry.queries("v19_pq_recall_audit")(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      // rerank pool ⊇ ADC top-5, so rerank hits can only add
      assert(r.getLong(2) >= r.getLong(1), s"probe ${r.getLong(0)} monotone")
      assert(r.getDouble(3) == r.getLong(1).toDouble / 5 &&
        r.getDouble(4) == r.getLong(2).toDouble / 5)
    }
    // independent exact ground truth: brute-force L2 top-5 per probe
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) emb")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val adcOut = SparkEntry.queries("v09_pq_adc_knn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    for (q <- 0L until 10L) {
      val truth = vecs.keys.filter(_ != q).toSeq
        .map(v => (l2(vecs(v), vecs(q)), v)).sortBy(identity).take(5)
        .map(_._2).toSet
      val adcHits = adcOut(q).map(_._2).count(truth)
      assert(out.find(_.getLong(0) == q).get.getLong(1) == adcHits,
        s"probe $q adc hits")
    }
  }

  test("q45: daily bands equal an R-7 interpolation replay") {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd").withZone(java.time.ZoneOffset.UTC)
    val rows = Tables.events(spark, sf)
      .select("event_type", "ts", "value").collect()
      .map(r => ((r.getString(0), fmt.format(r.getTimestamp(1).toInstant)),
        r.getDouble(2)))
    // Spark percentile / DuckDB quantile_cont: lower + (pos-⌊pos⌋)·Δ
    def q(xs: Array[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = math.floor(pos).toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      val xs = vs.map(_._2).sorted
      k -> ((xs.length.toLong, q(xs, 0.5), q(xs, 0.95), q(xs, 0.99)))
    }
    val out = SparkEntry.queries("q45_daily_value_bands")(spark, sf).collect()
    assert(out.length == expected.size)
    // replay vs engine: ulp-level tolerance — the interpolation term
    // order inside Spark's percentile differs from the naive formula;
    // BIT-exactness is asserted engine-vs-DuckDB by the oracle gate
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b))
    out.foreach { r =>
      val (n, p50, p95, p99) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n && close(r.getDouble(3), p50) &&
        close(r.getDouble(4), p95) && close(r.getDouble(5), p99),
        s"${r.getString(0)}/${r.getString(1)}")
      assert(r.getDouble(3) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(5))
    }
  }

  test("q46: part affinity equals a basket-pair replay") {
    val op = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = op.map(_._1).distinct.length.toLong
    val pf = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = op.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    val out = SparkEntry.queries("q46_part_affinity")(spark, sf).collect()
    assert(out.length == pairs.size && pairs.nonEmpty)
    out.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(pairs(k) == r.getLong(2), s"$k n_together")
      assert(r.getLong(3) == pf(k._1) && r.getLong(4) == pf(k._2), s"$k freqs")
      assert(r.getDouble(5) ==
        (pairs(k) * nOrders).toDouble / (pf(k._1) * pf(k._2)).toDouble,
        s"$k lift")
    }
    // lift > 1 somewhere: the fixture has real co-purchase structure
    assert(out.exists(_.getDouble(5) > 1.0))
  }

  test("q47: transition matrix equals a per-user sequence replay") {
    val evs = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000L + r.getTimestamp(3).getNanos / 1000 % 1000))
    val trans = evs.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._4, e._2)).map(_._3).sliding(2)
        .collect { case Array(a, b) => (a, b) }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totals = trans.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val out = SparkEntry.queries("q47_event_transitions")(spark, sf).collect()
    assert(out.length == trans.size)
    out.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == trans(k) && r.getLong(4) == totals(k._1), s"$k")
      assert(r.getDouble(3) == trans(k).toDouble / totals(k._1), s"$k p")
    }
    // each source's outgoing probabilities sum to 1 (allowing fp dust)
    out.groupBy(_.getString(0)).foreach { case (s2, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9, s"$s2 sums")
    }
  }

  test("q48: session paths equal a gaps-and-islands replay") {
    val evs = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000L + r.getTimestamp(3).getNanos / 1000 % 1000))
    val paths = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      for (Array(a, b) <- sorted.sliding(2).collect { case s if s.length == 2 => s }) {
        if (b._4 - a._4 > 1800000000L) sessions += scala.collection.mutable.ArrayBuffer(b)
        else sessions.last += b
      }
      sessions.map(ss => (ss.take(5).map(_._3).mkString(">"), ss.length))
    }.toSeq
    val expected = paths.groupBy(_._1).view.mapValues(g =>
      (g.size.toLong, g.count(_._2 > 5).toLong))
      .filter(_._2._1 >= 10).toSeq
      .sortBy { case (p, (n, _)) => (-n, p) }.take(30)
    val out = SparkEntry.queries("q48_session_paths")(spark, sf).collect()
    assert(out.length == expected.length && expected.nonEmpty)
    out.zip(expected).foreach { case (r, (p, (n, tr))) =>
      assert(r.getString(0) == p && r.getLong(1) == n && r.getLong(2) == tr,
        s"path $p")
    }
  }

  test("v20: label agreement equals a brute-force cosine replay") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) emb",
        "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    val out = SparkEntry.queries("v20_label_agreement")(spark, sf).collect()
    assert(out.length == 50)
    out.foreach { r =>
      val q = byId(r.getLong(0))
      val top = vecs.filter(_._1 != q._1)
        .map(v => (-dot(v._2, q._2) / (math.sqrt(dot(v._2, v._2)) * math.sqrt(dot(q._2, q._2))), v._1, v._3))
        .sortBy(t => (t._1, t._2)).take(5)
      val agree = top.count(_._3 == q._3).toLong
      assert(r.getInt(1) == q._3 && r.getLong(2) == agree, s"probe ${q._1}")
      assert(r.getDouble(3) == agree.toDouble / 5 &&
        r.getBoolean(4) == (agree == 0), s"probe ${q._1} derived")
    }
  }

  test("t34: duplicate-gram mass equals a corpus-count replay") {
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(text: String): Seq[Long] = {
      val tk = text.split("\\s+").filter(_.nonEmpty)
      if (tk.length >= 8)
        tk.sliding(8).map(g => h64(g.mkString(" "))).toSeq.distinct
      else Seq(h64(text))
    }
    val pairs = rows.flatMap(r => grams(r._3).map(g => (r._2, g)))
    val gramDocs = pairs.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = pairs.groupBy(_._1).view.mapValues { ps =>
      (ps.length.toLong, ps.count(p => gramDocs(p._2) >= 2).toLong)
    }.toSeq.sortBy(_._1)
    val out = SparkEntry.queries("t34_dup_gram_mass")(spark, sf).collect()
    assert(out.length == expected.length && expected.nonEmpty)
    out.zip(expected).foreach { case (r, (src, (n, dup))) =>
      assert(r.getString(0) == src && r.getLong(1) == n && r.getLong(2) == dup,
        s"source $src")
      assert(r.getDouble(3) == dup.toDouble / n, s"source $src mass")
    }
  }

  test("v21: label centroid shift equals a decimal-mean replay") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) emb",
        "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def centroid(vs: Array[Array[Double]]): Array[Double] =
      Array.tabulate(vs.head.length) { j =>
        (vs.map(v => BigDecimal(v(j)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble) / vs.length
      }
    def fold(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byKey = vecs.groupBy(v => (v._3, v._1 % 2))
    val out = SparkEntry.queries("v21_label_centroid_shift")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val lab = r.getInt(0)
      val ev = byKey((lab, 0L)).map(_._2); val od = byKey((lab, 1L)).map(_._2)
      assert(r.getLong(1) == ev.length && r.getLong(2) == od.length, s"label $lab n")
      val (ca, cb) = (centroid(ev), centroid(od))
      assert(r.getDouble(3) == math.sqrt(fold(ca, ca)) &&
        r.getDouble(4) == math.sqrt(fold(cb, cb)), s"label $lab norms")
      assert(r.getDouble(5) ==
        fold(ca, cb) / (math.sqrt(fold(ca, ca)) * math.sqrt(fold(cb, cb))),
        s"label $lab cos")
    }
  }

  test("q49: last-touch attribution equals a per-user scan replay") {
    val evs = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getTimestamp(4).getTime * 1000L + r.getTimestamp(4).getNanos / 1000 % 1000))
    val touches = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._5, e._2))
      var lastTouch: Option[(String, Long)] = None
      sorted.flatMap { e =>
        val out = if (e._3 == "purchase") {
          val t = lastTouch match {
            case Some((tt, tus)) if e._5 - tus <= 604800000000L => tt
            case _ => "none"
          }
          Some((t, e._4))
        } else None
        if (e._3 != "purchase") lastTouch = Some((e._3, e._5))
        out
      }
    }.toSeq
    val total = touches.length.toLong
    val expected = touches.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong,
        g.map(p => BigDecimal(p._2).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble)
    }.toSeq.sortBy(_._1)
    val out = SparkEntry.queries("q49_last_touch_attribution")(spark, sf).collect()
    assert(out.length == expected.length && expected.nonEmpty)
    out.zip(expected).foreach { case (r, (tt, (n, v))) =>
      assert(r.getString(0) == tt && r.getLong(1) == n, s"touch $tt")
      assert(r.getDouble(2) == v, s"touch $tt value")
      assert(r.getDouble(3) == n.toDouble / total, s"touch $tt share")
    }
  }

  test("q50: funnel conversion equals an ordered-stage session replay") {
    val evs = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000L + r.getTimestamp(3).getNanos / 1000 % 1000))
    val sessions = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      val ss = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      for (Array(a, b) <- sorted.sliding(2).collect { case s if s.length == 2 => s }) {
        if (b._4 - a._4 > 1800000000L) ss += scala.collection.mutable.ArrayBuffer(b)
        else ss.last += b
      }
      ss
    }.toSeq
    def firstAfter(es: Seq[(Long, Long, String, Long)], tpe: String,
        after: Option[(Long, Long)]): Option[(Long, Long)] =
      es.filter(e => e._3 == tpe && after.forall(t =>
          e._4 > t._1 || (e._4 == t._1 && e._2 > t._2)))
        .map(e => (e._4, e._2)).sorted.headOption
    var (nv, nc, np) = (0L, 0L, 0L)
    sessions.foreach { ses =>
      val t1 = firstAfter(ses.toSeq, "view", None)
      if (t1.isDefined) nv += 1
      val t2 = if (t1.isDefined) firstAfter(ses.toSeq, "click", t1) else None
      if (t2.isDefined) nc += 1
      val t3 = if (t2.isDefined) firstAfter(ses.toSeq, "purchase", t2) else None
      if (t3.isDefined) np += 1
    }
    val r = SparkEntry.queries("q50_funnel_conversion")(spark, sf).collect().head
    assert(r.getLong(0) == sessions.length && r.getLong(1) == nv &&
      r.getLong(2) == nc && r.getLong(3) == np)
    assert(r.getDouble(4) == nv.toDouble / sessions.length)
    assert(nv == 0 || r.getDouble(5) == nc.toDouble / nv)
    assert(nc == 0 || r.getDouble(6) == np.toDouble / nc)
  }

  test("t35: token budget equals an R-7 percentile replay") {
    val rows = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).split("\\s+").count(_.nonEmpty)))
    def q(xs: Array[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = math.floor(pos).toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b))
    val expected = rows.groupBy(_._1).map { case (src, ds) =>
      val xs = ds.map(_._2.toDouble).sorted
      src -> ((ds.length.toLong, ds.map(_._2.toLong).sum,
        q(xs, 0.5), q(xs, 0.9), q(xs, 0.99)))
    }
    val out = SparkEntry.queries("t35_token_budget")(spark, sf).collect()
    assert(out.length == expected.size && expected.nonEmpty)
    out.foreach { r =>
      val (n, tot, p50, p90, p99) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == tot, r.getString(0))
      assert(close(r.getDouble(3), p50) && close(r.getDouble(4), p90) &&
        close(r.getDouble(5), p99), r.getString(0))
    }
  }

  test("d18: cluster-size histogram equals a union-find replay") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(text: String): Set[String] = {
      val tk = text.split("\\s+").filter(_.nonEmpty)
      if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
      else Set(text)
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- sh.indices; j <- i + 1 until sh.length) {
      val inter = (sh(i)._2 & sh(j)._2).size
      val union = sh(i)._2.size + sh(j)._2.size - inter
      if (union > 0 && inter.toDouble / union >= 0.5) {
        val (a, b) = (find(sh(i)._1), find(sh(j)._1))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
    }
    val sizes = docs.map(d => find(d._1)).groupBy(identity).values.map(_.length)
    val expected = sizes.groupBy(identity).toSeq
      .map { case (cs, g) => (cs.toLong, g.size.toLong, (cs * g.size).toLong) }
      .sortBy(_._1)
    val out = SparkEntry.queries("d18_cluster_size_histogram")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == expected, s"got ${out.toSeq} want $expected")
  }

  test("q51: conversion latency equals a per-user scan replay") {
    val evs = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000L + r.getTimestamp(3).getNanos / 1000 % 1000))
    val lats = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      var lastTouch: Option[(String, Long)] = None
      sorted.flatMap { e =>
        val out = if (e._3 == "purchase") lastTouch match {
          case Some((tt, tus)) if e._4 - tus <= 604800000000L =>
            Some((tt, e._4 - tus))
          case _ => None
        } else None
        if (e._3 != "purchase") lastTouch = Some((e._3, e._4))
        out
      }
    }.toSeq
    def q(xs: Array[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = math.floor(pos).toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    val expected = lats.groupBy(_._1).map { case (tt, g) =>
      val xs = g.map(_._2.toDouble).sorted.toArray
      tt -> ((g.size.toLong, q(xs, 0.5), q(xs, 0.9), g.map(_._2).max))
    }
    val out = SparkEntry.queries("q51_conversion_latency")(spark, sf).collect()
    assert(out.length == expected.size && expected.nonEmpty)
    out.foreach { r =>
      val (n, p50, p90, mx) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(4) == mx, r.getString(0))
      assert(close(r.getDouble(2), p50) && close(r.getDouble(3), p90),
        r.getString(0))
    }
  }

  test("t36: language mix equals a grouped-count replay") {
    val rows = Tables.documents(spark, sf)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = rows.groupBy(_._1)
    val out = SparkEntry.queries("t36_language_mix")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, lang) = (r.getString(0), r.getString(1))
      val n = bySrc(src).count(_._2 == lang).toLong
      val tot = bySrc(src).length
      val counts = bySrc(src).groupBy(_._2).view.mapValues(_.length).toMap
      val dominant = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      assert(r.getLong(2) == n && r.getDouble(3) == n.toDouble / tot,
        s"$src/$lang")
      assert(r.getBoolean(4) == (lang == dominant), s"$src/$lang dominant")
    }
  }

  test("v22: quantizer churn equals a Lloyd replay") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) emb")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def fold(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def assign(cents: Seq[(Long, Array[Double])]): Map[Long, Long] =
      vecs.map { case (id, v) =>
        id -> cents.map { case (cid, c) =>
          (-fold(v, c) / (math.sqrt(fold(v, v)) * math.sqrt(fold(c, c))), cid)
        }.sorted.head._2
      }.toMap
    def update(a: Map[Long, Long]): Seq[(Long, Array[Double])] = {
      val byList = vecs.groupBy(v => a(v._1))
      byList.toSeq.sortBy(_._1).map { case (cid, vs) =>
        cid -> Array.tabulate(vs.head._2.length) { j =>
          vs.map(v => BigDecimal(v._2(j))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vs.length
        }
      }
    }
    val seeds = vecs.filter(v => v._1 >= 100 && v._1 <= 107)
      .map(v => (v._1, v._2)).toSeq
    val a0 = assign(seeds)
    var a = a0
    for (_ <- 1 to 2) a = assign(update(a))
    val expected = a.groupBy(_._2).toSeq.map { case (list, g) =>
      (list, g.size.toLong,
        g.count { case (vid, _) => a0(vid) != list }.toLong)
    }.sortBy(_._1)
    val out = SparkEntry.queries("v22_quantizer_churn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == expected, s"got ${out.toSeq} want $expected")
  }

  test("t33: source novelty equals a first-owner replay") {
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(text: String): Set[String] = {
      val tk = text.split("\\s+").filter(_.nonEmpty)
      if (tk.length >= 8) tk.sliding(8).map(_.mkString(" ")).toSet
      else Set(text)
    }
    val bySrc = rows.groupBy(_._2).view
      .mapValues(_.flatMap(r => grams(r._3)).toSet).toMap
    val firstSrc = bySrc.toSeq.flatMap { case (s, gs) => gs.map(_ -> s) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val srcs = bySrc.keys.toSeq.sorted
    var cum = 0L
    val expected = srcs.map { s =>
      val novel = bySrc(s).count(g => firstSrc(g) == s).toLong
      cum += novel
      s -> ((bySrc(s).size.toLong, novel, cum))
    }.toMap
    val out = SparkEntry.queries("t33_source_novelty")(spark, sf).collect()
    assert(out.length == srcs.length)
    out.foreach { r =>
      val (ng, nn, c) = expected(r.getString(0))
      assert(r.getLong(1) == ng && r.getLong(2) == nn && r.getLong(4) == c,
        s"source ${r.getString(0)}")
      assert(r.getDouble(3) == nn.toDouble / ng, s"${r.getString(0)} ratio")
    }
    // the corpus has cross-source near-dups, so not every source is 100% novel
    assert(out.exists(_.getDouble(3) < 1.0))
    // the cumulative curve ends at the corpus-wide distinct gram count
    assert(out.map(_.getLong(2)).sum == rows.flatMap(r => grams(r._3)).distinct.length)
  }

  test("d17: cross-source matrix equals a pair-labeling replay") {
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = SparkEntry.queries("d01_minhash_lsh_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lab = pairs.map { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) (sa, sb) else (sb, sa), a, b)
    }
    val expected = lab.groupBy(_._1).map { case (k, ps) =>
      k -> ((ps.length.toLong,
        ps.flatMap(p => Seq(p._2, p._3)).distinct.length.toLong))
    }
    val out = SparkEntry.queries("d17_cross_source_matrix")(spark, sf).collect()
    assert(out.length == expected.size && expected.nonEmpty)
    out.foreach { r =>
      val (np, ndocs) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == np && r.getLong(3) == ndocs,
        s"${r.getString(0)}×${r.getString(1)}")
    }
  }
}
