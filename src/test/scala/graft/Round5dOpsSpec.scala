package graft

import java.math.{BigDecimal => JBD, MathContext}
import java.security.MessageDigest

/** Single-node replays for the fourth round-5 batch: the A/B-test card
  * (q55), the user-concentration Gini card (q56), the source-affinity
  * matrix (t43), and the embedding-isotropy audit (v29). Each test
  * recomputes the full expected answer in plain Scala — every IEEE
  * operation in the same order as the Spark expression — and compares
  * exactly.
  */
class Round5dOpsSpec extends GraftSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Mirror of Det.dsum: round each addend to 6 decimals (HALF_UP, the
    * Spark decimal-cast policy), sum exactly, back to double. */
  private def dsum(xs: Iterable[Double]): Double =
    xs.foldLeft(JBD.ZERO)((acc, x) =>
      acc.add(new JBD(x, MathContext.UNLIMITED)
        .setScale(6, java.math.RoundingMode.HALF_UP))).doubleValue

  private lazy val events: Seq[(Long, String)] =
    Tables.events(spark, sf).select("user_id", "event_type")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "source", "text")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def toks(text: String): Seq[String] =
    text.split("\\s+").toSeq.filter(_.nonEmpty)

  private val stop = Set("the", "a", "of", "and", "to", "in")

  test("q55: A/B card equals a per-user hash-split replay") {
    val perUser = events.groupBy(_._1).toSeq.map { case (u, g) =>
      val armA = "01234567".contains(md5hex(u.toString).charAt(0))
      val conv = if (g.exists(_._2 == "purchase")) 1L else 0L
      (armA, conv)
    }
    val nA = perUser.count(_._1).toLong
    val nB = perUser.size - nA
    val cA = perUser.filter(_._1).map(_._2).sum
    val cB = perUser.filterNot(_._1).map(_._2).sum
    val rateA = cA.toDouble / nA
    val rateB = cB.toDouble / nB
    val pooled = (cA + cB).toDouble / (nA + nB)
    val se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / nA + 1.0 / nB))
    // zero pooled variance (the sf0.001 fixture: every user converts)
    // degrades to a NULL z, mirroring the query's NULLIF guard
    val z = if (se == 0.0) None else Some((rateA - rateB) / se)
    val got = SparkEntry.queries("q55_ab_test_card")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    assert(got == Seq((nA, nB, cA, cB, rateA, rateB, rateA - rateB, z)))
    // the hash split is roughly balanced (within 3σ of a fair coin)
    assert(math.abs(nA - nB) < 3 * math.sqrt((nA + nB).toDouble))
  }

  test("q56: Gini card equals an explicit sorted-rank replay") {
    val counts = events.groupBy(_._1).map(_._2.size.toLong).toSeq.sorted
    val u = counts.size.toLong
    val total = counts.sum
    val srx = counts.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gini = (2 * srx - (u + 1) * total).toDouble / (u * total).toDouble
    val top10 = counts.reverse.take((u / 10).toInt).sum
    val top1 = counts.reverse.take((u / 100).toInt).sum
    val got = SparkEntry.queries("q56_user_concentration")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got == Seq((u, total, gini,
      top10.toDouble / total, top1.toDouble / total)))
    // a count distribution with any spread has positive concentration
    assert(got.head._3 >= 0.0 && got.head._3 < 1.0)
  }

  test("t43: source affinity equals an integer-profile cosine replay") {
    val termCounts = docs.flatMap(d => toks(d._3)).filterNot(stop)
      .groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val vocab = termCounts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(50).map(_._1).toSet
    val prof = docs.flatMap(d => toks(d._3).filter(vocab).map((d._2, _)))
      .groupBy(identity).map { case ((src, t), g) => ((src, t), g.size.toLong) }
    val bySrc = prof.groupBy(_._1._1)
      .map { case (s, m) => s -> m.map { case ((_, t), c) => (t, c) }.toMap }
    val norms = bySrc.map { case (s, m) => s -> m.values.map(c => c * c).sum }
    val sources = norms.keys.toSeq.sorted
    val expected = (for {
      a <- sources; b <- sources if a < b
      dot = bySrc(a).map { case (t, c) => c * bySrc(b).getOrElse(t, 0L) }.sum
    } yield (a, b, dot,
      dot.toDouble / (math.sqrt(norms(a).toDouble) * math.sqrt(norms(b).toDouble))))
      .sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("t43_source_affinity")(spark, sf)
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
    // cosines are valid similarities
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("v29: isotropy card equals the sufficient-statistics identity") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val n = vecs.size.toLong
    val nrms = vecs.map(v => math.sqrt(dot(v._2, v._2)))
    val meanNorm = dsum(nrms) / n
    val dims = vecs.head._2.length
    val sd = (0 until dims).map(d =>
      dsum(vecs.zip(nrms).map { case ((_, v), nr) => v(d) / nr }))
    val s2 = dsum(sd.map(s => s * s))
    val aniso = math.sqrt(s2) / n
    val mpc = (s2 - n) / (n * (n - 1)).toDouble
    val got = SparkEntry.queries("v29_isotropy_audit")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got == Seq((n, meanNorm, aniso, mpc)))
    // sanity: the identity's mean pairwise cosine is a real cosine average
    assert(mpc > -1.0 && mpc < 1.0)
  }

  test("q57: DAU/WAU equals an explicit trailing-7-day distinct replay") {
    import org.apache.spark.sql.functions.{col, expr}
    val du = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = du.map(_._1).distinct.sorted
    val expected = days.map { d =>
      val dau = du.count(_._1 == d).toLong
      val wau = du.filter(p => p._1 >= d - 6 && p._1 <= d)
        .map(_._2).distinct.size.toLong
      (d, dau, wau, dau.toDouble / wau)
    }
    val got = SparkEntry.queries("q57_dau_wau_stickiness")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
    // DAU never exceeds WAU
    assert(got.forall(r => r._2 <= r._3 && r._4 <= 1.0))
  }

  test("t44: charset audit equals a per-character class replay") {
    val expected = docs.sortBy(_._1).map { case (id, _, text) =>
      val n = text.length.toLong
      val up = text.count(c => c >= 'A' && c <= 'Z').toLong
      val dig = text.count(c => c >= '0' && c <= '9').toLong
      val sp = text.count(_ == ' ').toLong
      val na = text.count(c => c < 1 || c > 127).toLong
      def ratio(c: Long) = c.toDouble / n
      (id, n, up, dig, sp, na, ratio(up), ratio(dig), ratio(na),
        ratio(na) <= 0.1 && ratio(dig) <= 0.3 && ratio(up) <= 0.3)
    }
    val got = SparkEntry.queries("t44_charset_audit")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getBoolean(9)))
    assert(got == expected)
  }

  test("mm08: integrity report equals a planted-truncation replay") {
    val kinds = Map(0L -> "image", 1L -> "audio", 2L -> "video")
    val perDoc = docs.map { case (id, _, text) =>
      val declared = text.getBytes("UTF-8").length.toLong
      val actual = if (id % 17 == 0) declared / 2 else declared
      (kinds(id % 3), declared, actual)
    }
    val expected = perDoc.groupBy(_._1).toSeq.map { case (k, g) =>
      val nCorrupt = g.count(r => r._3 < r._2).toLong
      (k, g.size.toLong, nCorrupt, g.map(_._2).sum,
        g.map(r => r._2 - r._3).sum, nCorrupt.toDouble / g.size)
    }.sortBy(_._1)
    val got = SparkEntry.queries("mm08_media_integrity")(spark, sf)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got == expected)
    // the planted fault actually fired somewhere
    assert(got.map(_._3).sum > 0)
  }

  test("q58: ship SLA equals a join + R-7 percentile replay") {
    import org.apache.spark.sql.functions.{col, expr}
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate) div 86400000000").as("od"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val delays = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        expr("unix_micros(l_shipdate) div 86400000000").as("sd"))
      .collect().map { r =>
        val (pri, od) = o(r.getLong(0))
        (pri, r.getLong(1) - od)
      }
    def q(xs: Array[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = math.floor(pos).toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b))
    val expected = delays.groupBy(_._1).map { case (pri, g) =>
      val xs = g.map(_._2.toDouble).sorted
      val late = g.count(_._2 > 90).toLong
      pri -> ((xs.length.toLong, q(xs, 0.5), q(xs, 0.9), g.map(_._2).max,
        late.toDouble / xs.length))
    }
    val got = SparkEntry.queries("q58_ship_sla")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, p50, p90, mx, rate) = expected(r.getString(0))
      assert(r.getLong(1) == n && close(r.getDouble(2), p50) &&
        close(r.getDouble(3), p90) && r.getLong(4) == mx &&
        r.getDouble(5) == rate, r.getString(0))
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getLong(4))
    }
  }

  test("sp14: Clark-Evans card equals a brute-force bounded-NN replay") {
    val keys = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0))
    def x(k: Long) = ((k * 48271) % 10007) % 100 + 0.5
    def y(k: Long) = ((k * 69621) % 10007) % 100 + 0.5
    def dist(a: Long, b: Long): Double = {
      val dx = x(a) - x(b); val dy = y(a) - y(b)
      math.sqrt(dx * dx + dy * dy)
    }
    val radius = 2.5 / math.sqrt(keys.length / 10000.0)
    val nn = keys.flatMap { a =>
      val ds = keys.filter(b => b != a).map(dist(a, _)).filter(_ <= radius)
      if (ds.isEmpty) None else Some(ds.min)
    }
    val n = keys.length.toLong
    val meanNn = dsum(nn) / nn.length
    val expNn = 0.5 / math.sqrt(n.toDouble / 10000.0)
    val got = SparkEntry.queries("sp14_clark_evans")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(got == Seq((n, nn.length.toLong, n - nn.length, meanNn, expNn,
      meanNn / expNn, meanNn < expNn)))
  }

  test("q59: SCD2 history equals a per-key chronological scan replay") {
    import org.apache.spark.sql.functions.{col, expr}
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((u, t), g) =>
      val sorted = g.sortBy(r => (r._4, r._5))
      sorted.zipWithIndex.map { case (r, i) =>
        val next = if (i + 1 < sorted.size) Some(sorted(i + 1)._4) else None
        (u, t, r._3, r._4, next, i + 1, next.isEmpty)
      }
    }.sortBy(r => (r._1, r._2, r._6))
    val got = SparkEntry.queries("q59_scd2_history")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getInt(5), r.getBoolean(6)))
    assert(got == expected)
    // validity intervals tile each key's timeline: exactly one current
    // version per key, and consecutive intervals abut
    val byKey = got.groupBy(r => (r._1, r._2))
    assert(byKey.values.forall(_.count(_._7) == 1))
    assert(byKey.values.forall { vs =>
      vs.sortBy(_._6).sliding(2).forall {
        case Seq(a, b) => a._5.contains(b._4)
        case _         => true
      }
    })
  }

  test("v30: cluster purity equals a quantizer + language-count replay") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = vecs.filter(v => v._1 >= 100 && v._1 <= 107)
    val assign = vecs.map { case (id, v) =>
      id -> cents.map(c => (c._1, cos(v, c._2)))
        .sortBy { case (cid, sim) => (-sim, cid) }.head._1
    }.toMap
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    val byList = langs.filter(d => assign.contains(d._1))
      .groupBy(d => assign(d._1))
    val expected = byList.toSeq.map { case (list, ds) =>
      val counts = ds.groupBy(_._2).map { case (l, g) => (l, g.size.toLong) }
      val (topLang, topN) = counts.toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      (list, ds.size.toLong, counts.size.toLong, topLang, topN,
        topN.toDouble / ds.size)
    }.sortBy(_._1)
    val got = SparkEntry.queries("v30_cluster_purity")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getDouble(5)))
    assert(got == expected)
    // purity is a share; every member is counted somewhere
    assert(got.forall(r => r._6 > 0.0 && r._6 <= 1.0))
    assert(got.map(_._2).sum == langs.count(d => assign.contains(d._1)))
  }

  test("v31: length-IPR correlation equals a sufficient-statistics replay") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def ipr(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += (a(i) * a(i)) * (a(i) * a(i)); i += 1 }
      s
    }
    val ys = vecs.map { case (id, v) => id -> ipr(v) }.toMap
    val xs = docs.map { case (id, _, t) => id -> toks(t).size.toLong }.toMap
    val joined = xs.keys.toSeq.filter(ys.contains)
      .map(id => (xs(id), ys(id)))
    val n = joined.size.toLong
    val sx = joined.map(_._1).sum
    val sxx = joined.map(p => p._1 * p._1).sum
    val sy = dsum(joined.map(_._2))
    val syy = dsum(joined.map(p => p._2 * p._2))
    val sxy = dsum(joined.map(p => p._1 * p._2))
    val den = math.sqrt((n * sxx - sx * sx).toDouble) *
      math.sqrt(n * syy - sy * sy)
    val r = if (den == 0.0) None else Some((n * sxy - sx * sy) / den)
    val got = SparkEntry.queries("v31_length_ipr_corr")(spark, sf)
      .collect().toSeq
      .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3),
        if (row.isNullAt(4)) None else Some(row.getDouble(4))))
    assert(got == Seq((n, sx, sy, sxy, r)))
    assert(got.head._5.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("t45: batch drift equals a first-owner replay per ingest batch") {
    def gopherKeep(t: String): Boolean = {
      val tk = toks(t); val n = tk.size
      val lines = t.split("\n", -1)
      n >= 30 && n <= 50000 &&
        { val m = t.count(_ != ' ').toDouble / n; m >= 2.0 && m <= 12.0 } &&
        tk.count(_.exists("#%$@".contains(_))).toDouble / n < 0.5 &&
        lines.count(_.startsWith("...")).toDouble / lines.length <= 0.3 &&
        tk.count(_.exists(_.isLetter)).toDouble / n >= 0.6
    }
    val byBatch = docs.map { case (id, _, t) => (id / 100, id, t) }
    val firstB = byBatch.groupBy(_._3).map { case (t, g) => t -> g.map(_._1).min }
    val termFirst = byBatch.flatMap { case (b, _, t) => toks(t).distinct.map(_ -> b) }
      .groupBy(_._1).map { case (term, g) => term -> g.map(_._2).min }
    val expected = byBatch.groupBy(_._1).toSeq.map { case (b, g) =>
      val nDocs = g.size.toLong
      val nTokens = g.map(d => toks(d._3).size.toLong).sum
      val nKeep = g.count(d => gopherKeep(d._3)).toLong
      val nDup = g.count(d => firstB(d._3) < b).toLong
      val terms = g.flatMap(d => toks(d._3)).distinct
      val nTerms = terms.size.toLong
      val nNew = terms.count(t => termFirst(t) == b).toLong
      (b, nDocs, nTokens, nKeep.toDouble / nDocs, nDup.toDouble / nDocs,
        nTerms, nNew, nNew.toDouble / nTerms)
    }.sortBy(_._1)
    val got = SparkEntry.queries("t45_batch_drift")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(got == expected)
    // batch 0 owns all of its vocabulary by definition
    assert(got.head._8 == 1.0 && got.head._5 == 0.0)
  }

  test("d22: langid eval equals a confusion rollup of oracle-verified d04") {
    val lp = SparkEntry.queries("d04_langid")(spark, sf)
      .collect().toSeq.map(r => (r.getString(1), r.getString(2)))
    val langs = lp.map(_._1).distinct.sorted
    val expected = langs.map { l =>
      val support = lp.count(_._1 == l).toLong
      val tp = lp.count(p => p._1 == l && p._2 == l).toLong
      val nPred = lp.count(_._2 == l).toLong
      // a never-predicted language has NULL precision/F1 (NULLIF guard)
      val p = if (nPred == 0) None else Some(tp.toDouble / nPred)
      val r = tp.toDouble / support
      val f1 = p.flatMap(pv =>
        if (pv + r == 0.0) None else Some(2.0 * pv * r / (pv + r)))
      (l, support, tp, nPred - tp, support - tp, p, r, f1)
    }
    val got = SparkEntry.queries("d22_langid_eval")(spark, sf)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    assert(got == expected)
    // the classifier is better than chance overall
    val (tpSum, n) = (got.map(_._3).sum.toDouble, lp.size.toDouble)
    assert(tpSum / n > 1.0 / langs.size)
  }

  test("v32: label separation equals a per-label sufficient-stats replay") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect().toSeq
      .map(r => (r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val dims = vecs.head._2.length
    val units = vecs.map { case (l, v) =>
      val nr = math.sqrt(dot(v, v)); (l, v.map(_ / nr))
    }
    val labels = units.map(_._1).distinct.sorted
    val sByLabel = labels.map { l =>
      l -> (0 until dims).map(d2 =>
        dsum(units.filter(_._1 == l).map(_._2(d2)))).toArray
    }.toMap
    val t = (0 until dims).map(d2 => dsum(labels.map(l => sByLabel(l)(d2))))
    val nTot = units.size.toLong
    val expected = labels.map { l =>
      val sArr = sByLabel(l)
      val n = units.count(_._1 == l).toLong
      val s2 = dsum(sArr.map(v => v * v))
      val cross = dsum(sArr.zip(t).map { case (sv, tv) => sv * (tv - sv) })
      val intra = (s2 - n) / (n * (n - 1)).toDouble
      val inter = cross / (n * (nTot - n)).toDouble
      (l, n, intra, inter, intra - inter)
    }
    val got = SparkEntry.queries("v32_label_separation")(spark, sf)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got == expected)
    // the statistics are genuine cosine means (the fixture's labels turn
    // out NOT to be embedding clusters — separation ≈ 0 — which is
    // exactly what this card is for detecting)
    assert(got.forall(r => r._3.abs <= 1.0 && r._4.abs <= 1.0))
  }

  test("q60: integrity audit equals a key-set replay") {
    val oKeys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    val lKeys = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val oSet = oKeys.toSet
    val lOrderSet = lKeys.map(_._1).toSet
    val nO = oKeys.size.toLong
    val nL = lKeys.size.toLong
    def dups(xs: Seq[_]): Long = (xs.size - xs.distinct.size).toLong
    val expected = Seq(
      (1, "orphan_lineitems", lKeys.count(k => !oSet(k._1)).toLong, nL),
      (2, "childless_orders", oKeys.count(k => !lOrderSet(k)).toLong, nO),
      (3, "dup_order_keys", dups(oKeys), nO),
      (4, "dup_line_keys", dups(lKeys), nL),
      (5, "null_fk", 0L, nL)
    ).map(r => (r._1, r._2, r._3, r._4, r._3 == 0))
    val got = SparkEntry.queries("q60_integrity_audit")(spark, sf)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got == expected)
  }

  test("q61: heatmap equals an epoch-day dow/hod replay") {
    import org.apache.spark.sql.functions.{col, expr}
    val rows = Tables.events(spark, sf)
      .select(expr("unix_micros(ts)").as("us"), col("value"))
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    val cells = rows.groupBy { case (us, _) =>
      ((us / 86400000000L + 3) % 7, (us / 3600000000L) % 24)
    }
    val nt = rows.size.toLong
    val mx = cells.values.map(_.size).max
    val expected = cells.toSeq.map { case ((dow, hod), g) =>
      (dow, hod, g.size.toLong, dsum(g.map(_._2)),
        g.size.toDouble / nt, g.size == mx)
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q61_weekday_hour_heatmap")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(got == expected)
    assert(got.map(_._3).sum == nt && got.count(_._6) >= 1)
  }

  test("t46: Zipf octaves equal a ranked-frequency replay") {
    val freqs = docs.flatMap(d => toks(d._3))
      .groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
      .toSeq.sortBy { case (t, f) => (-f, t) }
    val expected = Seq(1, 2, 4, 8, 16, 32).flatMap { r =>
      if (2 * r <= freqs.size) {
        val f = freqs(r - 1)._2
        val f2 = freqs(2 * r - 1)._2
        Some((r.toLong, f, f2, f.toDouble / f2))
      } else None
    }
    val got = SparkEntry.queries("t46_zipf_octaves")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
    // frequencies are non-increasing in rank: every octave ratio >= 1
    assert(got.forall(_._4 >= 1.0))
  }

  test("d21: corpus funnel equals a five-stage single-node replay") {
    val all = docs.map { case (id, _, text) => (id, text) }
    def nTok(t: String) = toks(t).size
    def charsetKeep(t: String): Boolean = {
      val n = t.length
      n > 0 && {
        t.count(c => c < 1 || c > 127).toDouble / n <= 0.1 &&
        t.count(c => c >= '0' && c <= '9').toDouble / n <= 0.3 &&
        t.count(c => c >= 'A' && c <= 'Z').toDouble / n <= 0.3
      }
    }
    def gopherKeep(t: String): Boolean = {
      val tk = toks(t); val n = tk.size
      val lines = t.split("\n", -1)
      n >= 30 && n <= 50000 &&
        { val m = t.count(_ != ' ').toDouble / n; m >= 2.0 && m <= 12.0 } &&
        tk.count(_.exists("#%$@".contains(_))).toDouble / n < 0.5 &&
        lines.count(_.startsWith("...")).toDouble / lines.length <= 0.3 &&
        tk.count(_.exists(_.isLetter)).toDouble / n >= 0.6
    }
    val c2 = all.filter(d => charsetKeep(d._2))
    val c3 = c2.filter(d => gopherKeep(d._2))
    val c4 = c3.groupBy(_._2).toSeq.map { case (_, g) => g.minBy(_._1) }
      .sortBy(_._1)
    // near-dup: brute-force exact-Jaccard >= 0.5 over word-3-gram sets
    // (oracle-proven equal to the engine's LSH candidate set)
    val sh = c4.map { case (id, t) =>
      val tk = toks(t)
      id -> (if (tk.size >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
             else Set(t))
    }
    val pairs = for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = sa.count(sb.contains)
      uni = sa.size + sb.size - inter
      if uni > 0 && inter.toDouble / uni >= 0.5
    } yield (a, b)
    // union-find → components → keep longest (ties to min doc_id)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byComp = c4.groupBy { case (id, _) => find(id) }
    val c5 = byComp.values.toSeq
      .map(_.minBy { case (id, t) => (-nTok(t).toLong, id) }).sortBy(_._1)
    def stageRow(i: Int, name: String, g: Seq[(Long, String)]) =
      (i, name, g.size.toLong, g.map(d => nTok(d._2).toLong).sum)
    val expected = Seq(stageRow(1, "ingested", all), stageRow(2, "charset", c2),
      stageRow(3, "quality", c3), stageRow(4, "exact_dedup", c4),
      stageRow(5, "near_dedup", c5))
    val got = SparkEntry.queries("d21_corpus_funnel")(spark, sf)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got == expected)
    // the funnel only ever shrinks
    assert(got.sliding(2).forall(w => w(1)._3 <= w(0)._3))
  }
}
