package graft

import java.math.{BigDecimal => JBD, RoundingMode}

/** Single-node replays for the second round-5 batch: vocabulary growth
  * (t39), Flesch readability (t40), RFM segmentation (q52), and the IVF
  * hot-list split (v26). Each test recomputes the full expected answer
  * in plain Scala — every IEEE operation in the same order as the Spark
  * expression — and compares exactly, the same bar as the DuckDB oracle.
  */
class Round5bOpsSpec extends GraftSuite {

  private def toks(text: String): Seq[String] =
    text.split("\\s+").toSeq.filter(_.nonEmpty)

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "text", "lang")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private lazy val vecs: Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("t39: vocabulary-growth curve equals a first-occurrence replay") {
    val nDocs = docs.map(_._1).max + 1
    val tk = docs.flatMap { case (id, text, _) => toks(text).map(t => (id, t)) }
    val firstDoc = tk.groupBy(_._2).map { case (t, g) => t -> g.map(_._1).min }
    val docTok = tk.groupBy(_._1).map { case (id, g) => id -> g.size.toLong }
    def bucket(id: Long): Int = ((id * 10) / nDocs).toInt
    val newTerms = firstDoc.values.groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
    val bucketTokens = docTok.toSeq.groupBy(r => bucket(r._1))
      .map { case (b, g) => b -> g.map(_._2).sum }
    val expected = bucketTokens.keys.toSeq.sorted.scanLeft((0, 0L, 0L, 0L)) {
      case ((_, _, cv, ct), b) =>
        val nt = newTerms.getOrElse(b, 0L)
        (b, nt, cv + nt, ct + bucketTokens(b))
    }.drop(1).map { case (b, nt, cv, ct) =>
      (b, nt, cv, ct, cv.toDouble / ct.toDouble)
    }

    val got = SparkEntry.queries("t39_vocab_growth")(spark, sf).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got == expected)
    // the curve is monotone and ends at the full corpus vocabulary
    assert(got.last._3 == firstDoc.size.toLong)
    assert(got.map(_._3) == got.map(_._3).sorted)
  }

  test("t40: Flesch scores equal an exact regex + ratio replay") {
    val sentRe = "[.!?]+".r
    val sylRe = "[aeiouy]+".r
    val expected = docs.sortBy(_._1).map { case (id, text, _) =>
      val w = math.max(toks(text).size.toLong, 1L)
      val s = math.max(sentRe.findAllIn(text).size.toLong, 1L)
      val syl = sylRe.findAllIn(text.toLowerCase).size.toLong
      val flesch = 206.835 - 1.015 * (w.toDouble / s.toDouble) -
        84.6 * (syl.toDouble / w.toDouble)
      val band =
        if (flesch >= 90) "very_easy" else if (flesch >= 70) "easy"
        else if (flesch >= 50) "medium" else if (flesch >= 30) "hard"
        else "very_hard"
      (id, w, s, syl, flesch, band)
    }

    val got = SparkEntry.queries("t40_readability")(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))
    assert(got == expected)
  }

  /** NTILE(n) bucket of 0-based position i among `size` rows. */
  private def ntileOf(i: Int, size: Int, n: Int): Int = {
    val base = size / n; val rem = size % n
    val cut = (base + 1) * rem
    if (i < cut) i / (base + 1) + 1 else (i - cut) / base + rem + 1
  }

  test("q52: RFM segments equal a decimal-sum + NTILE replay") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val anchor = purchases.map(_._2).max
    val users = purchases.groupBy(_._1).toSeq.map { case (uid, g) =>
      val monetary = g.map(r => new JBD(r._3).setScale(6, RoundingMode.HALF_UP))
        .reduce(_.add(_)).doubleValue()
      (uid, (anchor - g.map(_._2).max) / 3600000000L, g.size.toLong, monetary)
    }
    val n = users.size
    val rQ = users.sortBy(u => (u._2, u._1)).zipWithIndex
      .map { case (u, i) => u._1 -> ntileOf(i, n, 4) }.toMap
    val fQ = users.sortBy(u => (-u._3, u._1)).zipWithIndex
      .map { case (u, i) => u._1 -> ntileOf(i, n, 4) }.toMap
    val mQ = users.sortBy(u => (-u._4, u._1)).zipWithIndex
      .map { case (u, i) => u._1 -> ntileOf(i, n, 4) }.toMap
    val expected = users.sortBy(_._1).map { case (uid, rec, freq, mon) =>
      val (r, f, m) = (rQ(uid), fQ(uid), mQ(uid))
      val seg =
        if (r == 1 && f == 1 && m == 1) "champion"
        else if (r <= 2 && f <= 2) "loyal"
        else if (r >= 3 && f <= 2) "at_risk"
        else "regular"
      (uid, rec, freq, mon, r, f, m, seg)
    }

    val got = SparkEntry.queries("q52_rfm_segments")(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
    assert(got == expected)
  }

  test("q53: k-anonymity histogram equals a quasi-identifier replay") {
    import org.apache.spark.sql.functions.{col, hour}
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), hour(col("ts")).as("hr"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val sigs = rows.groupBy(_._1).toSeq.map { case (_, g) =>
      val types = g.map(_._2).distinct.sorted.mkString(",")
      s"$types|${g.size / 20}|${g.map(_._3).distinct.size / 6}"
    }
    val expected = sigs.groupBy(identity).values.map(_.size.toLong).toSeq
      .groupBy(identity).toSeq.map { case (k, g) =>
        (k, g.size.toLong, k * g.size, k < 5)
      }.sortBy(_._1)

    val got = SparkEntry.queries("q53_k_anonymity")(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got == expected)
    // every user is accounted for exactly once across the histogram
    assert(got.map(_._3).sum == rows.map(_._1).distinct.size)
  }

  test("q54: hop-window rates equal a two-hop explode replay") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expected = rows.flatMap { case (t, v, us) =>
      val hr = us / 3600000000L
      Seq((hr, t, v), (hr - 1, t, v))
    }.filter(_._1 >= 0).groupBy(r => (r._1, r._2)).toSeq.map {
      case ((hr, t), g) =>
        val total = g.map(r => new JBD(r._3).setScale(6, RoundingMode.HALF_UP))
          .reduce(_.add(_)).doubleValue()
        (hr, t, g.size.toLong, total, g.size.toLong.toDouble / 2.0)
    }.sortBy(r => (r._1, r._2))

    val got = SparkEntry.queries("q54_hop_window_rates")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got == expected)
    // each event contributes to exactly two windows
    assert(got.map(_._3).sum == 2L * rows.size)
  }

  test("v26: hot-list split equals a quantizer + 2-means-step replay") {
    val cents = vecs.filter(v => v._1 >= 100 && v._1 <= 107)
    val assign = vecs.map { case (id, v) =>
      id -> cents.map(c => (c._1, cos(v, c._2)))
        .sortBy { case (cid, sim) => (-sim, cid) }.head._1
    }.toMap
    val sizes = assign.values.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    val hot = sizes.toSeq.sortBy { case (l, sn) => (-sn, l) }.head._1
    val members = assign.filter(_._2 == hot).keys
    val (sa, sb) = (members.min, members.max)
    val ea = vecs.find(_._1 == sa).get._2
    val eb = vecs.find(_._1 == sb).get._2
    val labels = vecs.map { case (id, v) =>
      val l = assign(id)
      val label =
        if (l != hot) l.toString
        else if (cos(v, ea) >= cos(v, eb)) s"$l.a" else s"$l.b"
      (label, l)
    }
    val total = vecs.size.toLong
    val expected = labels.groupBy(identity).toSeq.map { case ((label, parent), g) =>
      (label, parent, sizes(parent), g.size.toLong,
        g.size.toLong.toDouble / total.toDouble)
    }.sortBy(_._1)

    val got = SparkEntry.queries("v26_hot_list_split")(spark, sf).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got == expected)
    // the split produced exactly two halves of the hot list
    assert(got.count(_._1.contains(".")) == 2)
    assert(got.filter(_._1.contains(".")).map(_._4).sum == sizes(hot))
  }
}
