package graft

import org.apache.spark.sql.functions._

import graft.functions.BottomKAgg

/** Behavioral tests for the round-3 text-pipeline additions
  * (contamination scan, repetition rules, bottom-k sampling).
  */
class TextPipelineSpec extends GraftSuite {

  test("t09: planted eval dup is flagged as contaminated") {
    val out = SparkEntry.queries("t09_eval_contamination")(spark, sf)
      .filter(col("contaminated"))
      .collect()
    // the corpus plants near-dup pairs; at sf0.01 at least one has an
    // endpoint in the eval range, and overlap must be substantial
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_shared") > 0))
    assert(out.exists(r => r.getAs[Double]("contamination") > 0.5),
      "a near-dup of an eval doc should share most shingles")
  }

  test("t18: realized mix rates converge to the domain weights") {
    val out = SparkEntry.queries("t18_domain_mix")(spark, sf)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val src = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val weights = Map("en" -> 0.7, "de" -> 1.5, "es" -> 2.25, "fr" -> 1.0, "zh" -> 0.5)
    for ((lang, w) <- weights) {
      val realized = perLang.getOrElse(lang, 0L).toDouble / src(lang)
      // hash-residue selection: rate within ~4/sqrt(n) of target
      assert(math.abs(realized - w) < 0.35,
        s"$lang realized $realized vs target $w")
    }
    // whole epochs are exact: every fr doc appears exactly once
    assert(perLang("fr") == src("fr"))
    // the shuffle key decorrelates doc order: copies of one doc are not adjacent
    val keys = out.select("skey").collect().map(_.getLong(0))
    assert(keys.sorted.sameElements(keys), "output must be sorted by skey")
  }

  test("t22: importance weights rank the target domain first") {
    val out = SparkEntry.queries("t22_dsir_weights")(spark, sf)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Double]("score"),
        r.getAs[Boolean]("keep")))
    assert(out.length == Tables.documents(spark, sf).count())
    val means = out.groupBy(_._1).view
      .mapValues(rs => rs.map(_._2).sum / rs.length).toMap
    val (en, rest) = (means("en"), means.removed("en").values)
    assert(rest.forall(_ < en),
      s"target-domain mean score must dominate: $means")
    out.foreach { case (_, sc, keep) => assert(keep == (sc >= 1.0)) }
  }

  test("t20: learned merges and re-encoded lengths equal a single-node BPE replay") {
    val out = SparkEntry.queries("t20_bpe_merges")(spark, sf).collect()
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split("\\s+")).filter(_.nonEmpty)
    val freq = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var seqs: Map[String, String] =
      freq.keys.map(t => t -> t.toCharArray.mkString(" ")).toMap
    def topPair: String = {
      val pc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((t, s) <- seqs; syms = s.split(" "); i <- 0 until syms.length - 1)
        pc(syms(i) + " " + syms(i + 1)) += freq(t)
      pc.toSeq.sortBy { case (p, c) => (-c, p) }.head._1
    }
    def applyMerge(m: String): Unit = {
      val merged = " " + m.replace(" ", "") + " "
      seqs = seqs.view.mapValues(s =>
        (" " + s + " ").replace(" " + m + " ", merged)
          .replace(" " + m + " ", merged).trim).toMap
    }
    val em1 = topPair; applyMerge(em1)
    val em2 = topPair; applyMerge(em2)
    assert(out.head.getAs[String]("merge1") == em1)
    assert(out.head.getAs[String]("merge2") == em2)
    assert(out.length == freq.size)
    out.foreach { r =>
      val t = r.getAs[String]("tok")
      assert(r.getAs[Long]("freq") == freq(t))
      assert(r.getAs[Long]("n_syms") == seqs(t).split(" ").length,
        s"token '$t': n_syms ${r.getAs[Long]("n_syms")} != replay '${seqs(t)}'")
    }
  }

  test("t19: offset-rank equals a direct per-lang row_number; stages are width-50") {
    val out = SparkEntry.queries("t19_curriculum")(spark, sf)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("difficulty"), r.getAs[Long]("rk"), r.getAs[Long]("stage")))
    // the two-pass (count-offsets + tie-group row_number) rank must equal
    // the naive dense enumeration by (difficulty, doc_id) within lang
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val expected = rows.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      rows.foreach { r =>
        assert(r._4 == expected(r._2), s"$lang doc ${r._2}: rk ${r._4} != ${expected(r._2)}")
        assert(r._5 == (r._4 - 1) / 50, s"stage must be (rk-1)/50, got $r")
      }
    }
    // every language progresses through difficulty monotonically in rank order
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRk = rows.sortBy(_._4).map(_._3)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a <= b })
    }
  }

  test("t10: repetition metrics bounded and keep splits the corpus") {
    val rows = SparkEntry.queries("t10_repetition_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 1 to 3 if !r.isNullAt(i)) {
      val v = r.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"metric out of range: $r")
    }
    val keeps = rows.map(_.getAs[Boolean]("keep")).toSet
    assert(keeps == Set(true, false), "thresholds should split the corpus")
  }

  test("t13: pii redaction masks emails, ips, phones, ssns on a planted doc") {
    import SparkTestBase.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (0L, "mail bob.smith+x@corp.example.com or 10.0.42.7 call 555-123-4567 ssn 123-45-6789", "en", "s", 80L),
      (1L, "nothing sensitive here at all", "en", "s", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("t13_pii_redaction")(spark, dir)
      .orderBy("doc_id").collect()
    val r0 = rows(0)
    assert(r0.getAs[Int]("n_email") == 1 && r0.getAs[Int]("n_ip") == 1)
    assert(r0.getAs[Int]("n_phone") == 1 && r0.getAs[Int]("n_ssn") == 1)
    val clean = r0.getAs[String]("clean_text")
    assert(clean == "mail <EMAIL> or <IP> call <PHONE> ssn <SSN>", clean)
    val r1 = rows(1)
    assert(Seq("n_email", "n_ip", "n_phone", "n_ssn").forall(c => r1.getAs[Int](c) == 0))
    assert(r1.getAs[String]("clean_text") == "nothing sensitive here at all")
  }

  test("t14: tfidf ranks a document's rare term above corpus-wide terms") {
    import SparkTestBase.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfidf").toString
    Seq(
      (0L, "shared shared shared zebra", "en", "s", 26L),
      (1L, "shared shared shared words", "en", "s", 26L),
      (2L, "shared shared shared words", "en", "s", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val doc0 = SparkEntry.queries("t14_tfidf_topk")(spark, dir)
      .filter(col("doc_id") === 0)
      .select("term", "tf", "df", "score")
      .as[(String, Long, Long, Double)].collect()
    val byTerm = doc0.map(r => r._1 -> r).toMap
    // zebra: tf=1 df=1 -> 1*3/1 = 3.0; shared: tf=3 df=3 -> 3*3/3 = 3.0
    assert(byTerm("zebra") == ("zebra", 1L, 1L, 3.0))
    assert(byTerm("shared") == ("shared", 3L, 3L, 3.0))
    // doc 0 never contains "words"
    assert(!byTerm.contains("words"))
  }

  test("t15: duplicated 10-token chunk survives only its first occurrence") {
    import SparkTestBase.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    val span = (1 to 10).map(i => s"w$i").mkString(" ")   // one exact chunk
    val uniqA = (1 to 10).map(i => s"a$i").mkString(" ")
    val uniqB = (1 to 10).map(i => s"b$i").mkString(" ")
    Seq(
      (0L, s"$span $uniqA", "en", "s", 1L),  // chunk 0 = span (first)
      (1L, s"$span $uniqB", "en", "s", 1L))  // chunk 0 = span (dup)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("t15_chunk_dedup")(spark, dir)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(rows(0) == ((0L, 2L, 2L, s"$span $uniqA")))
    // doc 1 loses the duplicated leading chunk, keeps its unique tail
    assert(rows(1) == ((1L, 2L, 1L, uniqB)))
  }

  test("heavy_hitters: MG guarantees hold in the approximate regime, any merge order") {
    val agg = new graft.functions.HeavyHittersAgg(3)
    // zipf-ish stream: a×30, b×20, c×10, 15 singletons; N = 75
    val items = scala.util.Random.shuffle(
      (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c") ++
        (1 to 15).map(i => s"x$i")).toVector)
    val n = items.size
    def runWith(parts: Seq[Seq[String]]): Map[String, Long] =
      agg.finish(parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)).toMap
    for (cut <- Seq(Seq(items), items.grouped(7).toSeq, items.grouped(25).toSeq)) {
      val est = runWith(cut)
      assert(est.size <= 3)
      // every item with freq > N/(k+1) survives; estimates never
      // overshoot and undershoot by at most N/(k+1)
      val threshold = n / 4.0
      for ((t, truth) <- Seq("a" -> 30L, "b" -> 20L) if truth > threshold) {
        assert(est.contains(t), s"$t lost (cut ${cut.size} parts): $est")
        assert(est(t) <= truth && truth - est(t) <= threshold, s"$t -> ${est(t)}")
      }
      assert(est.values.forall(_ > 0))
    }
  }

  test("bottom_k aggregator: order/partition invariant, tie-broken on id") {
    val agg = new BottomKAgg(3)
    val items = Seq(("b", 2L), ("a", 9L), ("a", 1L), ("c", 5L), ("b", 2L))
    // reduce in two different orders + merge partial states
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    val (p1, p2) = items.splitAt(2)
    val merged = agg.merge(
      p2.foldLeft(agg.zero)(agg.reduce),
      p1.foldLeft(agg.zero)(agg.reduce))
    // multiset semantics: the duplicate ("b",2) occupies its own slot
    val expected = items.sorted.take(3)
    assert(agg.finish(whole) == expected)
    assert(agg.finish(merged) == agg.finish(whole))
    // nulls dropped
    assert(agg.reduce(agg.zero, (null, 1L)) == agg.zero)
  }

  test("t11 plan: bounded-state aggregation with a map-side partial") {
    val df = SparkEntry.queries("t11_bottomk_sample")(spark, sf)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"no object hash agg:\n$p")
    assert(p.contains("partial_bottomkagg") ||
      p.toLowerCase.contains("partial_bottom"),
      s"no map-side partial aggregation:\n$p")
    // never a full sort+window over the corpus
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      s"bottom-k fell back to a window sort:\n$p")
  }
}
