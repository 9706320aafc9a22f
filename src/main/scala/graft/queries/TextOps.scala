package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.util.Persist.Syntax

/** Text-analysis + exact-dedup operators over the `documents` fixture —
  * the oracle-checkable half of the LLM-pipeline surface (the sketch-
  * based dedups live in [[DedupOps]]).
  *
  * Everything here is per-row expression work (codegen'd, no UDFs) plus
  * at most one hash-aggregate shuffle — embarrassingly parallel at
  * 100 TB. Ratios guard against 0 denominators with CASE (DuckDB yields
  * NULL on double÷0 where Spark yields NaN/Inf — CASE makes both NULL).
  */
object TextOps {

  def defs: Seq[QDef] =
    Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t12, t13, t14,
      t15, t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27, t28,
      t29, t30, t31, t32, t33, t34, t35, t36, t37, t38, t39, t40, t41, t42,
      t43, t44, t45, t46, t47, t48, t49, t50)

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")
  private def sqlStops = stopwords.map(s => s"'$s'").mkString("(", ",", ")")

  /** Non-empty whitespace tokens of `text`. */
  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** Corpus stats by language. */
  private val t01 = QDef(
    "t01_doc_stats",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      |  COUNT(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))
  }

  /** Per-document token counting + type-token ratio. */
  private val t02 = QDef(
    "t02_token_stats",
    """WITH t AS (SELECT doc_id,
      |    len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens,
      |    len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS n_distinct
      |  FROM documents)
      |SELECT doc_id, n_tokens, n_distinct,
      |  CASE WHEN n_tokens = 0 THEN NULL
      |       ELSE CAST(n_distinct AS DOUBLE) / n_tokens END AS ttr
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("n_distinct", size(array_distinct(tokens(col("text")))))
      .withColumn("ttr",
        when(col("n_tokens") === 0, lit(null))
          .otherwise(col("n_distinct").cast("double") / col("n_tokens")))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("ttr"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: token counts, mean token length, stopword ratio,
    * and a boolean quality gate — the classic pretraining-filter shape. */
  private val t03 = QDef(
    "t03_quality_scores",
    s"""WITH t AS (SELECT doc_id,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens,
       |    length(replace(text, ' ', '')) AS n_nonspace,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x IN $sqlStops)) AS n_stop
       |  FROM documents)
       |SELECT doc_id, n_tokens,
       |  CASE WHEN n_tokens = 0 THEN NULL
       |       ELSE CAST(n_nonspace AS DOUBLE) / n_tokens END AS mean_token_len,
       |  CASE WHEN n_tokens = 0 THEN NULL
       |       ELSE CAST(n_stop AS DOUBLE) / n_tokens END AS stop_ratio,
       |  (n_tokens >= 5 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5) AS quality_ok
       |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("n_nonspace", length(regexp_replace(col("text"), " ", "")))
      .withColumn("n_stop",
        size(filter(tokens(col("text")), t => array_contains(stopArr, t))))
      .withColumn("mean_token_len",
        when(col("n_tokens") === 0, lit(null))
          .otherwise(col("n_nonspace").cast("double") / col("n_tokens")))
      .withColumn("stop_ratio",
        when(col("n_tokens") === 0, lit(null))
          .otherwise(col("n_stop").cast("double") / col("n_tokens")))
      .withColumn("quality_ok",
        col("n_tokens") >= 5 &&
          col("n_stop").cast("double") / col("n_tokens") < 0.5)
      .select(col("doc_id"), col("n_tokens"), col("mean_token_len"),
        col("stop_ratio"), col("quality_ok"))
      .orderBy(col("doc_id"))
  }

  /** Exact dedup (keep-first): one hash-aggregate on md5(text) — the
    * 100 TB-scale exact pass before any sketch dedup. */
  private val t04 = QDef(
    "t04_exact_dedup_keepers",
    """SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy(col("h"))
  }

  /** Dedup summary: corpus size vs distinct-content size. */
  private val t05 = QDef(
    "t05_dedup_summary",
    """SELECT COUNT(*) AS total_docs,
      |  COUNT(DISTINCT md5(text)) AS distinct_docs,
      |  COUNT(*) - COUNT(DISTINCT md5(text)) AS dup_docs
      |FROM documents""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .agg(count(lit(1)).as("total_docs"),
        countDistinct(md5(col("text"))).as("distinct_docs"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("dup_docs"))
  }
  /** BPE-ish subword pre-tokenization (the GPT-2 pre-tokenizer regex
    * family: contraction suffixes, space-prefixed letter/digit runs,
    * punctuation runs, whitespace) - the token-count estimate a
    * training pipeline budgets with before real BPE. Both engines run
    * the same pattern (Java regex and RE2 agree on this subset), so the
    * counts are oracle-exact. Fertility = subwords per whitespace word.
    */
  private val t06 = {
    val pat = """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""
    val sqlPat = pat.replace("'", "''")
    QDef(
      "t06_subword_tokens",
      s"""WITH t AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '$sqlPat')) AS n_subword,
         |    len(list_distinct(regexp_extract_all(text, '$sqlPat'))) AS n_distinct,
         |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_words
         |  FROM documents)
         |SELECT doc_id, n_subword, n_distinct,
         |  CASE WHEN n_words = 0 THEN NULL
         |       ELSE CAST(n_subword AS DOUBLE) / n_words END AS fertility
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract_all(col("text"), lit(pat), lit(0)).as("sub"),
          size(tokens(col("text"))).as("n_words"))
        .select(col("doc_id"),
          size(col("sub")).as("n_subword"),
          size(array_distinct(col("sub"))).as("n_distinct"),
          when(col("n_words") === 0, lit(null).cast("double"))
            .otherwise(size(col("sub")).cast("double") / col("n_words")).as("fertility"))
        .orderBy(col("doc_id"))
    }
  }
  /** Gopher-style composite quality rules (Rae et al. 2021 §A1.1
    * family, thresholds scaled to this corpus): per-document boolean
    * rule columns + the overall keep decision — the filtering pass a
    * pretraining pipeline runs before dedup. Every rule is counting
    * arithmetic over tokens/characters, so the oracle is exact.
    *
    * Rules: token count in [30, 50k] (Gopher's 50-word floor scaled to this corpus's 10-99 token range so the rule actually fires); mean token length in [2, 12];
    * symbol-to-token ratio < 0.5 (#, %, $, @); ellipsis-started line
    * ratio <= 0.3; alpha-token ratio >= 0.6 (tokens containing a
    * letter).
    */
  private val t07 = {
    QDef(
      "t07_gopher_rules",
      s"""WITH t AS (SELECT doc_id,
         |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens,
         |    length(replace(text, ' ', '')) AS n_nonspace,
         |    len(list_filter(regexp_split_to_array(text, '\\s+'),
         |        x -> regexp_matches(x, '[#%$$@]'))) AS n_symbol,
         |    len(list_filter(regexp_split_to_array(text, '\\s+'),
         |        x -> regexp_matches(x, '\\p{L}'))) AS n_alpha,
         |    len(list_filter(regexp_split_to_array(text, '\n'), l -> l LIKE '...%')) AS n_ellipsis,
         |    len(regexp_split_to_array(text, '\n')) AS n_lines
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |  (n_tokens >= 30 AND n_tokens <= 50000) AS ok_n_tokens,
         |  (n_tokens > 0 AND CAST(n_nonspace AS DOUBLE) / n_tokens >= 2.0
         |               AND CAST(n_nonspace AS DOUBLE) / n_tokens <= 12.0) AS ok_token_len,
         |  (n_tokens > 0 AND CAST(n_symbol AS DOUBLE) / n_tokens < 0.5) AS ok_symbols,
         |  (n_lines = 0 OR CAST(n_ellipsis AS DOUBLE) / n_lines <= 0.3) AS ok_ellipsis,
         |  (n_tokens > 0 AND CAST(n_alpha AS DOUBLE) / n_tokens >= 0.6) AS ok_alpha,
         |  ((n_tokens >= 30 AND n_tokens <= 50000)
         |    AND (n_tokens > 0 AND CAST(n_nonspace AS DOUBLE) / n_tokens >= 2.0
         |                      AND CAST(n_nonspace AS DOUBLE) / n_tokens <= 12.0)
         |    AND (n_tokens > 0 AND CAST(n_symbol AS DOUBLE) / n_tokens < 0.5)
         |    AND (n_lines = 0 OR CAST(n_ellipsis AS DOUBLE) / n_lines <= 0.3)
         |    AND (n_tokens > 0 AND CAST(n_alpha AS DOUBLE) / n_tokens >= 0.6)) AS keep
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = tokens(col("text"))
      val df = Tables.documents(s, d)
        .withColumn("n_tokens", size(toks))
        .withColumn("n_nonspace", length(regexp_replace(col("text"), " ", "")))
        .withColumn("n_symbol",
          size(filter(toks, t => t.rlike("[#%$@]"))))
        .withColumn("n_alpha",
          size(filter(toks, t => t.rlike("\\p{L}"))))
        .withColumn("n_ellipsis",
          size(filter(split(col("text"), "\n"), l => l.startsWith("..."))))
        .withColumn("n_lines", size(split(col("text"), "\n")))
      val meanLen = col("n_nonspace").cast("double") / col("n_tokens")
      val okTokens = col("n_tokens") >= 30 && col("n_tokens") <= 50000
      val okLen = col("n_tokens") > 0 && meanLen >= 2.0 && meanLen <= 12.0
      val okSym = col("n_tokens") > 0 &&
        col("n_symbol").cast("double") / col("n_tokens") < 0.5
      val okEll = col("n_lines") === 0 ||
        col("n_ellipsis").cast("double") / col("n_lines") <= 0.3
      val okAlpha = col("n_tokens") > 0 &&
        col("n_alpha").cast("double") / col("n_tokens") >= 0.6
      df.select(col("doc_id"), col("n_tokens"),
          okTokens.as("ok_n_tokens"), okLen.as("ok_token_len"),
          okSym.as("ok_symbols"), okEll.as("ok_ellipsis"),
          okAlpha.as("ok_alpha"),
          (okTokens && okLen && okSym && okEll && okAlpha).as("keep"))
        .orderBy(col("doc_id"))
    }
  }
  /** Deterministic train/eval split by content hash — the held-out-set
    * assignment a pretraining pipeline needs to be REPRODUCIBLE and
    * content-stable (same doc → same split on any cluster, any
    * partitioning, any day; exact duplicates land in the same split so
    * eval never leaks a training dup). First hex digit of md5(text)
    * in {0,1,2} → eval ≈ 3/16 of the corpus. */
  private val t08 = QDef(
    "t08_train_eval_split",
    """WITH t AS (SELECT doc_id, lang,
      |    CASE WHEN substring(md5(text), 1, 1) IN ('0','1','2')
      |         THEN 'eval' ELSE 'train' END AS split
      |  FROM documents)
      |SELECT lang, split, COUNT(*) AS n, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM t GROUP BY lang, split ORDER BY lang, split""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("split",
        when(substring(md5(col("text")), 1, 1).isin("0", "1", "2"), "eval")
          .otherwise("train"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"), col("split"))
  }

  import CrossHash.{bind, h64E, sqlH64}

  /** Tokens as a SQL-expression fragment (for [[CrossHash.bind]]). */
  private val toksE = "filter(split(text, '\\\\s+'), x -> x != '')"

  /** Distinct 8-token shingle hashes of `text` (whole-text fallback for
    * short docs) — shared by t09/t23 and the streaming contamination
    * gate, so batch and stream provably fingerprint identically. */
  private[graft] val gram8E = bind(toksE, "tk")(tk =>
    s"""CASE WHEN size($tk) >= 8
       |  THEN array_distinct(transform(sequence(0, size($tk) - 8),
       |         i -> ${h64E(s"array_join(slice($tk, i + 1, 8), ' ')")}))
       |  ELSE array(${h64E("text")}) END""".stripMargin)

  /** Eval-set contamination scan: per TRAIN document, how many of its
    * distinct 8-token shingles appear anywhere in the EVAL set
    * (doc_id < 25 here; in production, the benchmark suite). The scale
    * shape is an inverted-index join on the shingle hash — shuffle
    * carries (hash, doc_id), never document pairs — with the (small)
    * eval shingle set broadcast. The standard pre-training
    * decontamination pass (e.g. GPT-3 appendix C uses 8-13-gram
    * overlap). Shingle hashes are md5-derived ([[CrossHash.h64E]]) so
    * the DuckDB oracle joins on identical keys. */
  private val t09 = QDef(
    "t09_eval_contamination", {
      val gram = (1 to 8).map(j => s"tk[i+${j - 1}]").mkString(" || ' ' || ")
      s"""WITH tk AS (
         |  SELECT doc_id, text,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, CASE WHEN len(tk) >= 8
         |    THEN list_distinct(list_transform(range(1, len(tk) - 6), i -> ${sqlH64(gram)}))
         |    ELSE [${sqlH64("text")}] END AS sh
         |  FROM tk),
         |ev AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id < 25),
         |tr AS (SELECT doc_id, unnest(sh) AS h FROM sh WHERE doc_id >= 25),
         |tot AS (SELECT doc_id, CAST(len(sh) AS INTEGER) AS n_shingles FROM sh WHERE doc_id >= 25),
         |s AS (SELECT tr.doc_id, COUNT(*) AS n_shared FROM tr JOIN ev USING (h) GROUP BY tr.doc_id)
         |SELECT tot.doc_id, CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared, tot.n_shingles,
         |  CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / tot.n_shingles AS contamination,
         |  (COALESCE(s.n_shared, 0) > 0) AS contaminated
         |FROM tot LEFT JOIN s ON tot.doc_id = s.doc_id
         |ORDER BY tot.doc_id""".stripMargin
    }) { (s, d) =>
    val sh = Tables.documents(s, d).select(col("doc_id"), expr(gram8E).as("sh"))
    val ev = sh.filter(col("doc_id") < 25)
      .select(explode(col("sh")).as("h")).distinct()
    val tot = sh.filter(col("doc_id") >= 25)
      .select(col("doc_id"), size(col("sh")).as("n_shingles"))
    val shared = sh.filter(col("doc_id") >= 25)
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .join(broadcast(ev), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    tot.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_shingles"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_shingles"))
          .as("contamination"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style REPETITION filters (Rae et al. 2021 §A1.1, the
    * within-document half the t07 composite rules don't cover):
    * most-common-token fraction, duplicate 2-gram / 3-gram fractions,
    * and the keep decision. Pure per-row lambda work over the let-bound
    * token array (no shuffle; the distinct×n scan is O(tokens²) worst
    * case per DOCUMENT, bounded by document length — the right
    * distributed shape, vs an explode+groupBy which would shuffle every
    * token). */
  private val t10 = QDef(
    "t10_repetition_rules",
    """WITH tk AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tk
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) = 0 THEN NULL ELSE
      |      CAST(list_max(list_transform(list_distinct(tk),
      |        t -> len(list_filter(tk, x -> x = t)))) AS DOUBLE) / len(tk) END AS top_word_frac,
      |    CASE WHEN len(tk) < 2 THEN NULL ELSE
      |      CAST(1 AS DOUBLE) - CAST(len(list_distinct(list_transform(range(1, len(tk)),
      |        i -> tk[i] || ' ' || tk[i+1]))) AS DOUBLE) / (len(tk) - 1) END AS dup_2gram_frac,
      |    CASE WHEN len(tk) < 3 THEN NULL ELSE
      |      CAST(1 AS DOUBLE) - CAST(len(list_distinct(list_transform(range(1, len(tk) - 1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS DOUBLE) / (len(tk) - 2) END AS dup_3gram_frac
      |  FROM tk)
      |SELECT doc_id, top_word_frac, dup_2gram_frac, dup_3gram_frac,
      |  (top_word_frac <= 0.10 AND dup_2gram_frac <= 0.03 AND dup_3gram_frac <= 0.02) AS keep
      |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val metricsE = bind(toksE, "tk") { tk =>
      val top = s"""CASE WHEN size($tk) = 0 THEN NULL ELSE
        |  CAST(array_max(transform(array_distinct($tk),
        |    t -> size(filter($tk, x -> x = t)))) AS DOUBLE) / size($tk) END""".stripMargin
      val d2 = s"""CASE WHEN size($tk) < 2 THEN NULL ELSE
        |  CAST(1 AS DOUBLE) - CAST(size(array_distinct(transform(sequence(0, size($tk) - 2),
        |    i -> concat(element_at($tk, i + 1), ' ', element_at($tk, i + 2))))) AS DOUBLE)
        |    / (size($tk) - 1) END""".stripMargin
      val d3 = s"""CASE WHEN size($tk) < 3 THEN NULL ELSE
        |  CAST(1 AS DOUBLE) - CAST(size(array_distinct(transform(sequence(0, size($tk) - 3),
        |    i -> concat(element_at($tk, i + 1), ' ', element_at($tk, i + 2), ' ', element_at($tk, i + 3))))) AS DOUBLE)
        |    / (size($tk) - 2) END""".stripMargin
      s"struct(($top) AS twf, ($d2) AS d2f, ($d3) AS d3f)"
    }
    Tables.documents(s, d)
      .select(col("doc_id"), expr(metricsE).as("m"))
      .select(col("doc_id"),
        col("m.twf").as("top_word_frac"),
        col("m.d2f").as("dup_2gram_frac"),
        col("m.d3f").as("dup_3gram_frac"))
      .withColumn("keep",
        col("top_word_frac") <= 0.10 && col("dup_2gram_frac") <= 0.03 &&
          col("dup_3gram_frac") <= 0.02)
      .orderBy(col("doc_id"))
  }

  /** Deterministic bottom-k (KMV) sample per language via the
    * `bottom_k` typed Aggregator ([[graft.functions.BottomKAgg]]):
    * the k docs with smallest md5(text) per group — reproducible on any
    * cluster/partitioning, O(k) state with map-side partial
    * aggregation (the window-function oracle formulation sorts every
    * row; the Aggregator is the scale shape). */
  private val t11 = QDef(
    "t11_bottomk_sample",
    """WITH r AS (
      |  SELECT lang, md5(text) AS h, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rank
      |  FROM documents)
      |SELECT lang, CAST(rank AS INTEGER) AS rank, h, doc_id
      |FROM r WHERE rank <= 8 ORDER BY lang, rank""".stripMargin) { (s, d) =>
    val fn = graft.functions.BottomKAgg.register(s, 8)
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(call_function(fn, md5(col("text")), col("doc_id")).as("sample"))
      .select(col("lang"), posexplode(col("sample")).as(Seq("pos", "item")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("item._1").as("h"), col("item._2").as("doc_id"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Corpus vocabulary profile: top-10 tokens per language by frequency
    * (tokenizer-coverage / Zipf sanity check). The one token-level
    * SHUFFLE in the text suite: explode to (lang, token), hash-aggregate
    * counts (map-side partial combine keeps the shuffle narrow), then a
    * per-lang rank. Ties break lexicographically for determinism. */
  private val t12 = QDef(
    "t12_vocab_topk",
    """WITH t AS (
      |  SELECT lang, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
      |  FROM documents),
      |c AS (SELECT lang, tok, COUNT(*) AS n FROM t GROUP BY lang, tok),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rnk FROM c)
      |SELECT lang, CAST(rnk AS INTEGER) AS rnk, tok, n
      |FROM r WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("tok"))
    Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("lang"), col("rnk").cast("int").as("rnk"), col("tok"), col("n"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** PII patterns shared by the Spark and DuckDB sides of t13. Written
    * in the common subset of Java regex and RE2 (character classes,
    * bounded repeats, no lookaround) so both engines match identically;
    * applied in this order (email before ip: an email's host can
    * contain a dotted quad). The phone (3-3-4) and SSN (3-2-4) shapes
    * cannot overlap, so their order is immaterial. */
  private val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "<IP>",
    "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}" -> "<PHONE>",
    "[0-9]{3}-[0-9]{2}-[0-9]{4}" -> "<SSN>")

  /** PII redaction — the scrub stage every pretraining pipeline runs:
    * count then mask emails / IPv4s / phone numbers / SSN-shaped ids.
    * Pure per-row regex work (codegen'd `regexp_replace` chain, one
    * scan, no shuffle) — embarrassingly parallel at 100 TB. */
  private val t13 = QDef(
    "t13_pii_redaction", {
      val counts = piiPatterns.map { case (p, tag) =>
        val name = tag.stripPrefix("<").stripSuffix(">").toLowerCase
        s"CAST(len(regexp_extract_all(text, '$p')) AS INTEGER) AS n_$name"
      }.mkString(",\n  ")
      val cleaned = piiPatterns.foldLeft("text") { case (acc, (p, tag)) =>
        s"regexp_replace($acc, '$p', '$tag', 'g')"
      }
      s"""SELECT doc_id,
         |  $counts,
         |  $cleaned AS clean_text
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val withCounts = piiPatterns.foldLeft(base) { case (df, (p, tag)) =>
      val name = tag.stripPrefix("<").stripSuffix(">").toLowerCase
      df.withColumn(s"n_$name", regexp_count(col("text"), lit(p)))
    }
    val cleaned = piiPatterns.foldLeft(col("text")) { case (acc, (p, tag)) =>
      regexp_replace(acc, p, tag)
    }
    withCounts
      .withColumn("clean_text", cleaned)
      .drop("text")
      .orderBy(col("doc_id"))
  }

  /** TF-IDF top-3 terms per document. IDF is the ln-free rational form
    * n_docs/df (same discounting direction, and — unlike `ln` — IEEE
    * division is fully determined, so the score doubles are bit-equal
    * across engines; transcendentals are only semi-monotonic in Java).
    *
    * Scale shape: explode to narrow (doc_id, term) rows → two
    * map-side-combined hash aggregates (tf, then df) → shuffle join on
    * the term key (vocabulary-sized, NOT corpus-sized — at 100 TB the
    * df table is the small side and AQE broadcasts it) → per-doc
    * window top-k. No all-pairs stage anywhere. */
  private val t14 = QDef(
    "t14_tfidf_topk",
    """WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY doc_id, term),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |sc AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk FROM sc)
      |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, tf, df, score
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs").cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast("int").as("rnk"),
        col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Per-language heavy hitters through the Misra-Gries aggregator
    * ([[graft.functions.HeavyHittersAgg]]): bounded O(k) state with
    * map-side partial aggregation — the scale shape for "top terms
    * over 100 TB" where exact GROUP BY would shuffle the full
    * vocabulary. The emission gate est·(k+1) > N is the sketch's
    * guarantee threshold; with k=40 ≥ the fixture vocabulary the
    * sketch is in its exact regime, so plain GROUP BY counts are a
    * valid DuckDB oracle for the whole aggregator path. */
  private val t16 = QDef(
    "t16_heavy_hitters",
    """WITH t AS (
      |  SELECT lang, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
      |  FROM documents),
      |c AS (SELECT lang, tok, COUNT(*) AS n FROM t GROUP BY lang, tok),
      |tot AS (SELECT lang, COUNT(*) AS total FROM t GROUP BY lang)
      |SELECT c.lang, c.tok, c.n
      |FROM c JOIN tot ON c.lang = tot.lang
      |WHERE c.n * 41 > tot.total
      |ORDER BY c.lang, c.n DESC, c.tok""".stripMargin) { (s, d) =>
    val fn = graft.functions.HeavyHittersAgg.register(s, 40)
    Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("lang"))
      .agg(expr(s"$fn(tok)").as("hh"), count(lit(1)).as("total"))
      .select(col("lang"), col("total"), explode(col("hh")).as("e"))
      .select(col("lang"), col("e._1").as("tok"), col("e._2").as("n"), col("total"))
      .filter(col("n") * 41 > col("total"))
      .select(col("lang"), col("tok"), col("n"))
      .orderBy(col("lang"), col("n").desc, col("tok"))
  }

  /** GPT-style sequence packing: concatenate the corpus in doc_id
    * order and split into fixed 2048-token training blocks — each doc
    * gets its global token offset and the block span it lands in (the
    * bookkeeping a pretraining dataloader needs for
    * concatenate-and-chunk batching).
    *
    * The global offset is a PREFIX SUM, and the scale trap is writing
    * it as one unpartitioned window (a single task scanning the
    * corpus). This runs the textbook two-level distributed scan
    * instead: an intra-bucket running sum (window PARTITIONED by
    * bucket), bucket totals (tiny — one row per 100 docs), an
    * exclusive scan over just those totals (the only unpartitioned
    * window, over #buckets rows), and a bucket-key join to add the
    * bucket base back. At 100 TB you'd add a third level; the shape is
    * the same. The DuckDB oracle uses the single-window formulation —
    * same numbers, different execution shape. */
  private val t17 = QDef(
    "t17_sequence_packing",
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tok
       |  FROM documents),
       |o AS (
       |  SELECT doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM tk)
       |SELECT doc_id, n_tok, start_off,
       |  start_off // 2048 AS first_block,
       |  CASE WHEN n_tok = 0 THEN start_off // 2048
       |       ELSE (start_off + n_tok - 1) // 2048 END AS last_block,
       |  CASE WHEN n_tok = 0 THEN CAST(1 AS BIGINT)
       |       ELSE (start_off + n_tok - 1) // 2048 - start_off // 2048 + 1 END AS n_blocks
       |FROM o ORDER BY doc_id""".stripMargin) { (s, d) =>
    val B = 2048L
    val tk = Tables.documents(s, d)
      .select(col("doc_id"),
        size(expr(toksE)).cast("long").as("n_tok"),
        (col("doc_id") / 100).cast("long").as("bucket"))
    val W = org.apache.spark.sql.expressions.Window
    val wIntra = W.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val intra = tk.withColumn("intra",
      coalesce(sum(col("n_tok")).over(wIntra), lit(0L)))
    val wBuckets = W.orderBy(col("bucket")).rowsBetween(W.unboundedPreceding, -1)
    val boff = tk.groupBy(col("bucket")).agg(sum(col("n_tok")).as("btot"))
      .withColumn("base", coalesce(sum(col("btot")).over(wBuckets), lit(0L)))
      .select(col("bucket"), col("base"))
    intra.join(broadcast(boff), Seq("bucket"))
      .withColumn("start_off", col("base") + col("intra"))
      .withColumn("first_block", expr(s"start_off div $B"))
      .withColumn("last_block",
        when(col("n_tok") === 0, col("first_block"))
          .otherwise(expr(s"(start_off + n_tok - 1) div $B")))
      .withColumn("n_blocks",
        when(col("n_tok") === 0, lit(1L))
          .otherwise(col("last_block") - col("first_block") + 1))
      .select(col("doc_id"), col("n_tok"), col("start_off"),
        col("first_block"), col("last_block"), col("n_blocks"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-global SPAN dedup (the C4/CCNet exact-substring pass, on
    * fixed 10-token chunks since the fixture has no line structure):
    * every 10-token chunk keeps only its FIRST occurrence corpus-wide
    * (first = min (doc_id, chunk_idx) — deterministic), and each doc's
    * text is rebuilt from its surviving chunks.
    *
    * Scale shape: explode to (chunk_hash, doc_id, idx) — narrow rows,
    * never the chunk text through the dedup shuffle except as the one
    * carried column for reassembly — one window shuffle on the chunk
    * hash picks winners, one doc-key aggregate rebuilds the text.
    * Chunk hashes are md5-derived ([[CrossHash.h64E]]) so the DuckDB
    * oracle reproduces them. */
  private val t15 = QDef(
    "t15_chunk_dedup",
    s"""WITH tk AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
       |  FROM documents),
       |ix AS (
       |  SELECT doc_id, tk,
       |    unnest(range(0, CASE WHEN len(tk) = 0 THEN 0 ELSE (len(tk) - 1) // 10 + 1 END)) AS idx
       |  FROM tk),
       |c AS (
       |  SELECT doc_id, idx, array_to_string(tk[idx * 10 + 1 : idx * 10 + 10], ' ') AS chunk
       |  FROM ix),
       |r AS (
       |  SELECT doc_id, idx, chunk,
       |    ROW_NUMBER() OVER (PARTITION BY ${sqlH64("chunk")} ORDER BY doc_id, idx) AS rn
       |  FROM c),
       |k AS (
       |  SELECT doc_id, COUNT(*) AS n_kept,
       |    string_agg(chunk, ' ' ORDER BY idx) AS clean_text
       |  FROM r WHERE rn = 1 GROUP BY doc_id),
       |n AS (SELECT doc_id, CASE WHEN len(tk) = 0 THEN 0 ELSE (len(tk) - 1) // 10 + 1 END AS n_chunks FROM tk)
       |SELECT n.doc_id, CAST(n.n_chunks AS BIGINT) AS n_chunks,
       |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       |  COALESCE(k.clean_text, '') AS clean_text
       |FROM n LEFT JOIN k ON k.doc_id = n.doc_id
       |ORDER BY n.doc_id""".stripMargin) { (s, d) =>
    val chunksE = bind(toksE, "tk")(tk =>
      s"""CASE WHEN size($tk) = 0 THEN array()
         |  ELSE transform(sequence(0, (size($tk) - 1) div 10),
         |         i -> array_join(slice($tk, i * 10 + 1, 10), ' ')) END""".stripMargin)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), expr(chunksE).as("chunks"))
    val exploded = docs
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("idx", "chunk")))
      .withColumn("ch", expr(h64E("chunk")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ch")).orderBy(col("doc_id"), col("idx"))
    val kept = exploded.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        expr("array_join(transform(array_sort(collect_list(struct(idx, chunk))), s -> s.chunk), ' ')")
          .as("clean_text"))
    docs.select(col("doc_id"), size(col("chunks")).cast("long").as("n_chunks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Domain-mixture resampling with fractional epochs — the dataset
    * mixing step before pretraining (the SlimPajama/Dolma "source
    * weights" pass): each language gets a target epoch count in
    * thousandths (en 0.7 = downsample the head domain, es 2.25 =
    * upsample), every doc is replicated floor(w) times plus one more
    * when its hash residue falls under the fractional part (so the
    * realized rate converges to w per domain with zero RNG state), and
    * the output is globally shuffled by a deterministic hash sort key.
    *
    * Scale shape: broadcast 5-row weight table, per-row integer
    * arithmetic, explode fan-out bounded by max epochs, then ONE
    * range-partitioned distributed sort on the shuffle key — exactly
    * the "shuffle the corpus" pass a 100 TB pretraining run does.
    * Hashes are md5-derived ([[CrossHash.h64E]]) so the oracle replays
    * the selection and the shuffle order bit-exactly. */
  private val t18 = QDef(
    "t18_domain_mix",
    s"""WITH w(lang, mills) AS (
       |  VALUES ('en', 700), ('de', 1500), ('es', 2250), ('fr', 1000), ('zh', 500)),
       |d AS (
       |  SELECT doc_id, d.lang, mills,
       |    ${sqlH64("d.lang || '#' || doc_id")} % 1000 AS r
       |  FROM documents d JOIN w ON w.lang = d.lang),
       |c AS (
       |  SELECT doc_id, lang,
       |    mills // 1000 + CASE WHEN r < mills % 1000 THEN 1 ELSE 0 END AS n
       |  FROM d),
       |x AS (
       |  SELECT lang, doc_id,
       |    CAST(unnest(generate_series(1, CAST(n AS BIGINT))) AS INTEGER) AS copy
       |  FROM c WHERE n >= 1)
       |SELECT lang, doc_id, copy, ${sqlH64("doc_id || '#' || copy")} AS skey
       |FROM x ORDER BY skey, doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val weights = Seq(("en", 700), ("de", 1500), ("es", 2250),
      ("fr", 1000), ("zh", 500)).toDF("lang", "mills")
    Tables.documents(s, d)
      .join(broadcast(weights), Seq("lang"))
      .withColumn("r", expr(s"${h64E("concat(lang, '#', doc_id)")} % 1000"))
      .withColumn("n", expr("mills div 1000 + IF(r < mills % 1000, 1, 0)"))
      .where(col("n") >= 1)
      .select(col("lang"), col("doc_id"),
        explode(sequence(lit(1), col("n").cast("int"))).as("copy"))
      .withColumn("skey", expr(h64E("concat(doc_id, '#', copy)")))
      .orderBy(col("skey"), col("doc_id"))
  }

  /** Curriculum interleaving: rank docs easy→hard per language, cut the
    * per-lang rank into fixed-width stages, and give each doc a
    * deterministic shuffle key within its stage — the "sorted stages,
    * shuffled within stage" schedule of curriculum training (Bengio
    * 2009), with every language progressing through difficulty in
    * lockstep.
    *
    * The per-lang rank is computed WITHOUT a single-partition global
    * sort: pass 1 aggregates (lang, difficulty) counts (tiny) and turns
    * them into cumulative offsets; pass 2 takes a row_number only
    * within each (lang, difficulty) tie group and adds the broadcast
    * offset. At 100 TB the wide data never funnels through one
    * partition — the only skew risk is a tie-dense difficulty value,
    * bounded by the score's resolution. */
  private val t19 = {
    import CrossHash.{h64E, sqlH64}
    QDef(
      "t19_curriculum",
      s"""WITH sc AS (
         |  SELECT doc_id, lang,
         |    2 * len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
         |      + len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS difficulty
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, difficulty,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY difficulty, doc_id) AS rk
         |  FROM sc)
         |SELECT lang, doc_id, CAST(difficulty AS BIGINT) AS difficulty,
         |  CAST(rk AS BIGINT) AS rk, CAST((rk - 1) // 50 AS BIGINT) AS stage,
         |  ${sqlH64("doc_id || '#' || ((rk - 1) // 50)")} AS skey
         |FROM r ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
      val scored = Tables.documents(s, d)
        .withColumn("difficulty",
          (size(tokens(col("text"))) * 2 +
            size(array_distinct(tokens(col("text"))))).cast("long"))
        .select(col("doc_id"), col("lang"), col("difficulty"))
      val off = scored.groupBy(col("lang"), col("difficulty"))
        .agg(count(lit(1)).as("c"))
        .withColumn("off",
          sum(col("c")).over(w.partitionBy(col("lang")).orderBy(col("difficulty"))) - col("c"))
        .select(col("lang"), col("difficulty"), col("off"))
      scored
        .join(broadcast(off), Seq("lang", "difficulty"))
        .withColumn("rk",
          (col("off") + row_number().over(
            w.partitionBy(col("lang"), col("difficulty")).orderBy(col("doc_id")))).cast("long"))
        .withColumn("stage", expr("(rk - 1) div 50").cast("long"))
        .select(col("lang"), col("doc_id"), col("difficulty"), col("rk"), col("stage"),
          expr(h64E("concat(doc_id, '#', stage)")).as("skey"))
        .orderBy(col("lang"), col("doc_id"))
    }
  }

  /** Dataset card: the per-language release summary a data team ships
    * with a corpus — volume, exact-dup rate, token-shape and quality
    * aggregates in one table. Every ratio reduces to integer sums
    * divided once at the end, so the card is bit-deterministic with no
    * decimal-sum machinery. Two corpus scans (hash-dup counting needs
    * the text hashed before the per-lang rollup), both hash aggregates
    * with map-side combine. */
  private val t24 = QDef(
    "t24_dataset_card",
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens,
       |    length(replace(text, ' ', '')) AS n_nonspace,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x IN $sqlStops)) AS n_stop,
       |    md5(text) AS h
       |  FROM documents),
       |dupc AS (SELECT h, COUNT(*) AS c FROM t GROUP BY h)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(n_nonspace) AS DOUBLE) / CAST(SUM(n_tokens) AS BIGINT) AS mean_token_len,
       |  CAST(SUM(n_stop) AS DOUBLE) / CAST(SUM(n_tokens) AS BIGINT) AS stop_ratio,
       |  CAST(SUM(CASE WHEN dupc.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate,
       |  CAST(SUM(CASE WHEN n_tokens >= 5
       |                 AND CAST(n_stop AS DOUBLE) / n_tokens < CAST(0.5 AS DOUBLE)
       |            THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS quality_rate
       |FROM t JOIN dupc USING (h)
       |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val stopArr = array(stopwords.map(lit): _*)
    val t = Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("n_nonspace", length(regexp_replace(col("text"), " ", "")))
      .withColumn("n_stop",
        size(filter(tokens(col("text")), t => array_contains(stopArr, t))))
      .withColumn("h", md5(col("text")))
    val dupc = t.groupBy(col("h")).agg(count(lit(1)).as("c"))
    t.join(dupc, Seq("h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_nonspace")).cast("double") / sum(col("n_tokens")))
          .as("mean_token_len"),
        (sum(col("n_stop")).cast("double") / sum(col("n_tokens")))
          .as("stop_ratio"),
        (sum(when(col("c") > 1, 1).otherwise(0)).cast("double") / count(lit(1)))
          .as("dup_rate"),
        (sum(when(col("n_tokens") >= 5 &&
            col("n_stop").cast("double") / col("n_tokens") < 0.5, 1).otherwise(0))
          .cast("double") / count(lit(1))).as("quality_rate"))
      .orderBy(col("lang"))
  }

  /** Memorization-risk scan: the fraction of each document's distinct
    * 8-grams that also occur in at least one OTHER document. High
    * cross-document n-gram sharing marks boilerplate/templated text the
    * model will see many times — the corpus-internal complement of
    * t09's eval-set contamination and t10's within-doc repetition.
    *
    * Scale shape: distinct gram hashes per doc (per-row), ONE gram-key
    * aggregate for document frequencies, one gram-key join back — the
    * inverted-index pattern; the shuffle carries (hash, doc_id) pairs
    * only. A gram shared by EVERY doc is the worst skew case; the
    * doc-frequency table is aggregated before the join so the hot key
    * collapses to one row per gram first. */
  private val t23 = QDef(
    "t23_memorization_scan", {
      val gram = (1 to 8).map(j => s"tk[i+${j - 1}]").mkString(" || ' ' || ")
      s"""WITH tk AS (
         |  SELECT doc_id, text,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, CASE WHEN len(tk) >= 8
         |    THEN list_distinct(list_transform(range(1, len(tk) - 6), i -> ${sqlH64(gram)}))
         |    ELSE [${sqlH64("text")}] END AS sh
         |  FROM tk),
         |e AS (SELECT doc_id, unnest(sh) AS h FROM sh),
         |f AS (SELECT h, COUNT(*) AS n_docs FROM e GROUP BY h),
         |tot AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams FROM sh),
         |s AS (
         |  SELECT e.doc_id, COUNT(*) AS n_shared
         |  FROM e JOIN f USING (h) WHERE f.n_docs >= 2 GROUP BY e.doc_id)
         |SELECT tot.doc_id, tot.n_grams,
         |  CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
         |  CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / tot.n_grams AS shared_frac,
         |  (CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / tot.n_grams) >= CAST(0.2 AS DOUBLE) AS risk
         |FROM tot LEFT JOIN s ON s.doc_id = tot.doc_id
         |ORDER BY tot.doc_id""".stripMargin
    }) { (s, d) =>
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), expr(gram8E).as("sh")).persistTracked()
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("h"))
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
    val shared = ex.join(dfreq, Seq("h")).where(col("n_docs") >= 2)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_grams"))
          .as("shared_frac"),
        ((coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_grams"))
          >= lit(0.2).cast("double")).as("risk"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer-vocabulary coverage audit: per-document out-of-vocab
    * token share against the corpus top-K vocabulary — the "will this
    * vocab cover the data" gate run before committing to a tokenizer.
    *
    * Scale shape: one corpus scan for token frequencies (hash agg,
    * map-side combined), top-K via TakeOrdered (partial per partition),
    * the K-token vocab collapsed to ONE array row and broadcast — the
    * wide per-document pass is then pure codegen'd expression work with
    * zero shuffle. */
  private val t21 = QDef(
    "t21_oov_audit",
    """WITH tk AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
      |  FROM documents),
      |tf AS (SELECT tok, COUNT(*) AS freq FROM tk GROUP BY tok),
      |vtop AS (SELECT tok FROM tf ORDER BY freq DESC, tok LIMIT 20),
      |va AS (SELECT list(tok ORDER BY tok) AS vl FROM vtop),
      |dd AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents)
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(toks, t -> NOT list_contains(vl, t))) AS BIGINT) AS n_oov,
      |  CASE WHEN len(toks) = 0 THEN NULL
      |       ELSE CAST(len(list_filter(toks, t -> NOT list_contains(vl, t))) AS DOUBLE)
      |              / len(toks) END AS oov_rate
      |FROM dd, va ORDER BY doc_id""".stripMargin) { (s, d) =>
    val va = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(20)
      .agg(sort_array(collect_list(col("tok"))).as("vl"))
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .crossJoin(broadcast(va))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_oov",
        size(filter(col("toks"), t => !array_contains(col("vl"), t))).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** DSIR-style data selection (Xie 2023): per-document importance
    * weight for a TARGET domain (here lang='en') via unigram
    * likelihood ratios — the "select raw data that looks like the
    * target" pass used to curate pretraining mixes. The paper's hashed
    * n-gram log-ratio product is expressed here as a mean of linear
    * per-token ratios p_target(tok)/p_raw(tok): ln/exp are not
    * cross-engine-deterministic, a linear mean is, and the ranking it
    * induces serves the same selection.
    *
    * Scale shape: two token-frequency hash aggregates (one corpus
    * scan), a vocab-sized ratio table joined back on the token key, and
    * one doc-key aggregate whose float sum is decimal-exact
    * ([[graft.util.Det.dsum]] — order-free, so partition merge order
    * never changes the answer). Nothing all-pairs, nothing global. */
  private val t22 = QDef(
    "t22_dsir_weights",
    s"""WITH tk AS (
       |  SELECT doc_id, lang,
       |    unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
       |  FROM documents),
       |ta AS (SELECT tok, COUNT(*) AS f_all FROM tk GROUP BY tok),
       |te AS (SELECT tok, COUNT(*) AS f_en FROM tk WHERE lang = 'en' GROUP BY tok),
       |tot AS (SELECT (SELECT COUNT(*) FROM tk) AS tot_all,
       |               (SELECT COUNT(*) FROM tk WHERE lang = 'en') AS tot_en),
       |r AS (
       |  SELECT ta.tok,
       |    (CAST(coalesce(te.f_en, 0) AS DOUBLE) / ta.f_all)
       |      * (CAST(tot.tot_all AS DOUBLE) / tot.tot_en) AS ratio
       |  FROM ta LEFT JOIN te USING (tok), tot),
       |ds AS (
       |  SELECT tk.doc_id, COUNT(*) AS n_tokens,
       |    ${graft.util.Det.sqlDsum("r.ratio")} / COUNT(*) AS score
       |  FROM tk JOIN r USING (tok) GROUP BY tk.doc_id)
       |SELECT d.doc_id, d.lang, coalesce(ds.n_tokens, 0) AS n_tokens, ds.score,
       |  coalesce(ds.score >= CAST(1 AS DOUBLE), FALSE) AS keep
       |FROM documents d LEFT JOIN ds ON ds.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    import graft.util.Det.dsum
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("tok"))
    val tfAll = toks.groupBy(col("tok")).agg(count(lit(1)).as("f_all"))
    val tfEn = toks.where(col("lang") === "en")
      .groupBy(col("tok")).agg(count(lit(1)).as("f_en"))
    val tot = toks.agg(count(lit(1)).as("tot_all"),
      count(when(col("lang") === "en", 1)).as("tot_en"))
    val ratios = tfAll.join(tfEn, Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .select(col("tok"),
        ((coalesce(col("f_en"), lit(0L)).cast("double") / col("f_all"))
          * (col("tot_all").cast("double") / col("tot_en"))).as("ratio"))
    val ds = toks.join(ratios, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), (dsum(col("ratio")) / count(lit(1))).as("score"))
    docs.select(col("doc_id"), col("lang"))
      .join(ds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("score"),
        coalesce(col("score") >= lit(1.0).cast("double"), lit(false)).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** BPE merge-pair learning (Sennrich 2016), two merge rounds
    * unrolled — the tokenizer-training pass of an LLM data pipeline.
    *
    * The corpus is scanned ONCE (token-frequency hash aggregate,
    * map-side combined); every later step runs on the distinct-token
    * VOCAB, which is sublinear in corpus size — at 100 TB the pair
    * counts, merge selection (TakeOrdered top-1: partial per partition,
    * no global sort), and merge application (broadcast of one row)
    * never touch the documents again. Merge application uses
    * scan-replace on the space-joined symbol string, applied twice to
    * catch occurrences that share a boundary space with a prior match —
    * a deterministic rule both engines implement identically (plain
    * left-to-right non-overlapping `replace`), which is what makes the
    * round-2 counts oracle-exact. All-ASCII corpus ⇒ per-char regex
    * splitting agrees across engines; no floats anywhere. */
  private val t20 = {
    def sqlPairs(v: String) =
      s"""  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq,
         |      unnest(list_transform(range(1, len(string_split(seq, ' '))),
         |        i -> string_split(seq, ' ')[i] || ' ' || string_split(seq, ' ')[i + 1])) AS pair
         |    FROM $v)
         |  GROUP BY pair""".stripMargin
    def sqlApply(m: String) =
      s"""trim(replace(replace(' ' || seq || ' ',
         |      ' ' || $m.pair || ' ', ' ' || replace($m.pair, ' ', '') || ' '),
         |      ' ' || $m.pair || ' ', ' ' || replace($m.pair, ' ', '') || ' '))""".stripMargin
    QDef(
      "t20_bpe_merges",
      s"""WITH tk AS (
         |  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
         |  FROM documents),
         |v0 AS (
         |  SELECT tok, COUNT(*) AS freq,
         |    trim(regexp_replace(tok, '(.)', '\\1 ', 'g')) AS seq
         |  FROM tk GROUP BY tok),
         |p1 AS (
         |${sqlPairs("v0")}),
         |m1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
         |v1 AS (
         |  SELECT tok, freq, ${sqlApply("m1")} AS seq, m1.pair AS merge1
         |  FROM v0, m1),
         |p2 AS (
         |${sqlPairs("v1")}),
         |m2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
         |v2 AS (
         |  SELECT tok, freq, ${sqlApply("m2")} AS seq, merge1, m2.pair AS merge2
         |  FROM v1, m2)
         |SELECT tok, freq, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_syms,
         |  merge1, merge2
         |FROM v2 ORDER BY tok""".stripMargin) { (s, d) =>
      def pairCount(v: DataFrame): DataFrame = v
        .withColumn("syms", split(col("seq"), " "))
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      def top1(pc: DataFrame, as: String): DataFrame =
        pc.orderBy(col("cnt").desc, col("pair")).limit(1).select(col("pair").as(as))
      def applyMerge(v: DataFrame, m: DataFrame, mc: String): DataFrame = v
        .crossJoin(broadcast(m))
        .withColumn("seq", expr(
          s"""trim(replace(replace(concat(' ', seq, ' '),
             |  concat(' ', $mc, ' '), concat(' ', replace($mc, ' ', ''), ' ')),
             |  concat(' ', $mc, ' '), concat(' ', replace($mc, ' ', ''), ' ')))""".stripMargin))
      val v0 = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .withColumn("seq", expr("trim(regexp_replace(tok, '(.)', '$1 '))"))
        .persistTracked()
      val v1 = applyMerge(v0, top1(pairCount(v0), "merge1"), "merge1").persistTracked()
      val v2 = applyMerge(v1, top1(pairCount(v1), "merge2"), "merge2")
      v2.select(col("tok"), col("freq"),
          size(split(col("seq"), " ")).cast("long").as("n_syms"),
          col("merge1"), col("merge2"))
        .orderBy(col("tok"))
    }
  }

  /** Sub-document segment-level dedup (the CCNet paragraph-dedup shape,
    * reference pipeline: Wenzek 2020): documents split into fixed
    * 8-token segments, every segment keeps only its FIRST corpus-wide
    * occurrence (first = min (doc_id, seg_idx)), and each document is
    * reassembled from its kept segments — shared boilerplate dedups out
    * of every copy but the canonical one, without dropping whole
    * documents the way t04 does.
    *
    * Scale shape: the keep decision groups on the segment's md5 digest
    * (constant-width key — the segment TEXT never rides the aggregate
    * shuffle), then one digest-keyed join flags keepers and one doc_id
    * aggregate reassembles. At 100 TB that is two hash shuffles, both on
    * narrow keys, no self-join, no skew hotspot (digests are uniform). */
  private val t25 = QDef(
    "t25_segment_dedup",
    """WITH tk AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tk
      |  FROM documents),
      |sg AS (
      |  SELECT doc_id, CAST(i.i AS INTEGER) AS seg_idx,
      |    array_to_string(tk[CAST(i.i AS INTEGER) * 8 + 1 : CAST(i.i AS INTEGER) * 8 + 8], ' ') AS seg
      |  FROM tk, unnest(range(0, CAST(ceil(len(tk) / 8.0) AS INTEGER))) AS i(i)),
      |k AS (SELECT md5(seg) AS h,
      |    MIN({'doc_id': doc_id, 'seg_idx': seg_idx}) AS ord FROM sg GROUP BY 1),
      |f AS (
      |  SELECT sg.*, {'doc_id': sg.doc_id, 'seg_idx': sg.seg_idx} = k.ord AS keep
      |  FROM sg JOIN k ON md5(sg.seg) = k.h),
      |a AS (
      |  SELECT doc_id, COUNT(*) AS n_segs,
      |    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |    md5(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE keep)) AS kept_md5
      |  FROM f GROUP BY doc_id)
      |SELECT doc_id, n_segs, n_kept, n_segs - n_kept AS n_dropped, kept_md5
      |FROM a ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sg = Tables.documents(s, d)
      .withColumn("tk", tokens(col("text")))
      .select(col("doc_id"), posexplode(expr(
        """CASE WHEN size(tk) = 0 THEN CAST(array() AS ARRAY<STRING>)
          |ELSE transform(sequence(0, CAST(ceil(size(tk) / 8.0D) AS INT) - 1),
          |       i -> array_join(slice(tk, i * 8 + 1, 8), ' '))
          |END""".stripMargin)).as(Seq("seg_idx", "seg")))
      // first-wins order is the (doc_id, seg_idx) STRUCT — arithmetic
      // packing (doc_id*1e6 + seg_idx) silently collides past 1M segments
      .withColumn("h", md5(col("seg")))
      .withColumn("ord", struct(col("doc_id"), col("seg_idx")))
    val keepers = sg.groupBy(col("h")).agg(min(col("ord")).as("min_ord"))
    sg.join(keepers, Seq("h"))
      .withColumn("keep", col("ord") === col("min_ord"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("seg_idx"), col("seg"))))),
            x => x.getField("seg")),
          " ")).as("md5_raw"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"),
        (col("n_segs") - col("n_kept")).as("n_dropped"),
        when(col("n_kept") > 0, col("md5_raw")).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  /** Bigram-LM quality scoring (the CCNet LM-filter shape, Wenzek 2020:
    * score every document against a language model trained on a
    * reference corpus — here the t08 train split — and gate on the
    * score). The statistic is the mean PREDICTABILITY RATIO
    * r = V·(c₂+1)/(c₁+V) — the add-one-smoothed conditional bigram
    * probability relative to the uniform baseline 1/V — so r = 1 means
    * "no better than uniform" and the keep gate is "above the train
    * split's mean score" (CCNet gates on the score distribution's
    * head/middle the same way). Ratios keep the arithmetic
    * bit-deterministic (each addend is one integer-ratio IEEE division;
    * [[graft.util.Det.dsum]] makes the sums order-independent) where a
    * log-likelihood would hinge on ln() agreeing across engines to the
    * last ulp. Train-split counts also make this the contamination-safe
    * form: eval docs are scored by a model that never saw them.
    *
    * Scale shape: ONE bigram-key aggregate over the train split (the
    * prefix counts roll up from the vocab-sized bigram table, not a
    * second corpus pass), two vocab-key joins, one doc-key mean — the
    * inverted-index pattern of t22, conditioned on the prefix token.
    * Hot prefix keys (stopwords) are the skew knob; AQE skew-join or a
    * broadcast of the (vocab-sized) count tables both apply. */
  private val t26 = {
    val splitSql =
      "CASE WHEN substring(md5(text), 1, 1) IN ('0','1','2') THEN 'eval' ELSE 'train' END"
    QDef(
      "t26_lm_quality",
      s"""WITH t AS (SELECT doc_id, $splitSql AS split,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |bi AS (
         |  SELECT doc_id, split,
         |    unnest(list_transform(range(1, len(tk)),
         |      i -> {'w1': tk[i], 'big': tk[i] || ' ' || tk[i + 1]})) AS b
         |  FROM t),
         |b2 AS (SELECT doc_id, split, b.w1 AS w1, b.big AS big FROM bi),
         |c2 AS (SELECT w1, big, COUNT(*) AS c2 FROM b2 WHERE split = 'train' GROUP BY w1, big),
         |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
         |vv AS (SELECT COUNT(DISTINCT u.tok) AS v
         |       FROM (SELECT unnest(tk) AS tok FROM t WHERE split = 'train') u),
         |c2j AS (SELECT big, c2 FROM c2),
         |r AS (
         |  SELECT b2.doc_id,
         |    CAST(vv.v * (coalesce(c2j.c2, 0) + 1) AS DOUBLE)
         |      / (coalesce(c1.c1, 0) + vv.v) AS r
         |  FROM b2 LEFT JOIN c2j USING (big) LEFT JOIN c1 USING (w1), vv),
         |ds AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |         ${graft.util.Det.sqlDsum("r.r")} / COUNT(*) AS lm_ratio
         |       FROM r GROUP BY doc_id),
         |tm AS (SELECT ${graft.util.Det.sqlDsum("ds.lm_ratio")} / COUNT(*) AS mu
         |       FROM ds JOIN t ON t.doc_id = ds.doc_id WHERE t.split = 'train')
         |SELECT d.doc_id, $splitSql AS split,
         |  coalesce(ds.n_bigrams, 0) AS n_bigrams, ds.lm_ratio,
         |  coalesce(ds.lm_ratio >= tm.mu, FALSE) AS keep
         |FROM documents d LEFT JOIN ds USING (doc_id), tm
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      import graft.util.Det.dsum
      val docs = Tables.documents(s, d)
        .withColumn("split",
          when(substring(md5(col("text")), 1, 1).isin("0", "1", "2"), "eval")
            .otherwise("train"))
        .withColumn("tk", tokens(col("text")))
      val bi = docs
        .select(col("doc_id"), col("split"), explode(expr(
          """CASE WHEN size(tk) >= 2
            |  THEN transform(sequence(1, size(tk) - 1),
            |         i -> named_struct(
            |           'w1', element_at(tk, i),
            |           'big', concat(element_at(tk, i), ' ', element_at(tk, i + 1))))
            |  ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, big: STRING>>)
            |END""".stripMargin)).as("b"))
        .select(col("doc_id"), col("split"),
          col("b.w1").as("w1"), col("b.big").as("big"))
      // ONE train-corpus aggregate; the prefix counts roll up from the
      // (vocab-sized) bigram table instead of a second corpus pass
      val c2 = bi.where(col("split") === "train")
        .groupBy(col("w1"), col("big")).agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
      val vv = docs.where(col("split") === "train")
        .select(explode(col("tk")).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
      val ds = bi
        .join(c2.select(col("big"), col("c2")), Seq("big"), "left")
        .join(c1, Seq("w1"), "left")
        .crossJoin(broadcast(vv))
        .withColumn("r",
          (col("v") * (coalesce(col("c2"), lit(0L)) + 1)).cast("double")
            / (coalesce(col("c1"), lit(0L)) + col("v")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          (dsum(col("r")) / count(lit(1))).as("lm_ratio"))
      val tm = ds.join(docs.where(col("split") === "train")
          .select(col("doc_id")), Seq("doc_id"))
        .agg((dsum(col("lm_ratio")) / count(lit(1))).as("mu"))
      docs.select(col("doc_id"), col("split"))
        .join(ds, Seq("doc_id"), "left")
        .crossJoin(broadcast(tm))
        .select(col("doc_id"), col("split"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("lm_ratio"),
          coalesce(col("lm_ratio") >= col("mu"), lit(false)).as("keep"))
        .orderBy(col("doc_id"))
    }
  }

  /** Robust per-language score normalization: each document's quality
    * score (t03's mean token length) is rescaled by its LANGUAGE's
    * median/IQR — (x−median)/IQR — with Tukey |z| > 1.5 outlier flags.
    * Quality thresholds never transfer across languages (Chinese
    * "words" are shorter than German ones); median/IQR normalization is
    * how a pipeline applies ONE gate corpus-wide. Exact interpolated
    * percentiles (q25 proved Spark `percentile` ≡ DuckDB
    * `quantile_cont` bit-for-bit); the scaled value is two IEEE
    * subtractions and one division on deterministic inputs.
    *
    * Scale shape: one scan for scores, one lang-key percentile
    * aggregate (languages ≪ corpus), stats broadcast back — zero
    * corpus-wide shuffle beyond the tiny aggregate. */
  private val t27 = QDef(
    "t27_robust_scores",
    """WITH sc AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) = 0
      |         THEN NULL
      |         ELSE CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |              / len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
      |    END AS score
      |  FROM documents),
      |st AS (
      |  SELECT lang, quantile_cont(score, 0.5) AS med,
      |    quantile_cont(score, 0.75) - quantile_cont(score, 0.25) AS iqr
      |  FROM sc GROUP BY lang)
      |SELECT sc.doc_id, sc.lang, sc.score,
      |  CASE WHEN st.iqr > 0 THEN (sc.score - st.med) / st.iqr END AS scaled,
      |  coalesce(abs(CASE WHEN st.iqr > 0 THEN (sc.score - st.med) / st.iqr END)
      |             > CAST(1.5 AS DOUBLE), FALSE) AS outlier
      |FROM sc JOIN st USING (lang)
      |ORDER BY sc.doc_id""".stripMargin) { (s, d) =>
    val sc = Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("score",
        when(col("n_tokens") === 0, lit(null))
          .otherwise(length(regexp_replace(col("text"), " ", "")).cast("double")
            / col("n_tokens")))
      .select(col("doc_id"), col("lang"), col("score"))
    val st = sc.groupBy(col("lang"))
      .agg(expr("percentile(score, 0.5D)").as("med"),
        (expr("percentile(score, 0.75D)") - expr("percentile(score, 0.25D)"))
          .as("iqr"))
    val scaled = when(col("iqr") > 0, (col("score") - col("med")) / col("iqr"))
    sc.join(broadcast(st), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("score"),
        scaled.as("scaled"),
        coalesce(abs(scaled) > lit(1.5).cast("double"), lit(false)).as("outlier"))
      .orderBy(col("doc_id"))
  }

  /** Boilerplate detection by cross-document chunk frequency (the CCNet
    * paragraph-hash pass, Wenzek 2020: a crawled corpus repeats
    * navigation/footer/license text across many pages — hash every
    * chunk, count DISTINCT documents per hash, and flag chunks above a
    * document-frequency threshold as boilerplate). Per doc: chunk
    * count, boilerplate-chunk count (df >= 3), and the boilerplate
    * ratio a cleaning pass gates on.
    *
    * Scale shape: identical to t15/t25's digest geometry — the chunk
    * TEXT never rides a shuffle, only md5 digests do. One digest-keyed
    * distinct-doc aggregate builds the document-frequency table, the
    * boilerplate set (df >= 3, corpus-wide TINY: repeated chunks only)
    * broadcasts back against the per-doc digests, one doc-key
    * aggregate reports. Hot digests (the boilerplate itself) are
    * exactly the rows the df aggregate's map-side combine collapses. */
  private val t28 = QDef(
    "t28_boilerplate_chunks",
    """WITH tk AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tk
      |  FROM documents),
      |sg AS (
      |  SELECT doc_id,
      |    md5(array_to_string(tk[CAST(i.i AS INTEGER) * 8 + 1 : CAST(i.i AS INTEGER) * 8 + 8], ' ')) AS dg
      |  FROM tk, unnest(range(0, CAST(ceil(len(tk) / 8.0) AS INTEGER))) AS i(i)),
      |df AS (SELECT dg, COUNT(DISTINCT doc_id) AS ndocs FROM sg GROUP BY dg),
      |b AS (SELECT dg FROM df WHERE ndocs >= 3),
      |cl AS (
      |  SELECT sg.doc_id, COUNT(*) AS n_segs,
      |    CAST(SUM(CASE WHEN b.dg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
      |  FROM sg LEFT JOIN b ON b.dg = sg.dg
      |  GROUP BY sg.doc_id)
      |SELECT doc_id, CAST(n_segs AS BIGINT) AS n_segs, n_boiler,
      |  CAST(n_boiler AS DOUBLE) / n_segs AS boiler_ratio
      |FROM cl ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sg = Tables.documents(s, d)
      .withColumn("tk", tokens(col("text")))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(tk) = 0 THEN CAST(array() AS ARRAY<STRING>)
          |ELSE transform(sequence(0, CAST(ceil(size(tk) / 8.0D) AS INT) - 1),
          |       i -> md5(array_join(slice(tk, i * 8 + 1, 8), ' ')))
          |END""".stripMargin)).as("dg"))
    val boiler = sg.groupBy(col("dg"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .where(col("ndocs") >= 3)
      .select(col("dg")).withColumn("isb", lit(true))
    sg.join(broadcast(boiler), Seq("dg"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("isb"), 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_segs"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_segs")).as("boiler_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Exact duplicated-span tiers (the Lee et al. 2022 "Deduplicating
    * Training Data" signal, seed-sized): for each span length n ∈
    * {4, 8, 16} tokens, how many of a document's distinct n-grams also
    * occur in ANOTHER document, and the longest tier with any hit — the
    * per-document evidence a substring-level dedup pass acts on (t15/
    * t25/t28 dedup fixed chunks; this measures SLIDING spans, so it
    * catches duplication at any alignment).
    *
    * Scale shape: per tier, one explode of distinct gram hashes (the
    * gram TEXT never rides a shuffle — only (hash, doc_id) pairs), one
    * hash-keyed aggregate whose duplicate test is min(doc_id) <>
    * max(doc_id) — O(1) mergeable state, so hot grams (stopword runs)
    * collapse map-side instead of fanning a countDistinct — one hash-
    * keyed join back, one doc-keyed count. The dup-gram set is
    * corpus-sized, so it is joined by shuffle, NOT broadcast (unlike
    * t28's tiny df>=3 boilerplate set). A shared 2n-gram implies shared
    * n-grams with the same counterpart, so tiers are monotone and
    * max_dup_tier is well-defined. */
  private val t29 = QDef(
    "t29_dup_span_tiers", {
      def tierCtes(n: Int) = {
        val gram = sqlH64(s"array_to_string(list_slice(tk, i, i + $n - 1), ' ')")
        s"""g$n AS (
           |  SELECT doc_id, unnest(CASE WHEN len(tk) >= $n
           |    THEN list_distinct(list_transform(range(1, len(tk) - $n + 2), i -> $gram))
           |    ELSE []::BIGINT[] END) AS h FROM tk),
           |d$n AS (SELECT h FROM g$n GROUP BY h HAVING min(doc_id) <> max(doc_id)),
           |c$n AS (SELECT doc_id, count(*) AS c FROM g$n JOIN d$n USING (h) GROUP BY doc_id)""".stripMargin
      }
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |${Seq(4, 8, 16).map(tierCtes).mkString(",\n")}
         |SELECT tk.doc_id,
         |  CAST(coalesce(c4.c, 0) AS BIGINT) AS n_dup4,
         |  CAST(coalesce(c8.c, 0) AS BIGINT) AS n_dup8,
         |  CAST(coalesce(c16.c, 0) AS BIGINT) AS n_dup16,
         |  CAST(CASE WHEN coalesce(c16.c, 0) > 0 THEN 16
         |            WHEN coalesce(c8.c, 0) > 0 THEN 8
         |            WHEN coalesce(c4.c, 0) > 0 THEN 4 ELSE 0 END AS INTEGER) AS max_dup_tier
         |FROM tk LEFT JOIN c4 ON tk.doc_id = c4.doc_id
         |        LEFT JOIN c8 ON tk.doc_id = c8.doc_id
         |        LEFT JOIN c16 ON tk.doc_id = c16.doc_id
         |ORDER BY tk.doc_id""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    def gramsE(n: Int): String = bind(toksE, "tk")(tk =>
      s"""CASE WHEN size($tk) >= $n
         |  THEN array_distinct(transform(sequence(0, size($tk) - $n),
         |         i -> ${h64E(s"array_join(slice($tk, i + 1, $n), ' ')")}))
         |  ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)
    def dupCounts(n: Int): DataFrame = {
      val pairs = docs
        .select(col("doc_id"), explode(expr(gramsE(n))).as("h"))
        .persistTracked()
      val dups = pairs.groupBy(col("h"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .where(col("mn") =!= col("mx"))
        .select(col("h"))
      pairs.join(dups, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as(s"n_dup$n"))
    }
    def n(c: String): Column = coalesce(col(c), lit(0L))
    docs.select(col("doc_id"))
      .join(dupCounts(4), Seq("doc_id"), "left")
      .join(dupCounts(8), Seq("doc_id"), "left")
      .join(dupCounts(16), Seq("doc_id"), "left")
      .select(col("doc_id"),
        n("n_dup4").as("n_dup4"), n("n_dup8").as("n_dup8"),
        n("n_dup16").as("n_dup16"),
        when(n("n_dup16") > 0, 16).when(n("n_dup8") > 0, 8)
          .when(n("n_dup4") > 0, 4).otherwise(0)
          .cast("int").as("max_dup_tier"))
      .orderBy(col("doc_id"))
  }

  /** Duplicated-span REMOVAL — the action side of t29's measurement
    * (Lee et al. 2022 apply exactly this: delete any span that appears
    * verbatim in another document): every token covered by a shared
    * 16-gram at ANY sliding alignment is dropped and the text rebuilt
    * from the survivors. Docs that are near-verbatim copies collapse to
    * empty ('' — 23 of the fixture's 500), while docs sharing only a
    * quoted paragraph lose just that span.
    *
    * Scale shape: t29's tier-16 machinery with positions attached —
    * the shuffle carries (hash, doc_id, pos) triples, never gram text;
    * the dup test is the same O(1) min≠max aggregate; covered positions
    * explode 16× per dup gram BOUNDED by doc length (positions dedup
    * before the per-doc collect), and the rebuild is one per-row lambda
    * over the token array. The covered-position set per doc is at most
    * the doc's own token count — driver never sees it, `collect_set`
    * state is per-doc bounded. */
  private val t30 = QDef(
    "t30_dup_span_removal", {
      val gram = sqlH64("array_to_string(list_slice(tk, i, i + 15), ' ')")
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 16
         |    THEN list_transform(range(1, len(tk) - 14),
         |           i -> struct_pack(pos := i, h := $gram))
         |    ELSE [] END) AS u FROM tk),
         |gp AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM g),
         |dup AS (SELECT h FROM gp GROUP BY h HAVING min(doc_id) <> max(doc_id)),
         |cov AS (
         |  SELECT DISTINCT doc_id, unnest(range(pos, pos + 16)) AS p
         |  FROM gp JOIN dup USING (h)),
         |cv AS (SELECT doc_id, list(p) AS cov, count(*) AS n_removed FROM cov GROUP BY doc_id)
         |SELECT tk.doc_id,
         |  CAST(len(tk.tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(cv.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(array_to_string(list_filter(tk.tk,
         |    (x, i) -> cv.cov IS NULL OR NOT list_contains(cv.cov, i)), ' '), '') AS text_clean
         |FROM tk LEFT JOIN cv ON tk.doc_id = cv.doc_id
         |ORDER BY tk.doc_id""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    // 1-based positions to match the oracle's list indexing
    val gramsPos = bind(toksE, "tk")(tk =>
      s"""CASE WHEN size($tk) >= 16
         |  THEN transform(sequence(0, size($tk) - 16),
         |         i -> named_struct('pos', i + 1,
         |                'h', ${h64E(s"array_join(slice($tk, i + 1, 16), ' ')")}))
         |  ELSE CAST(array() AS ARRAY<STRUCT<pos: INT, h: BIGINT>>) END""".stripMargin)
    val gp = docs
      .select(col("doc_id"), explode(expr(gramsPos)).as("u"))
      .select(col("doc_id"), col("u.pos").as("pos"), col("u.h").as("h"))
      .persistTracked()
    val dup = gp.groupBy(col("h"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select(col("h"))
    val cv = gp.join(dup, Seq("h"))
      .select(col("doc_id"), explode(expr("sequence(pos, pos + 15)")).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(collect_set(col("p")).as("cov"), count(lit(1)).as("n_removed"))
    docs.select(col("doc_id"), expr(toksE).as("tk"))
      .join(cv, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        // Spark's filter lambda index is 0-based; cov holds 1-based
        expr("array_join(filter(tk, (x, i) -> cov IS NULL OR " +
          "NOT array_contains(cov, i + 1)), ' ')").as("text_clean"))
      .orderBy(col("doc_id"))
  }

  /** Per-(source, lang) corpus health report — the dashboard a data
    * lead reads per ingest batch: doc/token volume, mean doc size,
    * Gopher keep count (t07's exact rule), and exact-duplicate count
    * (corpus-global md5 digests, so a source that plagiarizes another
    * still shows its dups). One narrow digest aggregate + one doc-keyed
    * join + one (source, lang) aggregate; mean_chars is an exact
    * integer sum with ONE IEEE division, so the oracle matches
    * bit-exactly. */
  private val t31 = QDef(
    "t31_source_report",
    """WITH t AS (
      |  SELECT doc_id, source, lang, n_chars,
      |    len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens,
      |    length(replace(text, ' ', '')) AS n_nonspace,
      |    len(list_filter(regexp_split_to_array(text, '\s+'),
      |        x -> regexp_matches(x, '[#%$@]'))) AS n_symbol,
      |    len(list_filter(regexp_split_to_array(text, '\s+'),
      |        x -> regexp_matches(x, '\p{L}'))) AS n_alpha,
      |    len(list_filter(regexp_split_to_array(text, '\n'), l -> l LIKE '...%')) AS n_ellipsis,
      |    len(regexp_split_to_array(text, '\n')) AS n_lines,
      |    md5(text) AS dg
      |  FROM documents),
      |d AS (SELECT dg FROM t GROUP BY dg HAVING count(*) > 1),
      |k AS (SELECT t.*,
      |    ((n_tokens >= 30 AND n_tokens <= 50000)
      |      AND (n_tokens > 0 AND CAST(n_nonspace AS DOUBLE) / n_tokens >= 2.0
      |                        AND CAST(n_nonspace AS DOUBLE) / n_tokens <= 12.0)
      |      AND (n_tokens > 0 AND CAST(n_symbol AS DOUBLE) / n_tokens < 0.5)
      |      AND (n_lines = 0 OR CAST(n_ellipsis AS DOUBLE) / n_lines <= 0.3)
      |      AND (n_tokens > 0 AND CAST(n_alpha AS DOUBLE) / n_tokens >= 0.6)) AS keep,
      |    (t.dg IN (SELECT dg FROM d)) AS is_dup
      |  FROM t)
      |SELECT source, lang, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup
      |FROM k GROUP BY source, lang ORDER BY source, lang""".stripMargin) { (s, d) =>
    val toks = tokens(col("text"))
    val base = Tables.documents(s, d)
      .withColumn("n_tokens", size(toks))
      .withColumn("n_nonspace", length(regexp_replace(col("text"), " ", "")))
      .withColumn("n_symbol", size(filter(toks, t => t.rlike("[#%$@]"))))
      .withColumn("n_alpha", size(filter(toks, t => t.rlike("\\p{L}"))))
      .withColumn("n_ellipsis",
        size(filter(split(col("text"), "\n"), l => l.startsWith("..."))))
      .withColumn("n_lines", size(split(col("text"), "\n")))
      .withColumn("dg", md5(col("text")))
    val meanLen = col("n_nonspace").cast("double") / col("n_tokens")
    val keep = (col("n_tokens") >= 30 && col("n_tokens") <= 50000) &&
      (col("n_tokens") > 0 && meanLen >= 2.0 && meanLen <= 12.0) &&
      (col("n_tokens") > 0 &&
        col("n_symbol").cast("double") / col("n_tokens") < 0.5) &&
      (col("n_lines") === 0 ||
        col("n_ellipsis").cast("double") / col("n_lines") <= 0.3) &&
      (col("n_tokens") > 0 &&
        col("n_alpha").cast("double") / col("n_tokens") >= 0.6)
    val dups = base.groupBy(col("dg")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select(col("dg"), lit(true).as("is_dup"))
    base.join(dups, Seq("dg"), "left")
      .withColumn("keep", keep)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("tokens_total"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("is_dup").isNotNull, 1L).otherwise(0L)).as("n_exact_dup"))
      .orderBy(col("source"), col("lang"))
  }

  /** Snapshot diff between two dataset versions — the release audit a
    * versioned corpus publishes with every refresh: per (source,
    * status ∈ added/removed/changed/unchanged), doc counts and
    * token totals on each side. Versions are synthesized
    * deterministically from the fixture (v1 = doc_id < 450, v2 =
    * doc_id ≥ 50 with every 7th doc carrying a ' [rev2]' revision
    * suffix) so both engines diff the identical pair; in production
    * the two sides are two partition snapshots.
    *
    * Scale shape: ONE full-outer join on the doc key with md5 digests
    * compared in the join output — no text comparison rides the
    * shuffle beyond the digest, and the status classification is
    * per-row expression work. The CDC-diff pass that needs no mutable
    * store (q41 is the latest-wins companion over a changelog). */
  private val t32 = QDef(
    "t32_snapshot_diff",
    """WITH ntok AS (
      |  SELECT doc_id, source, text,
      |    len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS nt
      |  FROM documents),
      |v1 AS (SELECT doc_id, source, text, nt FROM ntok WHERE doc_id < 450),
      |v2 AS (SELECT doc_id, source,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text,
      |    CASE WHEN doc_id % 7 = 0 THEN nt + 1 ELSE nt END AS nt
      |  FROM ntok WHERE doc_id >= 50),
      |j AS (
      |  SELECT coalesce(v1.source, v2.source) AS source,
      |    CASE WHEN v1.doc_id IS NULL THEN 'added'
      |         WHEN v2.doc_id IS NULL THEN 'removed'
      |         WHEN md5(v1.text) <> md5(v2.text) THEN 'changed'
      |         ELSE 'unchanged' END AS status,
      |    coalesce(v1.nt, 0) AS t1, coalesce(v2.nt, 0) AS t2
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
      |SELECT source, status, count(*) AS n_docs,
      |  CAST(sum(t1) AS BIGINT) AS tokens_v1,
      |  CAST(sum(t2) AS BIGINT) AS tokens_v2
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val ntok = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        size(expr(toksE)).as("nt"))
    val v1 = ntok.where(col("doc_id") < 450)
      .select(col("doc_id").as("id1"), col("source").as("src1"),
        md5(col("text")).as("dg1"), col("nt").as("t1"))
    val v2 = ntok.where(col("doc_id") >= 50)
      .select(col("doc_id").as("id2"), col("source").as("src2"),
        md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text"))).as("dg2"),
        when(col("doc_id") % 7 === 0, col("nt") + 1).otherwise(col("nt"))
          .as("t2"))
    v1.join(v2, col("id1") === col("id2"), "full_outer")
      .select(coalesce(col("src1"), col("src2")).as("source"),
        when(col("id1").isNull, "added")
          .when(col("id2").isNull, "removed")
          .when(col("dg1") =!= col("dg2"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("t1"), lit(0)).as("t1"),
        coalesce(col("t2"), lit(0)).as("t2"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t1")).cast("long").as("tokens_v1"),
        sum(col("t2")).cast("long").as("tokens_v2"))
      .orderBy(col("source"), col("status"))
  }

  /** Marginal novelty per source — the "is this source worth buying/
    * crawling?" measure: processing sources in name order, how many of
    * a source's distinct 8-gram fingerprints were never seen in any
    * earlier source (its NOVEL contribution), plus the running distinct-
    * gram total of the corpus so far. A source full of re-crawls scores
    * near 0 and gets dropped before it costs storage; the DataComp/
    * RedPajama-style marginal-value curve over sources.
    *
    * Scale shape: the gram explode shuffles (hash, source) pairs only;
    * first-owner is a min(source) aggregate with O(1) mergeable state
    * (hot grams collapse map-side); per-source totals are one more hash
    * aggregate. The ONLY window is the cumulative sum over the final
    * per-SOURCE table — rows = number of sources, never corpus-sized
    * (same bounded-window posture as q44's hour series). */
  private val t33 = QDef(
    "t33_source_novelty", {
      val gram = (1 to 8).map(j => s"tk[i+${j - 1}]").mkString(" || ' ' || ")
      s"""WITH tk AS (
         |  SELECT doc_id, source, text,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 8
         |    THEN list_distinct(list_transform(range(1, len(tk) - 6), i -> ${sqlH64(gram)}))
         |    ELSE [${sqlH64("text")}] END) AS g
         |  FROM tk),
         |fg AS (SELECT g, min(source) AS first_src FROM sh GROUP BY g),
         |per AS (SELECT source, count(DISTINCT g) AS n_grams FROM sh GROUP BY source),
         |nov AS (SELECT first_src AS source, count(*) AS n_novel FROM fg GROUP BY 1)
         |SELECT per.source, CAST(per.n_grams AS BIGINT) AS n_grams,
         |  CAST(coalesce(nov.n_novel, 0) AS BIGINT) AS n_novel,
         |  CAST(coalesce(nov.n_novel, 0) AS DOUBLE) / per.n_grams AS novelty_ratio,
         |  CAST(sum(coalesce(nov.n_novel, 0)) OVER (ORDER BY per.source) AS BIGINT)
         |    AS cum_corpus_grams
         |FROM per LEFT JOIN nov ON per.source = nov.source
         |ORDER BY per.source""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // two-level aggregate (r14, the mm05 shape): collapse the gram
    // explode to distinct (g, source) ONCE — first-owner is a min over
    // those groups (identical: min over distinct sources ≡ min over
    // occurrences) and the per-source distinct-gram count is a plain
    // group count. Drops the corpus-sized persisted explode (a
    // corpus×8 cache at 100 TB), the COUNT(DISTINCT) expand, and one
    // full-gram re-aggregate.
    val g2 = Tables.documents(s, d)
      .select(col("source"), explode(expr(gram8E)).as("g"))
      .groupBy(col("g"), col("source")).agg(count(lit(1)).as("_n"))
    val fg = g2.groupBy(col("g")).agg(min(col("source")).as("first_src"))
    val per = g2.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
    val nov = fg.groupBy(col("first_src").as("source"))
      .agg(count(lit(1)).as("n_novel"))
    per.join(nov, Seq("source"), "left")
      .select(col("source"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_ratio",
        col("n_novel").cast("double") / col("n_grams"))
      .withColumn("cum_corpus_grams",
        sum(col("n_novel")).over(Window.orderBy(col("source"))))
      .orderBy(col("source"))
  }

  /** Duplicate-gram mass per source — the standard corpus-repetition
    * metric (what fraction of a source's 8-gram occurrences are grams
    * that also appear in ANOTHER document, anywhere in the corpus):
    * the "how much of this source is boilerplate/recycled text" gauge
    * that complements t33's first-owner novelty (novelty asks "who
    * contributed it first"; dup mass asks "how much of what I'd train
    * on is duplicated at all"). Per-doc grams are DISTINCT
    * ([[gram8E]]), so occurrences are (doc, gram) pairs and a gram
    * duplicated N times within one doc counts once — the cross-doc
    * duplication signal, not t10's within-doc repetition.
    *
    * Scale shape: one gram-keyed count aggregate + one gram-keyed
    * join — the shuffle carries (hash, doc_id/source) only, never
    * text, and nothing is ever pairwise in documents. The reference
    * has no corpus analytics; this extends its text surface
    * (`src/core/src/expr/`) the way a training-data pipeline needs.
    */
  private val t34 = QDef(
    "t34_dup_gram_mass", {
      val gram = (1 to 8).map(j => s"tk[i+${j - 1}]").mkString(" || ' ' || ")
      s"""WITH tk AS (
         |  SELECT doc_id, source, text,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 8
         |    THEN list_distinct(list_transform(range(1, len(tk) - 6), i -> ${sqlH64(gram)}))
         |    ELSE [${sqlH64("text")}] END) AS g
         |  FROM tk),
         |gc AS (SELECT g, count(*) AS nd FROM sh GROUP BY g)
         |SELECT sh.source, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
         |  CAST(sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_mass
         |FROM sh JOIN gc USING (g)
         |GROUP BY sh.source ORDER BY sh.source""".stripMargin
    }) { (s, d) =>
    // two-level aggregate (r14, the mm05 shape): collapse the gram
    // explode to (g, source) occurrence counts ONCE; the per-gram doc
    // count is the SUM of those group counts as a window over the
    // collapsed frame (per-doc grams are distinct, so occurrences ≡
    // docs), and the per-source totals are conditional sums of group
    // sizes. Drops the corpus-sized persisted explode (a corpus×8
    // cache at 100 TB) and the full-gram join back.
    val g2 = Tables.documents(s, d)
      .select(col("source"), explode(expr(gram8E)).as("g"))
      .groupBy(col("g"), col("source")).agg(count(lit(1)).as("n_gs"))
    val wG = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    g2.withColumn("nd", sum(col("n_gs")).over(wG))
      .groupBy(col("source"))
      .agg(sum(col("n_gs")).as("n_grams"),
        sum(when(col("nd") >= 2, col("n_gs")).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_mass",
        col("n_dup_grams").cast("double") / col("n_grams"))
      .orderBy(col("source"))
  }

  /** Token-budget report per source — the capacity-planning card for
    * sequence packing (t17) and mixture weighting (t18): per source,
    * document and token totals plus the exact interpolated
    * P50/P90/P99 of per-document token counts (Spark `percentile` ≡
    * DuckDB `quantile_cont`, the q45-proven bit-exact pair). The P99
    * tells you the context length that avoids truncating the tail;
    * the total tells you the epoch budget.
    *
    * Scale shape: per-row token counting (codegen'd split/filter) +
    * one source-keyed aggregate; exact-percentile state per key is
    * bounded by per-source document counts, and sources are the
    * partition axis a 100 TB corpus is already bucketed by. */
  private val t35 = QDef(
    "t35_token_budget",
    """WITH t AS (SELECT source,
      |    len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  quantile_cont(n_tokens, 0.5) AS p50_tokens,
      |  quantile_cont(n_tokens, 0.9) AS p90_tokens,
      |  quantile_cont(n_tokens, 0.99) AS p99_tokens
      |FROM t GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), size(tokens(col("text"))).as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        percentile(col("n_tokens"), lit(0.5)).as("p50_tokens"),
        percentile(col("n_tokens"), lit(0.9)).as("p90_tokens"),
        percentile(col("n_tokens"), lit(0.99)).as("p99_tokens"))
      .orderBy(col("source"))
  }

  /** Language mix per source — the corpus-card panel d04's predicted
    * langid feeds and t18's mixture weights consume: per (source,
    * lang) document counts, each language's share of its source, and
    * the dominant-language flag (ties broken lexicographically so
    * both engines agree). The report a multilingual pipeline reads
    * before assigning per-language processing budgets.
    *
    * Scale shape: one (source, lang) count aggregate — map-side
    * combined, output bounded by sources×languages — plus
    * source-partitioned windows over those tiny grouped rows; the
    * corpus is scanned once and only grouped counts shuffle. */
  private val t36 = QDef(
    "t36_language_mix",
    """WITH c AS (SELECT source, lang, count(*) AS n_docs FROM documents GROUP BY 1, 2),
      |t AS (SELECT *, CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY source) AS share,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_docs DESC, lang) AS rk
      |      FROM c)
      |SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs, share, (rk = 1) AS is_dominant
      |FROM t ORDER BY source, lang""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wS = Window.partitionBy(col("source"))
    val wR = Window.partitionBy(col("source"))
      .orderBy(col("n_docs").desc, col("lang"))
    Tables.documents(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        col("n_docs").cast("double") / sum(col("n_docs")).over(wS))
      .withColumn("is_dominant", row_number().over(wR) === 1)
      .select(col("source"), col("lang"), col("n_docs"), col("share"),
        col("is_dominant"))
      .orderBy(col("source"), col("lang"))
  }

  /** BM25 lexical retrieval (Robertson-Spärck Jones): top-10 documents
    * for each of the corpus' 5 highest-df non-stopword terms. The
    * score keeps BM25's tf saturation and length normalization but
    * uses the PRE-LOG idf ratio (N - df + 0.5)/(df + 0.5) — ln() is
    * monotone, so per-term rankings are identical to classic BM25
    * while every arithmetic step stays an IEEE-determined ratio both
    * engines compute bit-equally (the t26 rule: ratios, not logs).
    *
    * Scale shape: the inverted-index pattern — one (doc, term) tf
    * aggregate, a vocab-key df rollup, the 5-term query set broadcast
    * back against the postings. The corpus shuffles on term keys once;
    * nothing is ever doc×doc. At 100 TB this is the standard
    * build-the-index pass with the query side a constant. */
  private val t37 = {
    val k1 = "2.2" // (k1 + 1) with k1 = 1.2, written as one literal
    QDef(
      "t37_bm25_topk",
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
         |      FROM dl),
         |q AS (SELECT term, df FROM (
         |        SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS r
         |        FROM df WHERE term NOT IN $sqlStops) WHERE r <= 5),
         |sc AS (
         |  SELECT q.term, tf.doc_id, tf.tf, dl.dl,
         |    ((CAST(n.n_docs AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5) / (CAST(q.df AS DOUBLE) + 0.5)) *
         |      ((CAST(tf.tf AS DOUBLE) * $k1) /
         |       (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / n.avgdl)))) AS score
         |  FROM q JOIN tf USING (term) JOIN dl USING (doc_id) CROSS JOIN n),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rnk FROM sc)
         |SELECT term, CAST(rnk AS INTEGER) AS rnk, doc_id, tf, dl, score
         |FROM r WHERE rnk <= 10 ORDER BY term, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val stopArr = array(stopwords.map(lit): _*)
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = dl.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val qTerms = df.filter(!array_contains(stopArr, col("term")))
        .withColumn("r", row_number().over(
          Window.orderBy(col("df").desc, col("term"))))
        .filter(col("r") <= 5)
        .select(col("term"), col("df"))
      val wT = Window.partitionBy(col("term"))
        .orderBy(col("score").desc, col("doc_id"))
      tf.join(broadcast(qTerms), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(n))
        .withColumn("score",
          ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
            ((col("tf").cast("double") * lit(2.2)) /
              (col("tf").cast("double") +
                lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))))
        .withColumn("rnk", row_number().over(wT))
        .filter(col("rnk") <= 10)
        .select(col("term"), col("rnk").cast("int").as("rnk"), col("doc_id"),
          col("tf"), col("dl"), col("score"))
        .orderBy(col("term"), col("rnk"))
    }
  }

  /** Deterministic stratified sampling for eval-set construction:
    * strata are (lang × within-lang length quartile), each stratum
    * contributes ~10% of its rows, and membership is decided by
    * md5-order rank inside the stratum — reproducible across runs,
    * engines, and partitionings, and unbiased w.r.t. document order
    * (the md5 key is the t08/t11 trick).
    *
    * Scale shape: NTILE needs a per-lang sort — languages partition
    * the corpus, so each window partition is one language, not the
    * whole corpus (the t19 rule: never a single global window). At
    * 100 TB, quartile edges would come from approx percentiles
    * instead; the per-stratum md5 rank is a bounded top-k. */
  private val t38 = QDef(
    "t38_stratified_sample",
    """WITH q AS (
      |  SELECT doc_id, lang, n_chars,
      |    NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS len_q
      |  FROM documents),
      |k AS (SELECT lang, len_q, CAST(CEIL(COUNT(*) / 10.0) AS BIGINT) AS k
      |      FROM q GROUP BY lang, len_q),
      |r AS (
      |  SELECT q.*, ROW_NUMBER() OVER (PARTITION BY q.lang, q.len_q
      |           ORDER BY md5(CAST(q.doc_id AS VARCHAR)), q.doc_id) AS pick
      |  FROM q)
      |SELECT r.lang, CAST(r.len_q AS INTEGER) AS len_q, r.doc_id, r.n_chars
      |FROM r JOIN k ON r.lang = k.lang AND r.len_q = k.len_q
      |WHERE r.pick <= k.k
      |ORDER BY r.lang, len_q, r.doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wQ = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val wP = Window.partitionBy(col("lang"), col("len_q"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val q = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("len_q", ntile(4).over(wQ))
    val k = q.groupBy(col("lang"), col("len_q"))
      .agg(ceil(count(lit(1)) / lit(10.0)).as("k"))
    q.withColumn("pick", row_number().over(wP))
      .join(broadcast(k), Seq("lang", "len_q"))
      .filter(col("pick") <= col("k"))
      .select(col("lang"), col("len_q").cast("int").as("len_q"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("len_q"), col("doc_id"))
  }

  /** Vocabulary-growth (Heaps' law) curve: cumulative distinct vocabulary
    * vs cumulative tokens at 10 corpus checkpoints, plus the per-bucket
    * new-term count and type-token ratio. The corpus-card panel that
    * tells you whether more data still buys new vocabulary — a flattening
    * curve means the source is exhausted.
    *
    * Scale shape: a term's first occurrence is `min(doc_id)` — one
    * term-key aggregate (map-side combined); per-doc token counts are a
    * doc-key aggregate. Both collapse to 10 bucket rows before the
    * cumulative window, so the only unpartitioned window runs over 10
    * rows (the t19 rule: grouped rows only, never the corpus). */
  private val t39 = QDef(
    "t39_vocab_growth",
    """WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
      |  FROM documents),
      |n AS (SELECT MAX(doc_id) + 1 AS n_docs FROM documents),
      |ft AS (SELECT term, MIN(doc_id) AS first_doc FROM tk GROUP BY term),
      |dt AS (SELECT doc_id, COUNT(*) AS n_tok FROM tk GROUP BY doc_id),
      |vb AS (SELECT CAST(first_doc * 10 // n.n_docs AS INTEGER) AS bucket,
      |              COUNT(*) AS new_terms
      |       FROM ft CROSS JOIN n GROUP BY 1),
      |tb AS (SELECT CAST(doc_id * 10 // n.n_docs AS INTEGER) AS bucket,
      |              CAST(SUM(n_tok) AS BIGINT) AS bucket_tokens
      |       FROM dt CROSS JOIN n GROUP BY 1),
      |cm AS (
      |  SELECT tb.bucket, COALESCE(vb.new_terms, 0) AS new_terms,
      |    CAST(SUM(COALESCE(vb.new_terms, 0)) OVER (ORDER BY tb.bucket) AS BIGINT) AS cum_vocab,
      |    CAST(SUM(tb.bucket_tokens) OVER (ORDER BY tb.bucket) AS BIGINT) AS cum_tokens
      |  FROM tb LEFT JOIN vb ON tb.bucket = vb.bucket)
      |SELECT bucket, new_terms, cum_vocab, cum_tokens,
      |  CAST(cum_vocab AS DOUBLE) / CAST(cum_tokens AS DOUBLE) AS ttr
      |FROM cm ORDER BY bucket""".stripMargin) { (s, d) =>
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val n = Tables.documents(s, d).agg((max(col("doc_id")) + 1).as("n_docs"))
    val ft = tk.groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
    val dt = tk.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val vb = ft.crossJoin(broadcast(n))
      .groupBy(expr("(first_doc * 10) div n_docs").cast("int").as("bucket"))
      .agg(count(lit(1)).as("new_terms"))
    val tb = dt.crossJoin(broadcast(n))
      .groupBy(expr("(doc_id * 10) div n_docs").cast("int").as("bucket"))
      .agg(sum(col("n_tok")).as("bucket_tokens"))
    val W = org.apache.spark.sql.expressions.Window
    val wC = W.orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    tb.join(vb, Seq("bucket"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("cum_vocab", sum(col("new_terms")).over(wC))
      .withColumn("cum_tokens", sum(col("bucket_tokens")).over(wC))
      .select(col("bucket"), col("new_terms"), col("cum_vocab"), col("cum_tokens"),
        (col("cum_vocab").cast("double") / col("cum_tokens").cast("double")).as("ttr"))
      .orderBy(col("bucket"))
  }

  /** Flesch reading-ease scoring: per document, whitespace words,
    * `[.!?]+` sentence runs, `[aeiouy]+` vowel-group syllable proxy, the
    * Flesch score 206.835 − 1.015·(W/S) − 84.6·(Syl/W), and a five-band
    * difficulty label. The classic readability gate a curriculum or
    * audience filter runs per document. Every arithmetic step is a
    * fixed-order IEEE expression over integer counts, so both engines
    * produce bit-identical doubles (the t26 rule).
    *
    * Scale shape: pure per-row expression work — regexp counts fused in
    * whole-stage codegen, no shuffle at all beyond the final order. */
  private val t40 = QDef(
    "t40_readability",
    """WITH c AS (
      |  SELECT doc_id,
      |    GREATEST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')), 1) AS n_words,
      |    GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, n_words, n_sents, n_syll,
      |    206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
      |            - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch
      |  FROM c)
      |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      |  CAST(n_sents AS BIGINT) AS n_sents, CAST(n_syll AS BIGINT) AS n_syll,
      |  flesch,
      |  CASE WHEN flesch >= 90 THEN 'very_easy' WHEN flesch >= 70 THEN 'easy'
      |       WHEN flesch >= 50 THEN 'medium' WHEN flesch >= 30 THEN 'hard'
      |       ELSE 'very_hard' END AS band
      |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
    val c = Tables.documents(s, d).select(
      col("doc_id"),
      greatest(size(tokens(col("text"))), lit(1)).cast("long").as("n_words"),
      greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1))
        .cast("long").as("n_sents"),
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
        .cast("long").as("n_syll"))
    c.withColumn("flesch",
        lit(206.835) - lit(1.015) * (col("n_words").cast("double") / col("n_sents").cast("double")) -
          lit(84.6) * (col("n_syll").cast("double") / col("n_words").cast("double")))
      .withColumn("band",
        when(col("flesch") >= 90, "very_easy").when(col("flesch") >= 70, "easy")
          .when(col("flesch") >= 50, "medium").when(col("flesch") >= 30, "hard")
          .otherwise("very_hard"))
      .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
        col("flesch"), col("band"))
      .orderBy(col("doc_id"))
  }

  /** Term burstiness (Church & Gale): the 20 vocabulary terms whose
    * per-document frequency is most over-dispersed, measured by the
    * variance-to-mean ratio over ALL documents (zeros included) —
    * bursty terms cluster in few documents (topical), Poisson-like
    * terms spread evenly (function words). The corpus statistic behind
    * stopword-list induction and keyword weighting. VMR is computed
    * from three integer sums (N, Σtf, Σtf²) in one fixed IEEE order,
    * so both engines produce bit-identical doubles.
    *
    * Scale shape: one (doc, term) tf aggregate, one term-key rollup of
    * (df, Σtf, Σtf²) — both map-side combined; the top-20 rank runs
    * over the df-filtered vocabulary only. */
  private val t41 = QDef(
    "t41_term_burstiness",
    """WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY doc_id, term),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
      |st AS (SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS s1,
      |              CAST(SUM(tf * tf) AS BIGINT) AS s2
      |       FROM tf GROUP BY term),
      |v AS (
      |  SELECT term, df, s1,
      |    ((CAST(s2 AS DOUBLE) / n.n_docs) -
      |     (CAST(s1 AS DOUBLE) / n.n_docs) * (CAST(s1 AS DOUBLE) / n.n_docs)) /
      |      (CAST(s1 AS DOUBLE) / n.n_docs) AS vmr
      |  FROM st CROSS JOIN n WHERE df >= 50),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY vmr DESC, term) AS rnk FROM v)
      |SELECT CAST(rnk AS INTEGER) AS rnk, term, df, s1 AS total_tf, vmr
      |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin) { (s, d) =>
    val W = org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val n = Tables.documents(s, d)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val st = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("s1"),
        sum(col("tf") * col("tf")).as("s2"))
      .filter(col("df") >= 50)
    val mean = col("s1").cast("double") / col("n_docs")
    st.crossJoin(broadcast(n))
      .withColumn("vmr",
        ((col("s2").cast("double") / col("n_docs")) - mean * mean) / mean)
      .withColumn("rnk", row_number().over(W.orderBy(col("vmr").desc, col("term"))))
      .filter(col("rnk") <= 20)
      .select(col("rnk").cast("int").as("rnk"), col("term"), col("df"),
        col("s1").as("total_tf"), col("vmr"))
      .orderBy(col("rnk"))
  }

  /** Collocation mining by doc-level lift: for every pair of the 20
    * highest-df non-stopword terms, the observed-over-expected
    * co-occurrence ratio lift = N·df_ab / (df_a·df_b) — PMI's argument
    * without the log (ln is monotone; ratios stay bit-equal across
    * engines, the t37 rule). The collocation table a phrase-mining or
    * tokenizer-merge pipeline reads.
    *
    * Scale shape: per-doc distinct term sets are filtered against the
    * broadcast 20-term list BEFORE any pairing, so the pair explode is
    * bounded by C(20,2) per document; pair counts are one map-side
    * combined aggregate. The corpus is never doc×doc and the vocab
    * rank runs over grouped counts only. */
  private val t42 = QDef(
    "t42_collocation_lift",
    s"""WITH tk AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS term
       |  FROM documents),
       |df AS (SELECT term, COUNT(*) AS df FROM tk GROUP BY term),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |top AS (SELECT term, df FROM (
       |          SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS r
       |          FROM df WHERE term NOT IN $sqlStops) WHERE r <= 20),
       |ft AS (SELECT tk.doc_id, tk.term FROM tk JOIN top USING (term)),
       |pr AS (SELECT a.term AS a, b.term AS b, COUNT(*) AS df_ab
       |       FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.term < b.term
       |       GROUP BY a.term, b.term)
       |SELECT pr.a, pr.b, ta.df AS df_a, tb.df AS df_b, pr.df_ab,
       |  CAST(n.n_docs * pr.df_ab AS DOUBLE) / CAST(ta.df * tb.df AS DOUBLE) AS lift
       |FROM pr JOIN top ta ON pr.a = ta.term JOIN top tb ON pr.b = tb.term
       |CROSS JOIN n ORDER BY pr.a, pr.b""".stripMargin) { (s, d) =>
    val W = org.apache.spark.sql.expressions.Window
    val stopArr = array(stopwords.map(lit): _*)
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
    val df = tk.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val top = df.filter(!array_contains(stopArr, col("term")))
      .withColumn("r", row_number().over(W.orderBy(col("df").desc, col("term"))))
      .filter(col("r") <= 20)
      .select(col("term"), col("df"))
    val ft = tk.join(broadcast(top.select(col("term"))), Seq("term"))
    val pr = ft.select(col("doc_id"), col("term").as("a"))
      .join(ft.select(col("doc_id"), col("term").as("b")), Seq("doc_id"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("df_ab"))
    pr.join(broadcast(top.select(col("term").as("a"), col("df").as("df_a"))), Seq("a"))
      .join(broadcast(top.select(col("term").as("b"), col("df").as("df_b"))), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("df_a"), col("df_b"), col("df_ab"),
        ((col("n_docs") * col("df_ab")).cast("double") /
          (col("df_a") * col("df_b")).cast("double")).as("lift"))
      .orderBy(col("a"), col("b"))
  }

  /** Source-affinity matrix — cosine similarity between per-source term
    * profiles over the corpus' top-50 non-stopword vocabulary (the
    * "which crawls look alike" triage behind source-level dedup order
    * d17 and mixing weights t18: near-identical profiles suggest one
    * crawl mirrors another). Profiles are integer term-frequency
    * vectors; dot products and squared norms stay BIGINT, and the only
    * float work is cos = dot / (sqrt(na)·sqrt(nb)) — two exact integer→
    * double conversions, two IEEE sqrts, one multiply, one divide, in a
    * pinned order (norms multiplied separately so na·nb can never
    * overflow BIGINT at corpus scale).
    *
    * Scale shape: one (source, term) map-side-combined tf aggregate,
    * vocab rank over grouped term counts only, then all pair work runs
    * on the sources×50 profile table — bounded by the source count,
    * never by corpus volume. Source pairs sharing no vocab term still
    * appear (cos 0) via the norms-table pair frame. */
  private val t43 = QDef(
    "t43_source_affinity",
    s"""WITH tf0 AS (
       |  SELECT source,
       |    unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS term
       |  FROM documents),
       |ctf AS (SELECT term, COUNT(*) AS ctf FROM tf0
       |        WHERE term NOT IN $sqlStops GROUP BY term),
       |top AS (SELECT term FROM (
       |          SELECT term, ROW_NUMBER() OVER (ORDER BY ctf DESC, term) AS r
       |          FROM ctf) WHERE r <= 50),
       |prof AS (SELECT source, term, COUNT(*) AS tf FROM tf0
       |         JOIN top USING (term) GROUP BY source, term),
       |nrm AS (SELECT source, SUM(tf * tf) AS n2 FROM prof GROUP BY source),
       |dots AS (SELECT a.source AS src_a, b.source AS src_b,
       |           SUM(a.tf * b.tf) AS dot
       |         FROM prof a JOIN prof b
       |           ON a.term = b.term AND a.source < b.source
       |         GROUP BY a.source, b.source)
       |SELECT na.source AS src_a, nb.source AS src_b,
       |  CAST(COALESCE(d.dot, 0) AS BIGINT) AS dot,
       |  CAST(COALESCE(d.dot, 0) AS DOUBLE) /
       |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
       |FROM nrm na JOIN nrm nb ON na.source < nb.source
       |LEFT JOIN dots d ON d.src_a = na.source AND d.src_b = nb.source
       |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val W = org.apache.spark.sql.expressions.Window
    val stopArr = array(stopwords.map(lit): _*)
    val tf0 = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
    val top = tf0.filter(!array_contains(stopArr, col("term")))
      .groupBy(col("term")).agg(count(lit(1)).as("ctf"))
      .withColumn("r", row_number().over(W.orderBy(col("ctf").desc, col("term"))))
      .filter(col("r") <= 50)
      .select(col("term"))
    val prof = tf0.join(broadcast(top), Seq("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nrm = prof.groupBy(col("source"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val dots = prof.select(col("term"), col("source").as("src_a"), col("tf").as("tf_a"))
      .join(prof.select(col("term"), col("source").as("src_b"), col("tf").as("tf_b")),
        Seq("term"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
    broadcast(nrm.select(col("source").as("src_a"), col("n2").as("na")))
      .join(nrm.select(col("source").as("src_b"), col("n2").as("nb")),
        col("src_a") < col("src_b"))
      .join(dots, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("dot"), lit(0L)).as("dot"),
        (coalesce(col("dot"), lit(0L)).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos_sim"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Character-class / encoding audit — the charset-sanity filter run
    * right after ingest (mojibake, binary-in-text, shouty boilerplate
    * and number dumps all show up here before any tokenizer sees them):
    * per document, counts of uppercase / digit / space / non-ASCII
    * characters (each a regexp strip-and-measure — per-row codegen'd
    * expression work), their ratios over the char length, and a keep
    * flag (mostly-ASCII and not digit- or caps-dominated). One IEEE
    * division per ratio; NULLIF guards the empty document.
    *
    * Scale shape: zero shuffles beyond the output sort — the t40
    * "pure per-row expression work" family. */
  private val t44 = QDef(
    "t44_charset_audit",
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
      |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
      |  CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_space,
      |  CAST(length(regexp_replace(text, '[\x01-\x7f]', '', 'g')) AS BIGINT) AS n_nonascii,
      |  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) /
      |    NULLIF(length(text), 0) AS upper_ratio,
      |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) /
      |    NULLIF(length(text), 0) AS digit_ratio,
      |  CAST(length(regexp_replace(text, '[\x01-\x7f]', '', 'g')) AS DOUBLE) /
      |    NULLIF(length(text), 0) AS nonascii_ratio,
      |  (CAST(length(regexp_replace(text, '[\x01-\x7f]', '', 'g')) AS DOUBLE) /
      |     NULLIF(length(text), 0) <= 0.1
      |   AND CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) /
      |     NULLIF(length(text), 0) <= 0.3
      |   AND CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) /
      |     NULLIF(length(text), 0) <= 0.3) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    def cnt(pattern: String) =
      length(regexp_replace(col("text"), pattern, "")).cast("long")
    val nChars = nullif(length(col("text")), lit(0))
    def ratio(c: org.apache.spark.sql.Column) = c.cast("double") / nChars
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      cnt("[^A-Z]").as("n_upper"),
      cnt("[^0-9]").as("n_digit"),
      cnt("[^ ]").as("n_space"),
      cnt("[\\x01-\\x7f]").as("n_nonascii"),
      ratio(cnt("[^A-Z]")).as("upper_ratio"),
      ratio(cnt("[^0-9]")).as("digit_ratio"),
      ratio(cnt("[\\x01-\\x7f]")).as("nonascii_ratio"),
      (ratio(cnt("[\\x01-\\x7f]")) <= 0.1 &&
        ratio(cnt("[^0-9]")) <= 0.3 &&
        ratio(cnt("[^A-Z]")) <= 0.3).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Ingest-batch quality drift — the "is this dump worse than the
    * last one" monitor: documents bucketed into fixed-width ingest
    * batches (doc_id div 100 — arrival order in the fixture), and per
    * batch: volume, Gopher keep rate (t07's rule), the exact-dup rate
    * AGAINST EARLIER BATCHES ONLY (first-owner min-batch per md5
    * digest — re-crawled content shows up here, not in-batch dups),
    * and the new-vocabulary share (terms whose first-owner batch is
    * this one — t33's novelty per batch: a collapsing share means the
    * source stopped buying vocabulary). Integer counts, one IEEE
    * division per ratio.
    *
    * Scale shape: per-row rule work, then digest-key and term-key
    * first-owner aggregates (map-side combined, O(1) state) joined
    * back on those same keys; windows nowhere. */
  private val t45 = QDef(
    "t45_batch_drift",
    s"""WITH base AS (
       |  SELECT doc_id, doc_id // 100 AS batch_id, md5(text) AS dg,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tok,
       |    length(replace(text, ' ', '')) AS n_nonspace,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'),
       |        x -> regexp_matches(x, '[#%$$@]'))) AS n_symbol,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'),
       |        x -> regexp_matches(x, '\\p{L}'))) AS n_alpha,
       |    len(list_filter(regexp_split_to_array(text, '\n'), l -> l LIKE '...%')) AS n_ellipsis,
       |    len(regexp_split_to_array(text, '\n')) AS n_lines
       |  FROM documents),
       |k AS (
       |  SELECT batch_id, dg, n_tok,
       |    ((n_tok >= 30 AND n_tok <= 50000)
       |      AND (n_tok > 0 AND CAST(n_nonspace AS DOUBLE) / n_tok >= 2.0
       |                     AND CAST(n_nonspace AS DOUBLE) / n_tok <= 12.0)
       |      AND (n_tok > 0 AND CAST(n_symbol AS DOUBLE) / n_tok < 0.5)
       |      AND (n_lines = 0 OR CAST(n_ellipsis AS DOUBLE) / n_lines <= 0.3)
       |      AND (n_tok > 0 AND CAST(n_alpha AS DOUBLE) / n_tok >= 0.6)) AS keep
       |  FROM base),
       |fd AS (SELECT dg, MIN(batch_id) AS first_b FROM base GROUP BY dg),
       |tkx AS (
       |  SELECT DISTINCT doc_id // 100 AS batch_id,
       |    unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS term
       |  FROM documents),
       |ft AS (SELECT term, MIN(batch_id) AS first_t FROM tkx GROUP BY term),
       |bt AS (
       |  SELECT tkx.batch_id, COUNT(*) AS n_terms,
       |    SUM(CASE WHEN ft.first_t = tkx.batch_id THEN 1 ELSE 0 END) AS n_new
       |  FROM tkx JOIN ft USING (term) GROUP BY tkx.batch_id),
       |bd AS (
       |  SELECT k.batch_id, COUNT(*) AS n_docs,
       |    CAST(SUM(k.n_tok) AS BIGINT) AS n_tokens,
       |    SUM(CASE WHEN k.keep THEN 1 ELSE 0 END) AS n_keep,
       |    SUM(CASE WHEN fd.first_b < k.batch_id THEN 1 ELSE 0 END) AS n_dup
       |  FROM k JOIN fd ON fd.dg = k.dg GROUP BY k.batch_id)
       |SELECT bd.batch_id, bd.n_docs, bd.n_tokens,
       |  CAST(bd.n_keep AS DOUBLE) / bd.n_docs AS keep_rate,
       |  CAST(bd.n_dup AS DOUBLE) / bd.n_docs AS dup_rate,
       |  CAST(bt.n_terms AS BIGINT) AS n_terms,
       |  CAST(bt.n_new AS BIGINT) AS n_new_terms,
       |  CAST(bt.n_new AS DOUBLE) / bt.n_terms AS new_term_share
       |FROM bd JOIN bt USING (batch_id) ORDER BY batch_id""".stripMargin) { (s, d) =>
    val toks = tokens(col("text"))
    val base = Tables.documents(s, d)
      .withColumn("batch_id", expr("doc_id div 100"))
      .withColumn("dg", md5(col("text")))
      .withColumn("n_tok", size(toks))
      .withColumn("n_nonspace", length(regexp_replace(col("text"), " ", "")))
      .withColumn("n_symbol", size(filter(toks, t => t.rlike("[#%$@]"))))
      .withColumn("n_alpha", size(filter(toks, t => t.rlike("\\p{L}"))))
      .withColumn("n_ellipsis",
        size(filter(split(col("text"), "\n"), l => l.startsWith("..."))))
      .withColumn("n_lines", size(split(col("text"), "\n")))
    val meanLen = col("n_nonspace").cast("double") / col("n_tok")
    val k = base.select(col("batch_id"), col("dg"), col("n_tok"),
      ((col("n_tok") >= 30 && col("n_tok") <= 50000) &&
        (col("n_tok") > 0 && meanLen >= 2.0 && meanLen <= 12.0) &&
        (col("n_tok") > 0 &&
          col("n_symbol").cast("double") / col("n_tok") < 0.5) &&
        (col("n_lines") === 0 ||
          col("n_ellipsis").cast("double") / col("n_lines") <= 0.3) &&
        (col("n_tok") > 0 &&
          col("n_alpha").cast("double") / col("n_tok") >= 0.6)).as("keep"))
    val fd = base.groupBy(col("dg")).agg(min(col("batch_id")).as("first_b"))
    val tkx = Tables.documents(s, d)
      .select(expr("doc_id div 100").as("batch_id"),
        explode(tokens(col("text"))).as("term"))
      .distinct()
    val ft = tkx.groupBy(col("term")).agg(min(col("batch_id")).as("first_t"))
    val bt = tkx.join(ft, Seq("term"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("first_t") === col("batch_id"), 1L).otherwise(0L))
          .as("n_new"))
    val bd = k.join(fd, Seq("dg"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("first_b") < col("batch_id"), 1L).otherwise(0L))
          .as("n_dup"))
    bd.join(bt, Seq("batch_id"))
      .select(col("batch_id"), col("n_docs"), col("n_tokens"),
        (col("n_keep").cast("double") / col("n_docs")).as("keep_rate"),
        (col("n_dup").cast("double") / col("n_docs")).as("dup_rate"),
        col("n_terms"), col("n_new").as("n_new_terms"),
        (col("n_new").cast("double") / col("n_terms")).as("new_term_share"))
      .orderBy(col("batch_id"))
  }

  /** Zipf octave-ratio card — the rank-frequency power-law check
    * (f(r) ∝ r^-α ⇒ f(r)/f(2r) ≈ 2^α) WITHOUT the cross-engine ln()
    * hazard: at each rank octave r ∈ {1,2,4,8,16,32}, report f(r),
    * f(2r), and their ratio — a flat ratio ≈ 2 across octaves is the
    * Zipf signature natural corpora show; synthetic or template-heavy
    * corpora bend it, which is the drift this card watches for
    * alongside t39's Heaps curve. Integer frequencies, one IEEE
    * division per octave (the t37 pre-log rule: a monotone transform
    * of a report statistic is presentation, not information).
    *
    * Scale shape: one map-side-combined term count; the rank pass is a
    * row_number over GROUPED vocabulary counts (the t41 exemption) cut
    * to 64 rows before the 6-row self-join on the doubled rank. */
  private val t46 = QDef(
    "t46_zipf_octaves",
    """WITH tf AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
      |  FROM documents),
      |c AS (SELECT term, COUNT(*) AS f FROM tf GROUP BY term),
      |r AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS rnk FROM c)
      |SELECT CAST(a.rnk AS BIGINT) AS rank, a.f AS freq,
      |  b.f AS freq_2x,
      |  CAST(a.f AS DOUBLE) / b.f AS octave_ratio
      |FROM r a JOIN r b ON b.rnk = 2 * a.rnk
      |WHERE a.rnk IN (1, 2, 4, 8, 16, 32)
      |ORDER BY rank""".stripMargin) { (s, d) =>
    val W = org.apache.spark.sql.expressions.Window
    val c = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
    val r = c.withColumn("rnk",
        row_number().over(W.orderBy(col("f").desc, col("term"))))
      .filter(col("rnk") <= 64)
      .select(col("rnk").cast("long").as("rnk"), col("f"))
    r.filter(col("rnk").isin(1L, 2L, 4L, 8L, 16L, 32L))
      .join(r.select(col("rnk").as("rnk2"), col("f").as("freq_2x")),
        col("rnk2") === lit(2L) * col("rnk"))
      .select(col("rnk").as("rank"), col("f").as("freq"), col("freq_2x"),
        (col("f").cast("double") / col("freq_2x")).as("octave_ratio"))
      .orderBy(col("rank"))
  }

  /** Code-vs-prose signal — the corpus gate that routes documents to a
    * code pipeline (different tokenizer, different dedup granularity)
    * instead of the prose one: per doc, the code-symbol character
    * ratio ({}();=<>[] stripped-and-measured, the t44 pattern), digit
    * ratio, query-keyword token density, and the routing flag. Integer
    * counts with single final divisions; per-row expression work, no
    * joins. */
  private val t47 = QDef(
    "t47_code_signal",
    s"""WITH t AS (
       |  SELECT doc_id,
       |    length(text) AS n_chars,
       |    length(text) - length(regexp_replace(text, '[{}();=<>\\[\\]]', '', 'g')) AS n_sym,
       |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tok,
       |    len(list_filter(regexp_split_to_array(text, '\\s+'),
       |        x -> x IN ('join', 'filter', 'scan', 'hash', 'merge', 'query'))) AS n_kw
       |  FROM documents)
       |SELECT doc_id, n_chars, CAST(n_sym AS BIGINT) AS n_sym,
       |  CAST(n_digit AS BIGINT) AS n_digit, CAST(n_kw AS BIGINT) AS n_kw,
       |  CAST(n_sym AS DOUBLE) / n_chars AS sym_ratio,
       |  CAST(n_digit AS DOUBLE) / n_chars AS digit_ratio,
       |  CAST(n_kw AS DOUBLE) / n_tok AS kw_density,
       |  CAST(n_sym AS DOUBLE) / n_chars > 0.01
       |    OR CAST(n_kw AS DOUBLE) / n_tok > CAST(0.3 AS DOUBLE) AS is_codey
       |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[{}();=<>\\[\\]]", "")))
          .cast("long").as("n_sym"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_digit"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        size(array_intersect_count_helper(col("text"))).cast("long").as("n_kw"))
      .select(col("doc_id"), col("n_chars"), col("n_sym"), col("n_digit"), col("n_kw"),
        (col("n_sym").cast("double") / col("n_chars")).as("sym_ratio"),
        (col("n_digit").cast("double") / col("n_chars")).as("digit_ratio"),
        (col("n_kw").cast("double") / col("n_tok")).as("kw_density"),
        ((col("n_sym").cast("double") / col("n_chars")) > 0.01 ||
          (col("n_kw").cast("double") / col("n_tok")) > 0.3).as("is_codey"))
      .orderBy(col("doc_id"))
  }

  /** Tokens of `text` matching the code-keyword set (t47 helper). */
  private def array_intersect_count_helper(text: Column): Column =
    filter(tokens(text), t => t.isin("join", "filter", "scan", "hash", "merge", "query"))

  /** Dedup capacity-planning card — the back-of-envelope a platform
    * team runs before launching a corpus-wide dedup: from one corpus
    * aggregate (doc/token/char counts), the projected shuffle payload
    * of each method at this corpus size — exact-hash (digest+id),
    * MinHash-LSH banding (16 bands x (band, bhash, id)), SimHash
    * (fingerprint+id), and winnowing (fingerprints/doc from the
    * window rule) — plus bytes-per-doc ratios. Pure integer arithmetic
    * over a single scan; the card's point is that every method ships
    * CONSTANT-WIDTH rows, never text (the repo's own shuffle
    * discipline, quantified). */
  private val t48 = QDef(
    "t48_dedup_cost_card",
    s"""WITH t AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens,
       |    CAST(SUM(length(text)) AS BIGINT) AS n_chars
       |  FROM documents)
       |SELECT n_docs, n_tokens, n_chars,
       |  n_docs * (16 + 8) AS exact_shuffle_bytes,
       |  n_docs * 16 * (8 + 8 + 8) AS lsh_shuffle_bytes,
       |  n_docs * (8 + 8) AS simhash_shuffle_bytes,
       |  GREATEST(n_tokens - 4 * n_docs, n_docs) * (8 + 8) AS winnow_shuffle_bytes,
       |  CAST(n_docs * 16 * 24 AS DOUBLE) / n_chars AS lsh_vs_text_ratio
       |FROM t""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text")))).cast("long").as("n_tokens"),
        sum(length(col("text"))).cast("long").as("n_chars"))
      .select(col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_docs") * (16 + 8)).as("exact_shuffle_bytes"),
        (col("n_docs") * 16 * (8 + 8 + 8)).as("lsh_shuffle_bytes"),
        (col("n_docs") * (8 + 8)).as("simhash_shuffle_bytes"),
        (greatest(col("n_tokens") - lit(4) * col("n_docs"), col("n_docs")) * (8 + 8))
          .as("winnow_shuffle_bytes"),
        ((col("n_docs") * 16 * 24).cast("double") / col("n_chars"))
          .as("lsh_vs_text_ratio"))
  }

  /** Source-level lexical diversity card — type-token ratio and hapax-
    * legomenon share per source (t02 measures per-DOC diversity; the
    * corpus-level vocabulary requires the real token-frequency
    * aggregation and is the signal template-spam sources fail: huge
    * token mass, tiny vocabulary, near-zero hapax share). Two
    * map-side-combined hash aggregates — (source, token) counts, then
    * the per-source rollup; integer counts until two final exact
    * divisions. */
  private val t49 = QDef(
    "t49_lexical_diversity",
    """WITH tok AS (
      |  SELECT source,
      |    unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
      |  FROM documents),
      |tf AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS vocab,
      |  COUNT(*) FILTER (WHERE c = 1) AS hapax,
      |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS ttr,
      |  CAST(COUNT(*) FILTER (WHERE c = 1) AS DOUBLE) / COUNT(*) AS hapax_share
      |FROM tf GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    tf.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("vocab"),
        count(when(col("c") === 1, 1)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        (col("vocab").cast("double") / col("n_tokens")).as("ttr"),
        (col("hapax").cast("double") / col("vocab")).as("hapax_share"))
      .orderBy(col("source"))
  }

  /** Per-source token-length-distribution drift vs the corpus — a χ²
    * statistic over the 11-bucket length histogram (1..10 chars, 11+).
    * The distribution-shift monitor between crawl snapshots/sources
    * that needs no logarithms (the pre-log rule: IEEE +,-,×,÷ are
    * exactly rounded and engine-identical; ln is not). Expected counts
    * e = corpus share × source mass use one division and one multiply
    * in a fixed order; each χ² term is (o−e)²/e on bit-identical
    * doubles; the 11-term sum goes through the decimal-rounding dsum so
    * addition order can't matter. Zero-observation buckets contribute e
    * (o=0), via the bucket×source frame completion — never dropped.
    * Scale: per-row expression work + three tiny keyed aggregates; the
    * 11-row corpus histogram broadcasts. */
  private val t50 = QDef(
    "t50_length_drift_chi2", {
      val e = "(CAST(cb AS DOUBLE) / CAST(nn AS DOUBLE)) * CAST(ns AS DOUBLE)"
      s"""WITH tok AS (
       |  SELECT source,
       |    least(len(unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))), 11) AS b
       |  FROM documents),
       |o AS (SELECT source, b, COUNT(*) AS o FROM tok GROUP BY source, b),
       |cb AS (SELECT b, COUNT(*) AS cb FROM tok GROUP BY b),
       |ns AS (SELECT source, COUNT(*) AS ns FROM tok GROUP BY source),
       |nn AS (SELECT COUNT(*) AS nn FROM tok),
       |grid AS (
       |  SELECT ns.source, cb.b, ns.ns, cb.cb, nn.nn, COALESCE(o.o, 0) AS o
       |  FROM ns CROSS JOIN cb CROSS JOIN nn
       |  LEFT JOIN o ON o.source = ns.source AND o.b = cb.b)
       |SELECT source, CAST(ns AS BIGINT) AS n_tokens,
       |  ${graft.util.Det.sqlDsum(s"(o - $e) * (o - $e) / ($e)")} AS chi2
       |FROM grid GROUP BY source, ns ORDER BY source""".stripMargin
    }) { (s, d) =>
    import graft.util.Det.dsum
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("_t"))
      .select(col("source"), least(length(col("_t")), lit(11)).as("b"))
      .persistTracked()
    val o = tok.groupBy(col("source"), col("b")).agg(count(lit(1)).as("o"))
    val cb = tok.groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val ns = tok.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val nn = tok.agg(count(lit(1)).as("nn"))
    val grid = ns.crossJoin(broadcast(cb)).crossJoin(broadcast(nn))
      .join(o, Seq("source", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val e = (col("cb").cast("double") / col("nn").cast("double")) *
      col("ns").cast("double")
    grid
      .withColumn("term", (col("o") - e) * (col("o") - e) / e)
      .groupBy(col("source"), col("ns"))
      .agg(dsum(col("term")).as("chi2"))
      .select(col("source"), col("ns").cast("long").as("n_tokens"), col("chi2"))
      .orderBy(col("source"))
  }
}
