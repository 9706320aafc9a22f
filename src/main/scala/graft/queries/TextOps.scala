package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}

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

  def defs: Seq[QDef] = Seq(t01, t02, t03, t04, t05, t06, t07, t08)

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
}
