package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedInlineTable
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, OneRowRelation, Project, Union}
import org.apache.spark.sql.types.{DataType, StructType}

/** Session extension bundle — the Spark analogue of the reference's
  * `QueryContext::new` wiring (/root/reference/src/core/src/context.rs:
  * 31-68): parser rewrites + function registration in one installable
  * unit (`SparkSession.builder().withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    e.injectPlannerStrategy(_ => SpatialJoinStrategy)
    graft.sources.Federation.tableFunctions.foreach(e.injectTableFunction)
    // federation scans resolve against the session owning the query
    // (never SparkSession.active — wrong under concurrent sessions)
    e.injectResolutionRule(graft.sources.ResolveFederationScans.apply)
  }
}

/** Delegating parser applying AST-level compatibility rewrites — the
  * architectural slot of the reference's `StatementRewrite` chain
  * (postgres_stmt.rs:13-176).
  *
  * Rewrite implemented here: inline `VALUES` rows containing function
  * calls become `UNION ALL` of single-row projections. Spark's
  * ResolveInlineTables requires foldable expressions; PostgreSQL (and
  * the reference via DataFusion) evaluate arbitrary expressions in
  * VALUES, which the spatial test corpus relies on.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val trimmed = sqlText.trim.stripSuffix(";").trim.toLowerCase
    // Transaction keywords acknowledged as no-ops, never executed
    // (reference handler.rs:43-67 / :108-127).
    if (TxnKeywords(trimmed)) emptyResult
    // psql's extended-statistics and row-policy probes use PG-only
    // syntax Spark cannot parse (unnest alias lists, `= any(...)`,
    // ARRAY(subquery)); the correct answer is always zero rows here,
    // so answer them with a canned empty relation (psql only checks
    // the tuple count before rendering these sections)
    else PsqlProbe.findFirstMatchIn(trimmed) match {
      case Some(m) => probeEmpty(m.group(1))
      case None    => rewrite(delegate.parsePlan(preprocess(sqlText)))
    }
  }

  // the default implementation drops the parameter context, which
  // breaks spark.sql(text, args) — must forward to the real parser
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan = {
    val trimmed = sqlText.trim.stripSuffix(";").trim.toLowerCase
    if (TxnKeywords(trimmed)) emptyResult
    else PsqlProbe.findFirstMatchIn(trimmed) match {
      case Some(m) => probeEmpty(m.group(1))
      case None =>
        rewrite(delegate.parsePlanWithParameters(preprocess(sqlText), ctx))
    }
  }

  /** Text-level compatibility rewrites applied before the real parser:
    * PG client-introspection operators, DataFusion file statements, PG
    * `DISTINCT ON`, `QUALIFY`, and catalog-cast erasure, in that
    * order. */
  private def preprocess(sqlText: String): String = {
    val pgc = rewritePgClientOps(sqlText)
    val base = rewriteCopyTo(pgc).orElse(rewriteCopyFrom(pgc))
      .orElse(rewriteCreateExternal(pgc))
      .getOrElse(pgc)
    val st = rewriteSimilarTo(base).getOrElse(base)
    val sel = rewriteDistinctOn(st).orElse(rewriteQualify(st))
      .getOrElse(st)
    eraseUnsupportedCasts(sel)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case t: UnresolvedInlineTable if t.rows.exists(_.exists(hasFunction)) =>
      val projects = t.rows.map { row =>
        Project(row.zip(t.names).map { case (e, n) =>
          Alias(e, n)()
        }, OneRowRelation())
      }
      if (projects.size == 1) projects.head else Union(projects)
    // public.* qualifiers resolve to the session temp views registered
    // by PgCompat (the reference registers its catalog tables under both
    // schemas, catalog/src/postgres/mod.rs:25-52). pg_catalog.* needs no
    // rewrite: it resolves through the PgCatalogPlugin V2 catalog.
    case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if r.multipartIdentifier.size == 2 &&
          r.multipartIdentifier.head.toLowerCase == "public" &&
          r.multipartIdentifier(1).toLowerCase.startsWith("pg_") =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
        Seq(r.multipartIdentifier(1)), r.options, r.isStreaming)
  }

  private def hasFunction(e: Expression): Boolean =
    e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedFunction])

  private def emptyResult: LogicalPlan =
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(Nil, Nil)

  /** Zero rows with a column shape matching what the probe's section
    * reads — psql checks the tuple count and skips the section. */
  private def probeEmpty(table: String): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType}
    val cols = table match {
      case "pg_statistic_ext" => Seq(
        AttributeReference("oid", IntegerType)(),
        AttributeReference("stxrelid", IntegerType)(),
        AttributeReference("nsp", StringType)(),
        AttributeReference("stxname", StringType)(),
        AttributeReference("columns", StringType)(),
        AttributeReference("ndist_enabled", BooleanType)(),
        AttributeReference("deps_enabled", BooleanType)())
      case _ => Seq( // pg_policy
        AttributeReference("polname", StringType)(),
        AttributeReference("polpermissive", BooleanType)(),
        AttributeReference("roles", StringType)(),
        AttributeReference("qual", StringType)(),
        AttributeReference("withcheck", StringType)(),
        AttributeReference("cmd", StringType)())
    }
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(cols, Nil)
  }

  // pure delegation below
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(delegate.parseQuery(sqlText))
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** Transaction control statements acknowledged but never executed. */
  private val TxnKeywords: Set[String] = Set(
    "begin", "begin transaction", "begin work", "start transaction",
    "commit", "commit transaction", "commit work", "end", "end transaction",
    "rollback", "rollback transaction", "rollback work", "abort")

  private val RegTypes = "(?:regclass|regproc|regprocedure|regtype|regnamespace|oid)"
  private val DoubleColonCast = s"(?i)::\\s*(?:pg_catalog\\.)?$RegTypes\\b".r
  private val ExplicitCast = s"(?i)\\bCAST\\s*\\(\\s*('[^']*')\\s+AS\\s+$RegTypes\\s*\\)".r
  // PG string-ish type names Spark calls `string`
  private val TextCast =
    "(?i)::\\s*(?:pg_catalog\\.)?(?:text|name|bpchar|\"char\"|char)\\b".r

  /** PG catalog-introspection casts Spark has no types for: erase
    * `'x'::regclass` and `CAST('x' AS regclass)` down to the inner
    * value (reference postgres_stmt.rs:105-176). Text-level, applied
    * before parsing (Spark rejects the type names at parse time).
    * `::text`-family casts become `::string` (same semantics). */
  def eraseUnsupportedCasts(sql: String): String = {
    val noCastCalls = ExplicitCast.replaceAllIn(sql, m => m.group(1))
    val noReg = DoubleColonCast.replaceAllIn(noCastCalls, "")
    if (noReg.contains("::")) TextCast.replaceAllIn(noReg, "::string")
    else noReg
  }

  private val OperatorRegexMatch =
    "(?i)\\bOPERATOR\\s*\\(\\s*pg_catalog\\.(!?~)\\s*\\)".r
  private val NotTildeOp = "(?<=[\\w'\")\\]])\\s*!~\\s*(?=')".r
  private val TildeOp = "(?<=[\\w'\")\\]])\\s*~\\s*(?=')".r
  private val CollateDefault =
    "(?i)\\s+COLLATE\\s+(?:pg_catalog\\.)?(?:\"default\"|default|\"C\")".r
  private val PgCatalogFnPrefix = "(?i)\\bpg_catalog\\.(\\w+\\s*\\()".r
  // PG double-quoted ALIASES (`as "Schema"`) — Spark's default dialect
  // reads "..." as a string literal and rejects it in alias position,
  // so quote with backticks instead. Alias position only: a blanket
  // "..."→`...` rewrite would break double-quoted string literals.
  private val QuotedAlias = "(?i)\\bAS\\s+\"([^\"]+)\"".r
  // standalone E prefix of a PG escape-string literal (not part of a
  // longer identifier): E immediately followed by a quote
  /** Strip the `E` prefix of PG escape-string literals (`E'\n'` →
    * `'\n'`; Spark's default literals already process backslash
    * escapes). Quote-aware by construction: a regex alone corrupts
    * ordinary literals whose TEXT ends in E (`'GRADE E'` → `'GRADE '`),
    * so this scans with string/identifier/comment state and only strips
    * an E that OPENS a literal. Inside strings, backslash escapes the
    * next char and `''` is a doubled quote — Spark's own lexing. */
  private def stripEscapeStringPrefixes(sql: String): String = {
    val n = sql.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var inStr = false; var inIdent = false
    var inLine = false; var inBlock = false
    while (i < n) {
      val c = sql.charAt(i)
      if (inLine) {
        sb.append(c); if (c == '\n') inLine = false; i += 1
      } else if (inBlock) {
        if (c == '*' && i + 1 < n && sql.charAt(i + 1) == '/') {
          sb.append("*/"); i += 2; inBlock = false
        } else { sb.append(c); i += 1 }
      } else if (inStr) {
        if (c == '\\' && i + 1 < n) { // escape: keep pair verbatim
          sb.append(c); sb.append(sql.charAt(i + 1)); i += 2
        } else if (c == '\'') {
          if (i + 1 < n && sql.charAt(i + 1) == '\'') { // doubled quote
            sb.append("''"); i += 2
          } else { sb.append(c); inStr = false; i += 1 }
        } else { sb.append(c); i += 1 }
      } else if (inIdent) {
        sb.append(c); if (c == '"') inIdent = false; i += 1
      } else c match {
        case '\'' => sb.append(c); inStr = true; i += 1
        case '"'  => sb.append(c); inIdent = true; i += 1
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          sb.append("--"); i += 2; inLine = true
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          sb.append("/*"); i += 2; inBlock = true
        case 'E' | 'e' if i + 1 < n && sql.charAt(i + 1) == '\'' &&
            (i == 0 || { val p = sql.charAt(i - 1)
              !Character.isLetterOrDigit(p) && p != '_' && p != '\'' }) =>
          i += 1 // drop the prefix; the quote opens the literal next pass
        case _ => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Rewrites for the introspection SQL PG wire clients (psql, BI
    * tools, drivers) send — the textual analogue of the reference's
    * StatementRewrite chain (postgres_stmt.rs:13-176):
    * `OPERATOR(pg_catalog.~)` / `~` / `!~` regex-match operators →
    * `[NOT] RLIKE`, `COLLATE pg_catalog.default` erased, and
    * `pg_catalog.`-qualified function calls unqualified (they are
    * session functions here). Gated on the strings those clients
    * actually emit, so normal query traffic never pays the regexes. */
  def rewritePgClientOps(sql: String): String = {
    val needsOps = sql.contains("~") || sql.toUpperCase.contains("COLLATE")
    val needsFns = sql.contains("pg_catalog.")
    val needsEstr = sql.contains("E'") || sql.contains("e'")
    if (!needsOps && !needsFns && !needsEstr) return sql
    var s = sql
    // PG escape-string literals (psql: array_to_string(acl, E'\n')) —
    // Spark's default string literal already processes backslash
    // escapes, so dropping the E prefix preserves the value
    if (needsEstr) s = stripEscapeStringPrefixes(s)
    if (needsOps) {
      s = OperatorRegexMatch.replaceAllIn(s,
        m => if (m.group(1) == "!~") " NOT RLIKE " else " RLIKE ")
      s = NotTildeOp.replaceAllIn(s, " NOT RLIKE ")
      s = TildeOp.replaceAllIn(s, " RLIKE ")
      s = CollateDefault.replaceAllIn(s, "")
    }
    if (s.contains("\""))
      s = QuotedAlias.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement("AS `" + m.group(1) + "`"))
    if (needsFns)
      s = PgCatalogFnPrefix.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(m.group(1)))
    s
  }

  /** psql describe probes with PG-only syntax, always empty here. */
  private[plans] val PsqlProbe =
    "(?is)^select\\b.*\\bfrom\\s+pg_catalog\\.(pg_statistic_ext|pg_policy)\\b".r

  // `COPY (query)|table TO 'path' [(FORMAT fmt, ...)]` — DataFusion's
  // file-export statement (wire-level `COPY ... TO STDOUT` is handled
  // by PgServer and never reaches the parser)
  private val CopyToFile =
    ("(?is)^\\s*COPY\\s+(\\(.*\\)|[\\w.\"]+)\\s+TO\\s+'([^']+)'" +
      "\\s*(?:\\(\\s*FORMAT\\s+(\\w+)[^)]*\\))?\\s*;?\\s*$").r

  // `CREATE EXTERNAL TABLE t [(cols)] STORED AS fmt LOCATION 'path'` —
  // DataFusion's mount syntax (reference sqllogictest cookbook)
  private val CreateExternal =
    ("(?is)^\\s*CREATE\\s+EXTERNAL\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "([\\w.\"]+)\\s*(\\([^)]*\\))?\\s*STORED\\s+AS\\s+(\\w+)\\s+" +
      "LOCATION\\s+'([^']+)'\\s*;?\\s*$").r

  /** DataFusion-style `CREATE EXTERNAL TABLE` → Spark's
    * `CREATE TABLE ... USING <format> LOCATION` (same semantics: mount
    * files in place, schema inferred or declared, no data copied). */
  def rewriteCreateExternal(sql: String): Option[String] = sql match {
    case CreateExternal(name, cols, fmt, path) =>
      val colSpec = Option(cols).getOrElse("")
      // AVRO routes to the in-repo DataSource V2 (sources/GraftAvro) —
      // this Spark build ships no spark-avro module
      val using =
        if (fmt.equalsIgnoreCase("avro")) "`graft-avro`" else fmt.toLowerCase
      Some(s"CREATE TABLE $name $colSpec USING $using LOCATION '$path'")
    case _ => None
  }

  // `COPY table FROM 'path' [(FORMAT fmt)]` — file ingest, the server-
  // side counterpart of wire-level COPY FROM STDIN
  private val CopyFromFile =
    ("(?is)^\\s*COPY\\s+([\\w.\"]+)\\s+FROM\\s+'([^']+)'" +
      "\\s*(?:\\(\\s*FORMAT\\s+(\\w+)[^)]*\\))?\\s*;?\\s*$").r

  /** `COPY t FROM 'file'` → `INSERT INTO t SELECT * FROM fmt.`file``
    * (Spark's direct-file table syntax — a distributed read+append,
    * no driver funnel). Format from option or extension. */
  def rewriteCopyFrom(sql: String): Option[String] = sql match {
    case CopyFromFile(table, path, fmt) =>
      val format = Option(fmt).map(_.toLowerCase).getOrElse(
        path.split('.').last.toLowerCase match {
          case "json" | "ndjson" => "json"
          case "orc"             => "orc"
          case "csv"             => "csv"
          case _                 => "parquet"
        })
      Some(s"INSERT INTO $table SELECT * FROM $format.`$path`")
    case _ => None
  }

  /** Minimal SQL text scanner: finds keywords at paren depth 0 outside
    * '...', "..." and `...` quoting, so rewrites never touch string
    * literals or subqueries. */
  private[plans] object SqlText {
    private def identChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_'

    /** Position just past a quoted run starting at `i` (s(i) is the
      * opening quote). Doubled quotes inside '...' are the PG escape. */
    def skipQuoted(s: String, i: Int): Int = {
      val q = s.charAt(i)
      var j = i + 1
      while (j < s.length) {
        if (s.charAt(j) == q) {
          if (q == '\'' && j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2
          else return j + 1
        } else j += 1
      }
      s.length
    }

    /** Index just past the parenthesis matching the one at `open`. */
    def matchingParen(s: String, open: Int): Int = {
      var depth = 0
      var i = open
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' | '"' | '`' => i = skipQuoted(s, i)
          case '(' => depth += 1; i += 1
          case ')' =>
            depth -= 1; i += 1
            if (depth == 0) return i
          case _ => i += 1
        }
      }
      -1
    }

    /** True when the (single- or multi-word, space-separated) keyword
      * `kw` matches at position `i` of lowercase text `lower`, word-
      * bounded on both sides; returns the end index, or -1. */
    private def keywordAt(lower: String, i: Int, kw: String): Int = {
      if (i > 0 && identChar(lower.charAt(i - 1))) return -1
      var pos = i
      val words = kw.split(' ')
      var w = 0
      while (w < words.length) {
        val word = words(w)
        if (!lower.startsWith(word, pos)) return -1
        pos += word.length
        if (w < words.length - 1) {
          var sp = 0
          while (pos < lower.length && lower.charAt(pos).isWhitespace) {
            pos += 1; sp += 1
          }
          if (sp == 0) return -1
        }
        w += 1
      }
      if (pos < lower.length && identChar(lower.charAt(pos))) -1 else pos
    }

    /** First top-level occurrence of `kw` at or after `from`; -1 if
      * absent. */
    def indexOfTopLevel(s: String, kw: String, from: Int): Int = {
      val lower = s.toLowerCase
      var i = math.max(from, 0)
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' | '"' | '`' => i = skipQuoted(s, i)
          case '(' => i = math.max(matchingParen(s, i), i + 1)
          case _ =>
            if (keywordAt(lower, i, kw) >= 0) return i
            i += 1
        }
      }
      -1
    }

    def containsTopLevel(s: String, kw: String): Boolean =
      indexOfTopLevel(s, kw, 0) >= 0

    /** Split on top-level commas (outside parens and quotes). */
    def splitTopLevel(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var start = 0
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' | '"' | '`' => i = skipQuoted(s, i)
          case '(' => i = math.max(matchingParen(s, i), i + 1)
          case ',' => out += s.substring(start, i); start = i + 1; i += 1
          case _ => i += 1
        }
      }
      out += s.substring(start)
      out.result().map(_.trim).filter(_.nonEmpty)
    }
  }

  // `expr SIMILAR TO 'pattern'` — the SQL-standard pattern operator PG
  // (and DuckDB, and the reference through DataFusion's PG dialect)
  // accept; Spark has no syntax for it, so the operator + literal are
  // rewritten in place to RLIKE with the pattern translated to a Java
  // regex. Only the operator and its literal move — the left operand
  // stays untouched, which makes the text rewrite safe for any
  // expression shape.
  private val SimilarTo =
    "(?is)\\b(NOT\\s+)?SIMILAR\\s+TO\\s+('(?:[^']|'')*')".r

  /** Translate a SQL `SIMILAR TO` pattern to a Java regex: `%` → `.*`,
    * `_` → `.`; `.` `^` `$` (regex-special but SIMILAR-TO-literal) get
    * escaped; `| * + ? { } ( ) [ ]` keep their shared meaning;
    * character classes pass through untranslated. */
  private[plans] def similarToRegex(pat: String): String = {
    val out = new StringBuilder("^(?:")
    var i = 0
    var inClass = false
    while (i < pat.length) {
      val c = pat.charAt(i)
      c match {
        case '\\' if i + 1 < pat.length => // explicit escape: keep pair
          out.append('\\').append(pat.charAt(i + 1)); i += 1
        case '[' if !inClass => inClass = true; out.append('[')
        case ']' if inClass  => inClass = false; out.append(']')
        case _ if inClass    => out.append(c)
        case '%'             => out.append(".*")
        case '_'             => out.append('.')
        case '.' | '^' | '$' => out.append('\\').append(c)
        case _               => out.append(c)
      }
      i += 1
    }
    out.append(")$").toString
  }

  /** Rewrite every `[NOT] SIMILAR TO '<pattern>'` into
    * `[NOT] RLIKE '<translated regex>'`. Returns None when the text
    * contains no SIMILAR TO (the common case — zero-cost). */
  def rewriteSimilarTo(sql: String): Option[String] = {
    if (!sql.toLowerCase.contains("similar")) return None
    var hit = false
    val out = SimilarTo.replaceAllIn(sql, m => {
      hit = true
      val neg = Option(m.group(1)).map(_ => "NOT ").getOrElse("")
      val quoted = m.group(2)
      val pat = quoted.substring(1, quoted.length - 1).replace("''", "'")
      val regex = similarToRegex(pat)
      val lit = "'" + regex.replace("\\", "\\\\").replace("'", "''") + "'"
      java.util.regex.Matcher.quoteReplacement(s"${neg}RLIKE $lit")
    })
    if (hit) Some(out) else None
  }

  private val DistinctOnPrefix = "(?is)^\\s*SELECT\\s+DISTINCT\\s+ON\\s*\\(".r

  /** PostgreSQL `SELECT DISTINCT ON (keys) sel FROM ... ORDER BY ord`
    * (the reference accepts it through DataFusion's PG dialect) →
    * first-row-per-key via a ranking window:
    * `SELECT * EXCEPT(rn) FROM (SELECT sel, row_number() OVER
    * (PARTITION BY keys ORDER BY ord) rn FROM ...) WHERE rn = 1`.
    * Distributed shape: one hash shuffle on the keys, no global sort.
    * Top-level statements only; absent ORDER BY falls back to the keys
    * themselves (PG then picks an arbitrary row — here a deterministic
    * one). */
  def rewriteDistinctOn(sql: String): Option[String] = {
    val s = sql.trim.stripSuffix(";")
    DistinctOnPrefix.findPrefixMatchOf(s).flatMap { m =>
      val open = m.end - 1
      val close = SqlText.matchingParen(s, open)
      if (close < 0) return None
      val keys = s.substring(open + 1, close - 1).trim
      val fromIdx = SqlText.indexOfTopLevel(s, "from", close)
      if (fromIdx < 0) return None
      val selList = s.substring(close, fromIdx).trim
      val orderIdx = SqlText.indexOfTopLevel(s, "order by", fromIdx)
      val limitIdx = SqlText.indexOfTopLevel(s, "limit", fromIdx)
      val offsetIdx = SqlText.indexOfTopLevel(s, "offset", fromIdx)
      val tailIdx = Seq(limitIdx, offsetIdx).filter(_ >= 0)
        .reduceOption(_ min _).getOrElse(s.length)
      val bodyEnd = if (orderIdx >= 0) orderIdx else tailIdx
      val body = s.substring(fromIdx, bodyEnd).trim
      val ord =
        if (orderIdx >= 0)
          s.substring(s.toLowerCase.indexOf("by", orderIdx) + 2, tailIdx).trim
        else keys
      // The outer row order follows PG: results come out ordered by the
      // ORDER BY, whose leading terms PG requires to be the DISTINCT ON
      // keys. Those terms may reference base columns absent from the
      // select list, so each is carried through the subquery as a hidden
      // column (with its ASC/DESC/NULLS modifier re-applied outside).
      val DirSuffix =
        "(?is)\\s+(ASC|DESC)?\\s*(NULLS\\s+(?:FIRST|LAST))?\\s*$".r
      val nKeys = SqlText.splitTopLevel(keys).size
      val ordTerms = SqlText.splitTopLevel(ord).take(nKeys).map { t =>
        val dir = DirSuffix.findFirstIn(t).map(_.trim).getOrElse("")
        val expr = DirSuffix.replaceAllIn(t, "")
        (expr, dir)
      }
      val hidden = ordTerms.zipWithIndex
        .map { case ((e, _), i) => s"($e) AS __graft_k$i" }
      val outerOrder =
        if (orderIdx >= 0)
          " ORDER BY " + ordTerms.zipWithIndex
            .map { case ((_, d), i) => s"__graft_k$i $d".trim }.mkString(", ")
        else ""
      val outerTail =
        if (tailIdx < s.length) " " + s.substring(tailIdx).trim else ""
      val dropCols =
        ("__graft_don" +: ordTerms.indices.map(i => s"__graft_k$i")).mkString(", ")
      Some(
        s"""SELECT * EXCEPT($dropCols) FROM (
           |SELECT $selList, ${hidden.mkString(", ")}, row_number() OVER (PARTITION BY $keys ORDER BY $ord) AS __graft_don
           |$body) __graft_don_t WHERE __graft_don = 1$outerOrder$outerTail""".stripMargin)
    }
  }

  /** DuckDB/BigQuery-style `QUALIFY` (filter on window results without a
    * subquery): the predicate either references select-list aliases —
    * then it becomes a plain outer `WHERE` over the original query as a
    * subquery — or contains inline `OVER` windows — then it is hoisted
    * into the select list as a boolean column evaluated in window scope
    * and filtered outside. Top-level statements only. */
  def rewriteQualify(sql: String): Option[String] = {
    val s = sql.trim.stripSuffix(";")
    if (!s.toLowerCase.matches("(?s)^\\s*select\\b.*")) return None
    val qIdx = SqlText.indexOfTopLevel(s, "qualify", 0)
    if (qIdx < 0) return None
    val head = s.substring(0, qIdx).trim
    val after = s.substring(qIdx + "qualify".length)
    val tailIdx = Seq("order by", "limit", "offset", "window")
      .map(SqlText.indexOfTopLevel(after, _, 0)).filter(_ >= 0)
      .reduceOption(_ min _).getOrElse(after.length)
    val pred = after.substring(0, tailIdx).trim
    val tail =
      if (tailIdx < after.length) " " + after.substring(tailIdx).trim else ""
    if (pred.isEmpty) return None
    if (SqlText.containsTopLevel(pred, "over")) {
      val fromIdx = SqlText.indexOfTopLevel(head, "from", 0)
      if (fromIdx < 0) return None
      val aug = head.substring(0, fromIdx) + s", ($pred) AS __graft_q " +
        head.substring(fromIdx)
      Some(s"SELECT * EXCEPT(__graft_q) FROM (\n$aug) __graft_q_t WHERE __graft_q$tail")
    } else
      Some(s"SELECT * FROM (\n$head) __graft_q_t WHERE $pred$tail")
  }

  /** DataFusion-style `COPY ... TO 'file'` → Spark's
    * `INSERT OVERWRITE DIRECTORY ... USING <format>`. Format comes from
    * the FORMAT option or the path extension (parquet default, like
    * the reference's DataFusion surface). Distributed write path —
    * each task writes its partition, no driver funnel. */
  def rewriteCopyTo(sql: String): Option[String] = sql match {
    case CopyToFile(src, path, fmt) =>
      val query =
        if (src.startsWith("(")) src.substring(1, src.length - 1)
        else s"SELECT * FROM $src"
      val format = Option(fmt).map(_.toLowerCase).getOrElse(
        path.split('.').last.toLowerCase match {
          case "csv"            => "csv"
          case "json" | "ndjson" => "json"
          case _                => "parquet"
        })
      val opts = if (format == "csv") " OPTIONS ('header' 'true')" else ""
      Some(s"INSERT OVERWRITE DIRECTORY '$path' USING $format$opts $query")
    case _ => None
  }
}
