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
    else rewrite(delegate.parsePlan(
      rewriteCopyTo(sqlText).orElse(rewriteCopyFrom(sqlText))
        .orElse(rewriteCreateExternal(sqlText))
        .getOrElse(eraseUnsupportedCasts(sqlText))))
  }

  // the default implementation drops the parameter context, which
  // breaks spark.sql(text, args) — must forward to the real parser
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan = {
    val trimmed = sqlText.trim.stripSuffix(";").trim.toLowerCase
    if (TxnKeywords(trimmed)) emptyResult
    else rewrite(delegate.parsePlanWithParameters(
      rewriteCopyTo(sqlText).orElse(rewriteCopyFrom(sqlText))
        .orElse(rewriteCreateExternal(sqlText))
        .getOrElse(eraseUnsupportedCasts(sqlText)), ctx))
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
  private val DoubleColonCast = s"(?i)::\\s*$RegTypes\\b".r
  private val ExplicitCast = s"(?i)\\bCAST\\s*\\(\\s*('[^']*')\\s+AS\\s+$RegTypes\\s*\\)".r

  /** PG catalog-introspection casts Spark has no types for: erase
    * `'x'::regclass` and `CAST('x' AS regclass)` down to the inner
    * value (reference postgres_stmt.rs:105-176). Text-level, applied
    * before parsing (Spark rejects the type names at parse time). */
  def eraseUnsupportedCasts(sql: String): String = {
    val noCastCalls = ExplicitCast.replaceAllIn(sql, m => m.group(1))
    DoubleColonCast.replaceAllIn(noCastCalls, "")
  }

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
