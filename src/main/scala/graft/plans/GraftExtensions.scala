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

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case t: UnresolvedInlineTable if t.rows.exists(_.exists(hasFunction)) =>
      val projects = t.rows.map { row =>
        Project(row.zip(t.names).map { case (e, n) =>
          Alias(e, n)()
        }, OneRowRelation())
      }
      if (projects.size == 1) projects.head else Union(projects)
  }

  private def hasFunction(e: Expression): Boolean =
    e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedFunction])

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
