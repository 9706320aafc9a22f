package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator (SURVEY §2) registers a [[QDef]] in one of
  * the module objects under `graft.queries`; this object just aggregates
  * them into the driver's two maps.
  */
object SparkEntry {

  /** All registered query definitions, in module order. */
  def allDefs: Seq[QDef] =
    Relational.defs ++ Events.defs ++ TextOps.defs ++ JoinOps.defs ++
      DedupOps.defs ++ VectorOps.defs ++ Spatial.defs ++ PgCatalog.defs ++
      Multimedia.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
