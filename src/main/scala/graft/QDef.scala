package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL the
  * driver runs as the correctness oracle. Column names and row order
  * must match between the two — the driver hash-compares values.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}
