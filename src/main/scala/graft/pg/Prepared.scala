package graft.pg

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Prepared-statement execution (reference A42, extended query
  * protocol): PostgreSQL `$1..$n` placeholders mapped onto Spark's
  * parameterized SQL (3.4+), which substitutes at the analyzed-plan
  * level — the same "store plan, bind later" shape the reference gets
  * from `plan.with_param_values` (handler.rs:128-145).
  */
object Prepared {

  private val Placeholder = "\\$(\\d+)".r

  /** Rewrite $n placeholders to named parameters (:pN). Placeholders
    * inside single-quoted string literals are left untouched. */
  def rewrite(sql: String): String = {
    val out = new StringBuilder
    var inString = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { inString = !inString; out += c; i += 1 }
      else if (!inString && c == '$' && i + 1 < sql.length && sql.charAt(i + 1).isDigit) {
        var j = i + 1
        while (j < sql.length && sql.charAt(j).isDigit) j += 1
        out ++= ":p" + sql.substring(i + 1, j)
        i = j
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Execute `sql` with positional PG parameters. */
  def execute(spark: SparkSession, sql: String, params: Seq[Any]): DataFrame = {
    val named = params.zipWithIndex.map { case (v, i) => s"p${i + 1}" -> v }.toMap
    spark.sql(rewrite(sql), named)
  }
}
