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
    val named = params.zipWithIndex
      .map { case (v, i) => s"p${i + 1}" -> bindable(v) }.toMap
    spark.sql(rewrite(sql), named)
  }

  /** Spark's parameter binding (`Literal.apply`) accepts typed arrays
    * but not generic `Seq`, and has no TIME literal — convert the
    * decoded wire shapes ([[graft.server.PgWire.decodeBinaryParam]])
    * into bindable values. Element runtime classes drive the array's
    * component type, so int4[]/int8[]/float8[]/text[]/... all bind as
    * typed object arrays (null elements preserved). */
  private[graft] def bindable(v: Any): Any = v match {
    // already a typed object array (the empty-array parameter decode
    // picks the component class from the declared element oid)
    case a: Array[_] => a
    case xs: scala.collection.Seq[_] =>
      val mapped = xs.map(bindable)
      val elemClass = mapped.collectFirst {
        case e if e != null => e.getClass.asInstanceOf[Class[AnyRef]]
      }.getOrElse(classOf[java.lang.String].asInstanceOf[Class[AnyRef]])
      val arr = java.lang.reflect.Array
        .newInstance(elemClass, mapped.size).asInstanceOf[Array[AnyRef]]
      mapped.iterator.zipWithIndex.foreach { case (e, i) =>
        arr(i) = e.asInstanceOf[AnyRef]
      }
      arr
    // Spark 4.1 has no TIME parameter literal (UNSUPPORTED_TIME_TYPE);
    // bind the PG text form — comparisons/casts coerce from string
    case t: java.time.LocalTime => t.toString
    case other => other
  }
}
