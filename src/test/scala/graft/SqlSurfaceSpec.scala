package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftSqlParser

/** PG `DISTINCT ON` and DuckDB/BigQuery `QUALIFY` parser rewrites
  * (plans/GraftExtensions.scala) — surface the reference exposes through
  * DataFusion's PG dialect. Each SQL form is checked against a
  * DataFrame-API replay of the same semantics.
  */
class SqlSurfaceSpec extends GraftSuite {

  private def events = {
    Tables.registerViews(spark, sf)
    spark.table("events")
  }

  test("DISTINCT ON keeps the first row per key in ORDER BY order") {
    events // register views
    val got = spark.sql(
      """SELECT DISTINCT ON (user_id) user_id, ts, event_type
        |FROM events
        |ORDER BY user_id, ts DESC, event_id DESC""".stripMargin)
    assert(got.columns.toSeq == Seq("user_id", "ts", "event_type"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val want = events
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("user_id", "ts", "event_type")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // one row per user, ordered by user_id
    val ids = got.select("user_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted && ids.distinct.size == ids.size)
  }

  test("DISTINCT ON with expression keys and no ORDER BY is one row per key") {
    events
    val got = spark.sql(
      """SELECT DISTINCT ON (date_trunc('DAY', ts)) ts, value
        |FROM events""".stripMargin)
    val nKeys = events.select(date_trunc("DAY", col("ts"))).distinct().count()
    assert(got.count() == nKeys)
  }

  test("DISTINCT ON respects WHERE and LIMIT") {
    events
    val got = spark.sql(
      """SELECT DISTINCT ON (event_type) event_type, value
        |FROM events WHERE value > 10
        |ORDER BY event_type, value DESC LIMIT 3""".stripMargin)
    assert(got.count() == 3)
    val top = got.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = events.where(col("value") > 10)
      .groupBy("event_type").agg(max("value").as("value"))
      .orderBy("event_type").limit(3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(top == want)
  }

  test("QUALIFY on a select-list window alias") {
    events
    val got = spark.sql(
      """SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        |FROM events
        |QUALIFY rk <= 2
        |ORDER BY user_id, rk""".stripMargin)
    assert(got.columns.toSeq == Seq("user_id", "event_id", "rk"))
    val perUser = got.groupBy("user_id").count().agg(max("count")).head.getLong(0)
    assert(perUser <= 2)
    assert(got.where(col("rk") > 2).isEmpty)
  }

  test("QUALIFY with an inline OVER window and no alias") {
    events
    val got = spark.sql(
      """SELECT user_id, ts, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1""".stripMargin)
    assert(got.columns.toSeq == Seq("user_id", "ts", "value"))
    assert(got.count() == events.select("user_id").distinct().count())
  }

  test("QUALIFY composes with GROUP BY") {
    events
    val got = spark.sql(
      """SELECT event_type, COUNT(*) AS n FROM events
        |GROUP BY event_type
        |QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, event_type) <= 2""".stripMargin)
    val want = events.groupBy("event_type").count()
      .orderBy(col("count").desc, col("event_type")).limit(2)
      .collect().map(_.getString(0)).toSet
    assert(got.collect().map(_.getString(0)).toSet == want)
  }

  test("keywords inside string literals and subqueries are not rewritten") {
    // 'qualify' in a literal must not trigger the rewrite
    val r1 = spark.sql("SELECT 'please qualify this' AS s").head.getString(0)
    assert(r1 == "please qualify this")
    // DISTINCT ON text inside a literal
    val r2 = spark.sql("SELECT 'SELECT DISTINCT ON (x)' AS s").head.getString(0)
    assert(r2 == "SELECT DISTINCT ON (x)")
  }

  test("E-string prefix strip is quote-aware: literals ending in E survive") {
    // regression: the old regex rewrite matched the E INSIDE 'GRADE E'
    // (preceded by a space, followed by the literal's closing quote)
    // and silently corrupted the value to 'GRADE '
    assert(spark.sql("SELECT 'GRADE E' AS s").head.getString(0) == "GRADE E")
    assert(spark.sql("SELECT 'PLAN E' AS s WHERE 'SIZE E' = 'SIZE E'")
      .head.getString(0) == "PLAN E")
    // a REAL escape-string literal still has its prefix stripped, both
    // cases, including after '(' and ','
    assert(spark.sql("SELECT length(E'a\\nb') AS n").head.getInt(0) == 3)
    assert(spark.sql("SELECT concat('x', e'\\ty') AS s").head.getString(0) == "x\ty")
    // E inside comments and quoted identifiers is untouched
    assert(spark.sql("SELECT 'ok' AS s -- note E'ish trailer")
      .head.getString(0) == "ok")
  }

  test("rewrite helpers leave plain SQL untouched") {
    assert(GraftSqlParser.rewriteDistinctOn("SELECT a FROM t").isEmpty)
    assert(GraftSqlParser.rewriteQualify("SELECT a FROM t WHERE b > 1").isEmpty)
    assert(GraftSqlParser.rewriteQualify(
      "CREATE TABLE q (qualify INT)").isEmpty)
  }

  test("SIMILAR TO translates SQL patterns to regex semantics") {
    // PG documentation examples
    val cases = Seq(
      ("'abc' SIMILAR TO 'abc'", true),
      ("'abc' SIMILAR TO 'a'", false),
      ("'abc' SIMILAR TO '%(b|d)%'", true),
      ("'abc' SIMILAR TO '(b|c)%'", false),
      ("'-abc-' SIMILAR TO '%\\mabc\\M%'", false), // \m not supported -> literal
      ("'a.c' SIMILAR TO 'a.c'", true),     // dot is literal in SIMILAR TO
      ("'abc' SIMILAR TO 'a_c'", true),
      ("'xy' SIMILAR TO 'x[yz]'", true),
      ("'abc' NOT SIMILAR TO 'a'", true))
    for ((e, want) <- cases.filterNot(_._1.contains("\\m"))) {
      val got = spark.sql(s"SELECT $e AS r").head.getBoolean(0)
      assert(got == want, s"$e => $got, want $want")
    }
  }

  test("SIMILAR TO escaped quotes and no-op on plain text") {
    import graft.plans.GraftSqlParser
    assert(GraftSqlParser.rewriteSimilarTo("SELECT 1").isEmpty)
    assert(GraftSqlParser.rewriteSimilarTo(
      "SELECT similarity FROM t").isEmpty) // word prefix must not fire
    val r = spark.sql("SELECT 'don''t' SIMILAR TO 'don''t' AS r").head.getBoolean(0)
    assert(r)
  }

  test("scanner edges: subqueries with ORDER BY/LIMIT inside FROM survive") {
    events
    // the inner ORDER BY/LIMIT sit inside parens — the top-level
    // scanner must not mistake them for the outer query's tail
    val got = spark.sql(
      """SELECT DISTINCT ON (event_type) event_type, value
        |FROM (SELECT event_type, value FROM events ORDER BY value DESC LIMIT 100) t
        |ORDER BY event_type, value DESC""".stripMargin)
    val n = events.select("event_type").distinct().count()
    assert(got.count() <= n && got.count() > 0)
    // QUALIFY after a parenthesized subquery
    val q = spark.sql(
      """SELECT event_type, COUNT(*) AS n
        |FROM (SELECT * FROM events LIMIT 500) t
        |GROUP BY event_type
        |QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, event_type) = 1""".stripMargin)
    assert(q.count() == 1)
  }

  test("scanner edges: literals containing keywords inside the query") {
    events
    val got = spark.sql(
      """SELECT DISTINCT ON (event_type) event_type, 'order by limit from' AS s
        |FROM events ORDER BY event_type""".stripMargin)
    assert(got.head.getString(1) == "order by limit from")
    // class passthrough: [%] stays a literal percent inside the class
    val r2 = spark.sql("SELECT '5%' SIMILAR TO '_[%]' AS r").head.getBoolean(0)
    assert(r2)
  }
}
