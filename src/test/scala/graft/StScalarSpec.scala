package graft

import org.apache.spark.sql.functions.expr

/** The round-9 scalar-accessor lift: st_area/st_length/st_x/... and
  * st_distance register as native Catalyst expressions (StScalarExpr /
  * StDistanceExpr) instead of ScalaUDFs. These tests pin the plan shape
  * (no ScalaUDF barrier) and the per-function NULL semantics the lift
  * must preserve (PostGIS behavior, covered value-wise by the slt
  * battery; pinned here against the codegen path specifically).
  */
class StScalarSpec extends GraftSuite {
  graft.spatial.SpatialFunctions.registerAll(spark)

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS r").collect()(0).get(0)

  test("scalar accessors and st_distance plan as native expressions, not ScalaUDFs") {
    val df = spark.range(4).selectExpr(
      "st_makepoint(cast(id as double), 1.0d) AS g",
      "st_makepoint(0.0d, 0.0d) AS o")
      .selectExpr("st_area(g) AS a", "st_x(g) AS x", "st_srid(g) AS s",
        "st_distance(g, o) AS d")
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("st_area#") || !analyzed.contains("ScalaUDF"),
      s"accessor still a ScalaUDF:\n$analyzed")
    assert(analyzed.contains("st_area") && analyzed.contains("st_distance"))
    val exprs = df.queryExecution.analyzed.expressions.flatMap(_.collect {
      case e: graft.spatial.StScalarExpr   => e.name
      case _: graft.spatial.StDistanceExpr => "st_distance"
    })
    assert(exprs.toSet == Set("st_area", "st_x", "st_srid", "st_distance"),
      s"native nodes seen: $exprs")
  }

  test("null semantics survive the codegen path") {
    // st_x/st_y of a non-point: NULL
    assert(one("st_x(st_geomfromtext('LINESTRING(0 0, 1 1)'))") == null)
    assert(one("st_y(st_geomfromtext('POLYGON((0 0,1 0,1 1,0 0))'))") == null)
    // envelope bounds of an empty geometry: NULL
    assert(one("st_xmin(st_geomfromtext('POLYGON EMPTY'))") == null)
    assert(one("st_ymax(st_geomfromtext('GEOMETRYCOLLECTION EMPTY'))") == null)
    // NULL input propagates (nullIntolerant)
    assert(one("st_area(CAST(NULL AS BINARY))") == null)
    assert(one("st_distance(CAST(NULL AS BINARY), st_makepoint(0d, 0d))") == null)
    // non-null happy paths through the same generated code
    assert(one("st_area(st_makeenvelope(0d, 0d, 2d, 3d))") == 6.0)
    assert(one("st_distance(st_makepoint(0d, 0d), st_makepoint(3d, 4d))") == 5.0)
    assert(one("st_isempty(st_geomfromtext('POLYGON EMPTY'))") == true)
    assert(one("st_npoints(st_geomfromtext('LINESTRING(0 0, 1 1, 2 2)'))") == 3)
    assert(one("st_srid(st_setsrid(st_makepoint(1d, 2d), 4326))") == 4326)
  }

  test("accessor filters stay inside one whole-stage-codegen span") {
    val df = spark.range(64).selectExpr(
      "st_buffer(st_makepoint(cast(id as double), 0d), 0.5) AS g")
      .where(expr("st_area(g) > 0.5")).selectExpr("st_length(g) AS l")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // filter AND project land in the SAME codegen span (formatted mode
    // prints a shared "[codegen id : N]" per fused stage); a ScalaUDF
    // accessor would have interpreted the expression inside the stage
    val ids = "\\[codegen id : (\\d+)\\]".r
      .findAllMatchIn(formatted).map(_.group(1)).toSet
    assert(ids == Set("1"), s"expected one fused span, got ids=$ids\n$formatted")
    assert(df.count() == 64)
  }
}
