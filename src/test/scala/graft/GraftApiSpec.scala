package graft

/** The one-call public API: a session wired by Graft.install answers
  * spatial SQL, sketch functions, pg_catalog, and compat scalars. */
class GraftApiSpec extends GraftSuite {

  test("install wires functions, catalogs, and compat surface") {
    Graft.install(spark)
    assert(spark.sql("SELECT st_area(st_makeenvelope(0d, 0d, 2d, 3d))")
      .head().getDouble(0) == 6.0)
    assert(spark.sql("SELECT sorted_intersect_size(array(1L,2L,3L), array(2L,3L,9L))")
      .head().getInt(0) == 2)
    assert(spark.sql("SELECT count(*) FROM pg_catalog.pg_type").head().getLong(0) == 29)
    assert(spark.sql("SELECT version()").head().getString(0).startsWith("PostgreSQL"))
    assert(spark.sql("SELECT count(*) FROM information_schema.schemata")
      .head().getLong(0) >= 1)
  }
}
