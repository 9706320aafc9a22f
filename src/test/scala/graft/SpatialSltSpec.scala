package graft

import graft.spatial.SpatialFunctions

/** Acceptance suite: the reference's entire spatial scalar corpus
  * (574-line spatial_udf.slt, 93 queries) must pass against our ST_*
  * registry.
  */
class SpatialSltSpec extends GraftSuite {

  test("spatial_udf.slt corpus passes") {
    SpatialFunctions.registerAll(spark)
    val failures = SltRunner.run(spark, "/spatial_udf.slt")
    if (failures.nonEmpty) {
      val msg = failures.take(25).map { f =>
        s"""line ${f.c.line}: ${f.c.sql}
           |  expected: ${f.c.expected.mkString(" | ")}
           |  got:      ${f.error.getOrElse(f.got.mkString(" | "))}""".stripMargin
      }.mkString("\n")
      fail(s"${failures.size}/93 slt queries failed:\n$msg")
    }
  }
}
