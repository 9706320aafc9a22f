package graft

import graft.queries.Relational

class RelationalSpec extends GraftSuite {

  for (q <- Relational.defs) {
    test(s"${q.name} executes at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q01 has 6 return/status groups") {
    assert(SparkEntry.queries("q01_pricing_summary")(spark, sf).count() == 6)
  }

  test("q16 preserves all 25 nations via left join") {
    assert(SparkEntry.queries("q16_nation_customers")(spark, sf).count() == 25)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
