package graft

import graft.pg.Prepared

class PreparedSpec extends GraftSuite {

  test("$n placeholders bind positionally") {
    val df = Prepared.execute(spark,
      "SELECT $1 + $2 AS s, $1 AS again", Seq(40, 2))
    val r = df.head()
    assert(r.getInt(0) == 42 && r.getInt(1) == 40)
  }

  test("placeholders inside string literals are untouched") {
    assert(Prepared.rewrite("SELECT '$1', $1") == "SELECT '$1', :p1")
    val r = Prepared.execute(spark, "SELECT '$1' AS lit, $1 AS v", Seq(7)).head()
    assert(r.getString(0) == "$1" && r.getInt(1) == 7)
  }

  test("prepared filter over fixture table") {
    val df = Prepared.execute(spark,
      s"SELECT count(*) AS n FROM parquet.`$sf/customer.parquet` WHERE c_custkey < $$1",
      Seq(10))
    assert(df.head().getLong(0) == 10)
  }
}
