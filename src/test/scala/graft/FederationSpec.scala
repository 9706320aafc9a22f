package graft

import java.sql.DriverManager

class FederationSpec extends GraftSuite {

  test("jdbc_scan mounts an external database end-to-end (Derby)") {
    // seed an embedded Derby database through plain JDBC
    val conn = DriverManager.getConnection("jdbc:derby:memory:feddb;create=true")
    val st = conn.createStatement()
    st.execute("CREATE TABLE T1 (ID INT, NAME VARCHAR(20))")
    st.execute("INSERT INTO T1 VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')")
    st.close(); conn.close()

    val df = spark.sql(
      "SELECT * FROM jdbc_scan('jdbc:derby:memory:feddb', " +
        "'org.apache.derby.iapi.jdbc.AutoloadedDriver', 'T1') WHERE ID > 1 ORDER BY ID")
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((2, "beta"), (3, "gamma")))
    // filter pushdown reaches the JDBC source
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") || physical.contains("Filter"),
      s"expected pushdown markers in:\n$physical")
  }

  test("named scans resolve, plan, and name the missing driver") {
    for ((fn, driver) <- Seq(
        ("postgres_scan('postgres://h:5432', 'db', 't')", "postgresql"),
        ("mysql_scan('mysql://h:3306', 'db', 't')", "mysql"),
        ("duckdb_scan('/tmp/x.db', 'db', 't')", "duckdb"),
        ("sqlite_scan('/tmp/x.db', '', 't')", "sqlite"))) {
      val e = intercept[Exception](spark.sql(s"SELECT * FROM $fn").collect())
      val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")).toLowerCase
      assert(msg.contains("driver") || msg.contains(driver) || msg.contains("class"),
        s"$fn: unexpected failure: $msg")
    }
  }
}
