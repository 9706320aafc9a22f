package graft

import scala.sys.process._

import graft.server.PgServer

/** End-to-end interop with the REAL `psql` client (not the in-test
  * byte-level client): startup incl. SSLRequest decline, simple
  * protocol, server version exchange, multi-statement buffers, COPY
  * OUT, and COPY IN through \copy. */
class PsqlInteropSpec extends GraftSuite {

  private def psqlAvailable: Boolean =
    scala.util.Try(Seq("psql", "--version").!!).isSuccess

  private def withPsql(f: (Int, Seq[String] => String) => Unit): Unit = {
    assume(psqlAvailable, "psql not installed")
    val srv = new PgServer(spark, port = 0, password = None)
    val port = srv.start()
    def run(args: Seq[String]): String =
      (Seq("psql", "-h", "127.0.0.1", "-p", port.toString,
        "-U", "postgres", "-d", "postgres", "-X", "-At") ++ args).!!
    try f(port, run) finally srv.stop()
  }

  test("psql runs scalar, catalog, and multi-statement queries") {
    withPsql { (_, run) =>
      assert(run(Seq("-c", "SELECT 1 + 1")).trim == "2")
      assert(run(Seq("-c", "SELECT version()")).startsWith("PostgreSQL"))
      // catalog probe the way drivers do on connect
      assert(run(Seq("-c",
        "SELECT typname FROM pg_catalog.pg_type WHERE oid = 1043")).trim == "varchar")
      // one buffer, two statements -> two result sets
      val multi = run(Seq("-c", "SELECT 'a'; SELECT 'b'")).trim
      assert(multi.linesIterator.toSeq == Seq("a", "b"), multi)
    }
  }

  test("psql \\dt lists live tables and \\d describes columns") {
    withPsql { (_, run) =>
      spark.range(2).selectExpr(
        "id AS k", "cast(id AS string) AS v", "cast(id AS double) AS x")
        .createOrReplaceTempView("describe_probe")
      // a NEW connection snapshots the host's temp views at accept time
      val dt = run(Seq("-c", "\\dt"))
      assert(dt.linesIterator.exists(_.contains("describe_probe")), dt)
      val d = run(Seq("-c", "\\d describe_probe"))
      // psql -At renders the column block as name|type|... lines
      assert(d.contains("k|bigint"), d)
      assert(d.contains("v|character varying"), d)
      assert(d.contains("x|double precision"), d)
      spark.catalog.dropTempView("describe_probe")
    }
  }

  test("psql COPY TO STDOUT and \\copy FROM round-trip") {
    withPsql { (port, run) =>
      val out = run(Seq("-c",
        "COPY (SELECT id, concat('v', id) AS s FROM range(3) ORDER BY id) TO STDOUT"))
      assert(out == "0\tv0\n1\tv1\n2\tv2\n", out)

      run(Seq("-c", "DROP TABLE IF EXISTS psql_sink"))
      run(Seq("-c", "CREATE TABLE psql_sink (n BIGINT, s STRING)"))
      val copyCmd = Seq("psql", "-h", "127.0.0.1", "-p", port.toString,
        "-U", "postgres", "-d", "postgres", "-X",
        "-c", "\\copy psql_sink FROM STDIN")
      val input = new java.io.ByteArrayInputStream("7\tseven\n8\teight\n".getBytes("UTF-8"))
      val rc = (copyCmd #< input).!
      assert(rc == 0, s"\\copy exited $rc")
      val back = run(Seq("-c", "SELECT n, s FROM psql_sink ORDER BY n")).trim
      assert(back.linesIterator.toSeq == Seq("7|seven", "8|eight"), back)
      run(Seq("-c", "DROP TABLE IF EXISTS psql_sink"))
    }
  }
}
