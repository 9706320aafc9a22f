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

  test("empty binary array parameters keep their declared element type") {
    import graft.server.PgWire
    // PG empty-array wire form: ndims = 0, hasnull = 0, element oid
    def empty(elemOid: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(0).putInt(0).putInt(elemOid).array()
    }
    val int8 = Prepared.bindable(PgWire.decodeBinaryParam(1016, empty(20)))
    assert(int8.isInstanceOf[Array[java.lang.Long]],
      s"empty int8[] bound as ${int8.getClass}")
    val float8 = Prepared.bindable(PgWire.decodeBinaryParam(1022, empty(701)))
    assert(float8.isInstanceOf[Array[java.lang.Double]])
    // an empty int8[] must compare against a bigint-array expression
    // (an array<string> binding would fail analysis here)
    val r = Prepared.execute(spark,
      "SELECT array(CAST(1 AS BIGINT)) = $1 AS eq, size($1) AS n",
      Seq(PgWire.decodeBinaryParam(1016, empty(20)))).head()
    assert(!r.getBoolean(0) && r.getInt(1) == 0)
  }

  test("TIME binary decode accepts PG's 24:00:00 and rejects garbage") {
    import graft.server.PgWire
    def t(us: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(us).array()
    assert(PgWire.decodeBinaryParam(1083, t(86400000000L)) == "24:00:00")
    assert(PgWire.decodeBinaryParam(1083, t(0L)) == java.time.LocalTime.MIDNIGHT)
    val ex = intercept[IllegalArgumentException] {
      PgWire.decodeBinaryParam(1083, t(86400000001L))
    }
    assert(ex.getMessage.contains("out of range"))
  }

  test("NUMERIC binary codec round-trips through encode and decode") {
    import graft.server.PgWire
    import org.apache.spark.sql.types.DecimalType
    // edge shapes: negatives, zero, sub-1 scales, >1 digit-group
    // magnitudes, trailing zeros, the base-10000 group boundaries
    val values = Seq("0", "1", "-1", "0.001", "-0.001", "123.45",
      "-123.45", "9999", "10000", "10000.0001", "123456789.123456789",
      "-99999999.99", "0.5000", "42000000000", "3.14159265358979")
    for (s <- values) {
      val v = new java.math.BigDecimal(s)
      val bytes = PgWire.encodeBinary(v, DecimalType(38, 18)).get
      val back = PgWire.decodeBinaryParam(1700, bytes)
        .asInstanceOf[java.math.BigDecimal]
      assert(back.compareTo(v) == 0, s"$s round-tripped to $back")
    }
  }

  test("INTERVAL binary decode maps each shape to its Spark type") {
    import graft.server.PgWire
    def iv(micros: Long, days: Int, months: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putLong(micros).putInt(days).putInt(months).array()
    }
    assert(PgWire.decodeBinaryParam(1186, iv(90L * 60 * 1000000, 0, 0)) ==
      java.time.Duration.ofMinutes(90))
    assert(PgWire.decodeBinaryParam(1186, iv(0, 0, 14)) ==
      java.time.Period.ofMonths(14))
    val mixed = PgWire.decodeBinaryParam(1186, iv(3600000000L, 2, 1))
      .asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
    assert(mixed.months == 1 && mixed.days == 2 &&
      mixed.microseconds == 3600000000L)
    // negative day-time interval (PG emits these for '-90 minutes')
    assert(PgWire.decodeBinaryParam(1186, iv(-90L * 60 * 1000000, 0, 0)) ==
      java.time.Duration.ofMinutes(-90))
  }
}
