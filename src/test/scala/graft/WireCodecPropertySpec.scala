package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.server.PgWire

/** Property-based round-trips for the PG wire binary codecs: for every
  * type with both an encode (result) and a decode (bound-parameter)
  * path, decoding what we encode must recover the value exactly on
  * RANDOM inputs — the fixed-vector tests in PreparedSpec pin the
  * known edge shapes; these pin the whole domain.
  */
class WireCodecPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("NUMERIC binary: random BigDecimals round-trip exactly") {
    val gen = for {
      unscaled <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
      big <- Gen.chooseNum(0L, Long.MaxValue) // extend past 64 bits
      scale <- Gen.chooseNum(-8, 30)          // incl. negative scales
    } yield new java.math.BigDecimal(
      java.math.BigInteger.valueOf(unscaled)
        .multiply(java.math.BigInteger.valueOf(big | 1L)), scale)
    check(Prop.forAll(gen) { v: java.math.BigDecimal =>
      val bytes = PgWire.encodeBinary(v,
        org.apache.spark.sql.types.DecimalType(38, 18)).get
      val back = PgWire.decodeBinaryParam(1700, bytes)
        .asInstanceOf[java.math.BigDecimal]
      back.compareTo(v) == 0
    })
  }

  test("TIMESTAMPTZ binary: random instants round-trip to the microsecond") {
    // PG binary timestamps are micros since 2000-01-01; stay within
    // a ±2000-year window so the micros fit comfortably in a long.
    // The encode side emits WALL micros in the given zone and the 1184
    // decode reads UTC-instant micros — they agree only when the wall
    // zone IS UTC, so pin it (the non-UTC cross-shape agreement has its
    // own Tokyo-pinned test below).
    val gen = for {
      sec <- Gen.chooseNum(-62135596800L, 64060588800L)
      micro <- Gen.chooseNum(0L, 999999L)
    } yield java.time.Instant.ofEpochSecond(sec, micro * 1000L)
    val utc = java.time.ZoneOffset.UTC
    check(Prop.forAll(gen) { t: java.time.Instant =>
      val bytes = PgWire.encodeBinary(t,
        org.apache.spark.sql.types.TimestampType, utc).get
      PgWire.decodeBinaryParam(1184, bytes) == t
    })
  }

  test("DATE binary: random local dates round-trip exactly") {
    val gen = Gen.chooseNum(-719162L, 2932896L) // year 1..9999 epoch days
      .map(java.time.LocalDate.ofEpochDay)
    check(Prop.forAll(gen) { d: java.time.LocalDate =>
      val bytes = PgWire.encodeBinary(d,
        org.apache.spark.sql.types.DateType).get
      PgWire.decodeBinaryParam(1082, bytes) == d
    })
  }

  test("TIME binary: random times round-trip to the microsecond") {
    val gen = Gen.chooseNum(0L, 86399999999L) // micros within a day
      .map(us => java.time.LocalTime.ofNanoOfDay(us * 1000L))
    check(Prop.forAll(gen) { t: java.time.LocalTime =>
      val bytes = PgWire.encodeBinary(t,
        org.apache.spark.sql.types.TimeType(6)).get
      PgWire.decodeBinaryParam(1083, bytes) == t
    })
  }

  test("TIMESTAMP (NTZ) binary: random local datetimes round-trip") {
    val gen = for {
      sec <- Gen.chooseNum(-62135596800L, 64060588800L)
      micro <- Gen.chooseNum(0L, 999999L)
    } yield java.time.LocalDateTime.ofEpochSecond(sec,
      micro.toInt * 1000, java.time.ZoneOffset.UTC)
    check(Prop.forAll(gen) { t: java.time.LocalDateTime =>
      val bytes = PgWire.encodeBinary(t,
        org.apache.spark.sql.types.TimestampNTZType).get
      PgWire.decodeBinaryParam(1114, bytes) == t
    })
  }

  test("oid 1114: Timestamp and Instant agree, text and binary agree, under a non-UTC zone") {
    // TimestampType surfaces as java.sql.Timestamp by default and as
    // java.time.Instant under java8API — one column, two JVM shapes.
    // Both ENCODE rules must match each other AND their own text path
    // (default-zone wall time), or the same query would wire different
    // values depending on a session conf / result format.
    val prevTz = java.util.TimeZone.getDefault
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Asia/Tokyo"))
    try {
      val tsType = org.apache.spark.sql.types.TimestampType
      val gen = Gen.chooseNum(-2000000000L, 4000000000L) // ±~63y of epoch secs
        .map(s => java.time.Instant.ofEpochSecond(s, 123456000L))
      check(Prop.forAll(gen) { inst: java.time.Instant =>
        val asTs = java.sql.Timestamp.from(inst)
        val binTs = PgWire.encodeBinary(asTs, tsType).get
        val binInst = PgWire.encodeBinary(inst, tsType).get
        val txtTs = PgWire.encodeValue(asTs).get
        val txtInst = PgWire.encodeValue(inst).get
        // binary forms identical across JVM shapes; text forms too
        java.util.Arrays.equals(binTs, binInst) && txtTs == txtInst &&
          // and binary decodes to the wall time the text path printed
          PgWire.decodeBinaryParam(1114, binTs)
            .asInstanceOf[java.time.LocalDateTime] ==
            java.time.LocalDateTime.parse(txtTs.replace(' ', 'T'))
      }, n = 200)
    } finally java.util.TimeZone.setDefault(prevTz)
  }

  test("zoneOf accepts Spark-legal SHORT_IDS zone aliases") {
    // Spark validates spark.sql.session.timeZone with
    // ZoneId.of(id, ZoneId.SHORT_IDS), so EST/PST/CST are LEGAL session
    // zones; a plain ZoneId.of throws on them — which would kill every
    // wire query after SET spark.sql.session.timeZone=EST (round-12
    // review finding)
    for (id <- Seq("EST", "PST", "CST", "HST", "UTC", "America/Chicago",
      "+05:30"))
      PgWire.zoneOf(id) // must not throw
    assert(PgWire.zoneOf("EST").getRules
      .getOffset(java.time.Instant.EPOCH).getTotalSeconds == -5 * 3600)
  }

  test("pre-Gregorian timestamps render the hybrid-calendar wall, any zone") {
    // Spark's non-java8API collect() rebases proleptic micros into the
    // hybrid Julian/Gregorian calendar when building java.sql.Timestamp
    // — deriving the wall via t.toInstant would shift pre-1582 values
    // by the 10-day Julian-Gregorian delta (round-12 review finding).
    // timestampWall must recover the hybrid wall in the JVM default
    // zone and re-zone it proleptically.
    val prevTz = java.util.TimeZone.getDefault
    try {
      for (defTz <- Seq("UTC", "Asia/Tokyo")) {
        java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone(defTz))
        // hybrid wall in the CURRENT default zone, like Spark's encoder
        val t = java.sql.Timestamp.valueOf("1500-01-01 00:00:00")
        val wallSame = PgWire.timestampWall(t, java.time.ZoneId.of(defTz))
        assert(wallSame == java.time.LocalDateTime.of(1500, 1, 1, 0, 0),
          s"default=$defTz same-zone wall: $wallSame")
        // the instant-derived wall would be 1500-01-10 — day must stay 1
        assert(PgWire.encodeValue(t,
          java.time.ZoneId.of(defTz)).get.startsWith("1500-01-01"),
          s"default=$defTz text render")
      }
    } finally java.util.TimeZone.setDefault(prevTz)
  }

  test("INTERVAL binary: Duration and Period ENCODE to the 16-byte layout and round-trip") {
    val durGen = for {
      sec <- Gen.chooseNum(-3153600000L, 3153600000L)
      micro <- Gen.chooseNum(0L, 999999L)
    } yield java.time.Duration.ofSeconds(sec, micro * 1000L)
    check(Prop.forAll(durGen) { d: java.time.Duration =>
      val bytes = PgWire.encodeBinary(d,
        org.apache.spark.sql.types.DayTimeIntervalType()).get
      bytes.length == 16 && PgWire.decodeBinaryParam(1186, bytes) == d
    })
    val perGen = for {
      y <- Gen.chooseNum(-999, 999)
      m <- Gen.chooseNum(-11, 11)
    } yield java.time.Period.of(y, m, 0)
    check(Prop.forAll(perGen) { p: java.time.Period =>
      (p.getYears == 0 && p.getMonths == 0) || {
        val bytes = PgWire.encodeBinary(p,
          org.apache.spark.sql.types.YearMonthIntervalType()).get
        // decode normalizes to total months (value-equal, not shape-equal)
        PgWire.decodeBinaryParam(1186, bytes) ==
          java.time.Period.ofMonths(p.getYears * 12 + p.getMonths)
      }
    })
  }

  test("ARRAY binary: random int8/float8/varchar arrays with nulls round-trip") {
    import org.apache.spark.sql.types._
    def arrProp[T](elemGen: Gen[T], dt: DataType, oid: Int): Prop = {
      val gen = Gen.listOf(Gen.oneOf(elemGen.map(Some(_)), Gen.const(None)))
      Prop.forAll(gen) { xs: List[Option[T]] =>
        val v: Seq[Any] = xs.map(_.getOrElse(null).asInstanceOf[Any])
        val dtArr = ArrayType(dt)
        assert(PgWire.binaryCapable(dtArr) && PgWire.pgOid(dtArr) == oid)
        val bytes = PgWire.encodeBinary(v, dtArr).get
        // empty arrays decode to a TYPED empty Array (the element class
        // must survive into the bound literal); non-empty decode to Seq
        PgWire.decodeBinaryParam(oid, bytes) match {
          case a: Array[_] => a.isEmpty && v.isEmpty
          case s           => s == v
        }
      }
    }
    check(arrProp(Gen.chooseNum(Long.MinValue, Long.MaxValue), LongType, 1016))
    check(arrProp(Gen.chooseNum(-1e18, 1e18), DoubleType, 1022))
    check(arrProp(Gen.asciiPrintableStr, StringType, 1015))
    check(arrProp(Gen.chooseNum(Int.MinValue, Int.MaxValue), IntegerType, 1007))
    // empty arrays use the ndims = 0 shape and keep the element class
    val emptyBack = PgWire.decodeBinaryParam(1007,
      PgWire.encodeBinary(Seq.empty[Any], ArrayType(IntegerType)).get)
    assert(emptyBack.isInstanceOf[Array[java.lang.Integer]] &&
      emptyBack.asInstanceOf[Array[java.lang.Integer]].isEmpty)
  }

  test("every binary-capable oid in pgOid round-trips a representative value") {
    import org.apache.spark.sql.types._
    // (type, value, expected decoded form) — decode returns the
    // java.time flavor, so expectations are stated in that flavor
    val reps: Seq[(DataType, Any, Any, Int)] = Seq(
      (BooleanType, true, true, 16),
      (ByteType, 7.toByte, 7.toByte, 18),
      (ShortType, 321.toShort, 321.toShort, 21),
      (IntegerType, -12345, -12345, 23),
      (LongType, 987654321012L, 987654321012L, 20),
      (FloatType, 1.5f, 1.5f, 700),
      (DoubleType, math.Pi, math.Pi, 701),
      (StringType, "héllo", "héllo", 1043),
      (DateType, java.time.LocalDate.of(2026, 8, 14),
        java.time.LocalDate.of(2026, 8, 14), 1082),
      (TimestampNTZType,
        java.time.LocalDateTime.of(2026, 8, 14, 12, 30, 15, 123456000),
        java.time.LocalDateTime.of(2026, 8, 14, 12, 30, 15, 123456000), 1114),
      (TimeType(6), java.time.LocalTime.of(23, 59, 59, 999999000),
        java.time.LocalTime.of(23, 59, 59, 999999000), 1083),
      (DecimalType(20, 4), new java.math.BigDecimal("-1234567.8901"),
        new java.math.BigDecimal("-1234567.8901"), 1700),
      (DayTimeIntervalType(), java.time.Duration.ofSeconds(3661, 5000),
        java.time.Duration.ofSeconds(3661, 5000), 1186),
      (YearMonthIntervalType(), java.time.Period.of(2, 3, 0),
        java.time.Period.ofMonths(27), 1186),
      (ArrayType(LongType), Seq(1L, null, 3L), Seq(1L, null, 3L), 1016))
    for ((dt, v, want, oid) <- reps) {
      assert(PgWire.binaryCapable(dt), s"$dt must be binary-capable")
      assert(PgWire.pgOid(dt) == oid, s"$dt -> oid ${PgWire.pgOid(dt)}, want $oid")
      val bytes = PgWire.encodeBinary(v, dt).get
      val back = PgWire.decodeBinaryParam(oid, bytes)
      assert(back == want ||
        (back.isInstanceOf[java.math.BigDecimal] &&
          back.asInstanceOf[java.math.BigDecimal]
            .compareTo(want.asInstanceOf[java.math.BigDecimal]) == 0),
        s"$dt: $v -> $back, want $want")
    }
    // bytea stays raw in both directions
    val raw = Array[Byte](1, 2, 3)
    assert(PgWire.encodeBinary(raw, BinaryType).get.toSeq == raw.toSeq)
    assert(PgWire.decodeBinaryParam(17, raw).asInstanceOf[Array[Byte]].toSeq == raw.toSeq)
  }

  test("INTERVAL binary: every (micros, days, months) decodes to the value-equal shape") {
    val gen = for {
      micros <- Gen.chooseNum(-3153600000000000L, 3153600000000000L)
      days <- Gen.chooseNum(-100000, 100000)
      months <- Gen.chooseNum(-12000, 12000)
    } yield (micros, days, months)
    check(Prop.forAll(gen) { case (micros: Long, days: Int, months: Int) =>
      val b = java.nio.ByteBuffer.allocate(16)
      b.putLong(micros).putInt(days).putInt(months)
      PgWire.decodeBinaryParam(1186, b.array()) match {
        case d: java.time.Duration =>
          months == 0 && days == 0 &&
            d == java.time.Duration.of(micros, java.time.temporal.ChronoUnit.MICROS)
        case p: java.time.Period =>
          micros == 0 && days == 0 && p == java.time.Period.ofMonths(months)
        case c: org.apache.spark.unsafe.types.CalendarInterval =>
          c.months == months && c.days == days && c.microseconds == micros
        case _ => false
      }
    })
  }
}
