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
    // a ±2000-year window so the micros fit comfortably in a long
    val gen = for {
      sec <- Gen.chooseNum(-62135596800L, 64060588800L)
      micro <- Gen.chooseNum(0L, 999999L)
    } yield java.time.Instant.ofEpochSecond(sec, micro * 1000L)
    check(Prop.forAll(gen) { t: java.time.Instant =>
      val bytes = PgWire.encodeBinary(t,
        org.apache.spark.sql.types.TimestampType).get
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
