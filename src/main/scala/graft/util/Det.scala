package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic-aggregation helpers for the DuckDB oracle diff.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partition merge
  * order is not fixed run-to-run — so a plain `sum(double)` can differ
  * from the oracle in the last ulps and fail the driver's hash compare.
  * Fix: round each addend to a fixed decimal scale (exact in decimal),
  * sum exactly in decimal (associative ⇒ order-independent), then cast
  * the final value back to double. The oracle SQL mirrors the same cast
  * chain, so both engines produce bit-identical doubles.
  *
  * Scale 6 is enough for the fixtures: prices have 2 decimals, discount/
  * tax 2 each, so 3-way products carry ≤6 decimal digits.
  */
object Det {
  private val Dec = DecimalType(30, 6)

  /** Exact sum of a double expression; bit-deterministic double out. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Deterministic mean: exact decimal sum / count, divided in double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB-side mirror of [[dsum]]. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"

  /** DuckDB-side mirror of [[davg]]. */
  def sqlDavg(e: String): String =
    s"${sqlDsum(e)} / COUNT($e)"
}
