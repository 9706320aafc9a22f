package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All relational state flows through here so every query reads the same
  * way: plain parquet scans that Catalyst can push filters/projections
  * into. Nothing is cached or collected — at 100 TB these are just
  * distributed scans.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** Register every fixture table as a session temp view (for queries
    * expressed as SQL text over the session). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** `events.ts` normalization — the fixture's physical type has varied
    * across driver regenerations, and every downstream query/spec is
    * written against session-UTC `TimestampType`:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read as
    *    raw long nanos (legacy conf) and convert with integer division —
    *    a double-rounded division would lose sub-microsecond precision
    *    on ~1.7e18 nano values.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): with NTZ inference
    *    Spark would read TIMESTAMP_NTZ, and any cast to TimestampType
    *    shifts by the SESSION zone — correct only under UTC sessions.
    *    Disabling `inferTimestampNTZ` restores the legacy read: the
    *    stored micros land verbatim as UTC-epoch `TimestampType`,
    *    matching DuckDB's naive read in every session zone.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // unreachable with inference off; kept as belt
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
