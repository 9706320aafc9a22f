package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join: for every left row, the single latest
  * right row with `right.ts <= left.ts` on the same key — the
  * time-series primitive behind feature lookups ("the price as of the
  * trade") and training-data joins ("the label as of the snapshot").
  *
  * Spark-first composition, no custom plan node needed: both sides are
  * tagged and UNIONed, then one window pass per key in event-time order
  * carries the most recent right-row values forward onto each left row
  * (`last(_, ignoreNulls)` over an unbounded-preceding frame). Exactly
  * ONE shuffle on the key — same cost as any per-key ordering — versus
  * the range-join formulation whose candidate pairs explode with
  * density. Right rows at ts equal to a left ts sort first, so the
  * match is inclusive.
  *
  * `tolerance` (microseconds, 0 = unlimited) drops matches older than
  * `left.ts - tolerance`, the standard staleness bound.
  */
object AsOfJoin {

  /** Left as-of join on `key`/time columns named identically on both
    * sides; right payload columns must not collide with left's. Time
    * values are compared as-is (use epoch micros or timestamps
    * consistently on both sides). */
  def leftAsOf(left: DataFrame, right: DataFrame,
      key: String, ts: String, tolerance: Long = 0L): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(rightPayload.nonEmpty, "right side needs at least one payload column")
    require(left.columns.toSet.intersect(rightPayload.toSet).isEmpty,
      s"right payload columns ${rightPayload.mkString(",")} collide with left")

    val leftPayload = left.columns.filterNot(c => c == key || c == ts).toSeq
    // tag 0 = right (sorts before left at equal ts → inclusive match)
    val taggedRight = right.select(
      Seq(col(key), col(ts), lit(0).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col) ++
        Seq(col(ts).as("__rts")): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(ts), lit(1).as("__tag")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        Seq(lit(null).cast(right.schema(ts).dataType).as("__rts")): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .select(col("*") +:
        (rightPayload :+ "__rts").map(c =>
          last(col(c), ignoreNulls = true).over(w).as(s"__c_$c")): _*)
      .filter(col("__tag") === 1)

    val bounded =
      if (tolerance <= 0) carried
      else carried.withColumn("__stale",
        col("__c___rts").isNull || col(ts).cast("long") - col("__c___rts").cast("long") > tolerance)

    val out = bounded.select(
      Seq(col(key), col(ts)) ++ leftPayload.map(col) ++
        rightPayload.map { c =>
          val v = col(s"__c_$c")
          if (tolerance <= 0) v.as(c)
          else when(col("__stale"), lit(null)).otherwise(v).as(c)
        } ++
        Seq((if (tolerance <= 0) col("__c___rts")
             else when(col("__stale"), lit(null)).otherwise(col("__c___rts"))).as("matched_ts")): _*)
    out
  }
}
