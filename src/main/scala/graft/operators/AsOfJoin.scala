package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** AS-OF (point-in-time) join: for every left row, the single latest
  * right row with `right.ts <= left.ts` on the same key — the
  * time-series primitive behind feature lookups ("the price as of the
  * trade") and training-data joins ("the label as of the snapshot").
  *
  * Spark-first composition, no custom plan node needed: both sides are
  * tagged and UNIONed, then one window pass per key in event-time order
  * carries the most recent right ROW forward onto each left row. The
  * whole right payload travels as one struct, so a NULL inside the
  * matched row is preserved as that row's NULL — never papered over by
  * an older row's value. Exactly ONE shuffle on the key — same cost as
  * any per-key ordering — versus the range-join formulation whose
  * candidate pairs explode with density. Right rows at ts equal to a
  * left ts sort first, so the match is inclusive.
  *
  * `tolerance` (0 = unlimited) drops matches older than
  * `left.ts - tolerance`; its unit is MICROSECONDS when `ts` is a
  * timestamp column, else the ts column's own numeric unit.
  */
object AsOfJoin {

  /** Left as-of join on `key`/time columns named identically on both
    * sides; right payload columns must not collide with left's. */
  def leftAsOf(left: DataFrame, right: DataFrame,
      key: String, ts: String, tolerance: Long = 0L): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(rightPayload.nonEmpty, "right side needs at least one payload column")
    require(left.columns.toSet.intersect(rightPayload.toSet).isEmpty,
      s"right payload columns ${rightPayload.mkString(",")} collide with left")
    val leftPayload = left.columns.filterNot(c => c == key || c == ts).toSeq

    // numeric time for ordering/staleness: micros for timestamps,
    // the column's own unit otherwise
    def usOf(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case TimestampType => unix_micros(c)
        case _             => c.cast("long")
      }
    val lTsType = left.schema(ts).dataType
    val rTsType = right.schema(ts).dataType

    // the right payload travels as ONE struct (plus its ts), so the
    // carried match is a whole row, atomically
    val rStruct = struct(
      (rightPayload.map(col) :+ col(ts).as("__rts")): _*)
    val taggedRight = right.select(
      Seq(col(key), col(ts), lit(0).as("__tag"),
        rStruct.as("__r")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(ts), lit(1).as("__tag"),
        lit(null).cast(taggedRight.schema("__r").dataType).as("__r")) ++
        leftPayload.map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val fresh =
      if (tolerance <= 0) col("__m").isNotNull
      else col("__m").isNotNull &&
        usOf(col(ts), lTsType) - usOf(col("__m.__rts"), rTsType) <= tolerance

    carried.select(
      Seq(col(key), col(ts)) ++ leftPayload.map(col) ++
        rightPayload.map(c => when(fresh, col(s"__m.$c")).as(c)) ++
        Seq(when(fresh, col("__m.__rts")).as("matched_ts")): _*)
  }
}
