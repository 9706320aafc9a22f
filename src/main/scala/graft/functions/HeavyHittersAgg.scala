package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy hitters (typed Aggregator, SQL `heavy_hitters_k`)
  * — the frequent-items sketch beside the HLL (distinct count) and KMV
  * (bottom-k sample) families already registered: O(k) state, map-side
  * partial aggregation, mergeable with the summed-counters + k-th-
  * largest-subtraction rule (Agarwal et al., "Mergeable Summaries",
  * PODS 2012).
  *
  * Guarantees (any merge order, any partitioning): every item with
  * true frequency > N/(k+1) survives, and each surviving estimate is
  * within N/(k+1) below its true count. When k ≥ the number of
  * distinct items the sketch never decrements, so counts are EXACT —
  * which is how the t16 oracle query hash-verifies this aggregator
  * against plain GROUP BY counts.
  */
final class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: String): Map[String, Long] =
    if (in == null) buf
    else buf.get(in) match {
      case Some(c) => buf.updated(in, c + 1)
      case None if buf.size < k => buf.updated(in, 1L)
      case None => // decrement-all step: drop zeros, the arriving item is absorbed
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHittersAgg {
  /** Register `heavy_hitters_<k>(token)` (idempotent per k). */
  def register(spark: SparkSession, k: Int): String = {
    val name = s"heavy_hitters_$k"
    spark.udf.register(name, udaf(new HeavyHittersAgg(k),
      ExpressionEncoder[String]()))
    name
  }
}
