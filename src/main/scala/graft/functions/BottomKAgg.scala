package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic bottom-k sampler (typed Aggregator, SQL `bottom_k`):
  * keeps the k smallest (hash, id) pairs per group — i.e. a KMV
  * (k-minimum-values) bottom-k sketch over a content hash. This is the
  * reproducible, content-addressed "sample k docs per language" a
  * training-data pipeline wants: same corpus → same sample on any
  * cluster, any partitioning (the window-function formulation shuffles
  * and sorts EVERY row; this aggregates with bounded O(k) state and
  * map-side partial aggregation — the scale-correct top-k shape).
  *
  * Ties (duplicate texts → equal hashes) break on the id, so the
  * result is total-ordered and oracle-comparable.
  */
final class BottomKAgg(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  override def zero: Seq[(String, Long)] = Vector.empty

  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    if (in._1 == null) buf
    else if (buf.size < k) (buf :+ in).sorted
    else if (implicitly[Ordering[(String, Long)]].lt(in, buf.last))
      (buf.init :+ in).sorted
    else buf

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    (a ++ b).sorted.take(k)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object BottomKAgg {
  /** Register `bottom_k_<k>(hash, id)` (idempotent per k). */
  def register(spark: SparkSession, k: Int): String = {
    val name = s"bottom_k_$k"
    spark.udf.register(name, udaf(new BottomKAgg(k),
      ExpressionEncoder[(String, Long)]()))
    name
  }
}
