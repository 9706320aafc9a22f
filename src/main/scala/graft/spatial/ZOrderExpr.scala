package graft.spatial

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve key for spatial file clustering: interleaves
  * the bits of the two normalized coordinates so records close on the
  * plane get close keys — feed it to [[graft.sources.Sink]]'s
  * `clusterBy` and bbox queries skip most parquet files via row-group
  * min/max stats (a 1-D sort on x alone cannot localize in y).
  * 21 bits per axis → 42-bit keys, the same resolution Delta/Iceberg
  * use for 2-column Z-ordering.
  */
object ZOrderKernels {
  /** Morton key of two coordinates normalized to [0,1] against the
    * given bounds (clamped outside). x owns the even bits. The bit
    * interleave itself is [[graft.functions.SketchKernels.zorder64]]
    * (the raw-integer variant, oracle-verified by sp08); 21-bit cells
    * are a subset of its 31-bit domain. */
  def zorder(x: Double, y: Double,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Long = {
    val scale = (1L << 21) - 1
    def cell(v: Double, lo: Double, hi: Double): Long = {
      val t = if (hi > lo) (v - lo) / (hi - lo) else 0.0
      (math.min(1.0, math.max(0.0, t)) * scale).toLong
    }
    graft.functions.SketchKernels.zorder64(cell(x, xmin, xmax), cell(y, ymin, ymax))
  }
}

/** `st_zorder(x, y)` → bigint over fixed world bounds given at
  * registration ([-180,180]×[-90,90] lon/lat by default). */
final case class ZOrderExpr(left: Expression, right: Expression,
    xmin: Double, ymin: Double, xmax: Double, ymax: Double)
    extends BinaryExpression {
  override def prettyName: String = "st_zorder"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernels.zorder(x.asInstanceOf[Double], y.asInstanceOf[Double],
      xmin, ymin, xmax, ymax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.spatial.ZOrderKernels.zorder($x, $y, $xmin, $ymin, $xmax, $ymax)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrderExpr {
  /** Register `st_zorder(x, y)` over the given bounds (idempotent for
    * the default registration). */
  def register(spark: SparkSession,
      xmin: Double = -180, ymin: Double = -90,
      xmax: Double = 180, ymax: Double = 90): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("st_zorder", {
      case Seq(x, y) => ZOrderExpr(x, y, xmin, ymin, xmax, ymax)
      case other => throw new IllegalArgumentException(
        s"st_zorder(x, y), got ${other.size} args")
    }, "built-in")
  }
}
