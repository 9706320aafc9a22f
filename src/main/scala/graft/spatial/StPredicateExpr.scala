package graft.spatial

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native Catalyst expression for the binary `ST_*` predicates — the
  * hot path of spatial filters and join conditions. Unlike a ScalaUDF
  * (an interpretation barrier that splits whole-stage codegen), this
  * generates a direct static call inside the fused stage, with an
  * envelope short-circuit before exact refinement (the reference's
  * two-phase filter+refine, spatial_index.rs:106-116).
  */
final case class StPredicateExpr(name: String, left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = name
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    GeoOps.eval(name, l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"""graft.spatial.GeoOps.eval("$name", $l, $r)""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static (codegen-callable) geometry predicate kernel. */
object GeoOps {

  /** exact predicate with envelope pre-check for the interior cases */
  def eval(name: String, lw: Array[Byte], rw: Array[Byte]): Boolean = {
    val a = Geo.fromWkb(lw)
    val b = Geo.fromWkb(rw)
    name match {
      case "st_intersects" =>
        a.getEnvelopeInternal.intersects(b.getEnvelopeInternal) && a.intersects(b)
      case "st_contains" =>
        a.getEnvelopeInternal.covers(b.getEnvelopeInternal) && a.contains(b)
      case "st_within" =>
        b.getEnvelopeInternal.covers(a.getEnvelopeInternal) && a.within(b)
      case "st_covers" =>
        a.getEnvelopeInternal.covers(b.getEnvelopeInternal) && a.covers(b)
      case "st_coveredby" =>
        b.getEnvelopeInternal.covers(a.getEnvelopeInternal) && a.coveredBy(b)
      case "st_touches"  => a.touches(b)
      case "st_crosses"  => a.crosses(b)
      case "st_overlaps" => a.overlaps(b)
      case "st_equals"   => a.equalsTopo(b)
      case "st_bbox_intersects" =>
        a.getEnvelopeInternal.intersects(b.getEnvelopeInternal)
      case other => throw new IllegalArgumentException(s"unknown predicate $other")
    }
  }
}
