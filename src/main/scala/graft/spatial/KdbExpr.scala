package graft.spatial

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for KDB-tree cell assignment (the grid
  * spatial join's explode stage). The previous ScalaUDF form broke
  * whole-stage codegen right where the per-row fan-out happens; these
  * expressions generate a static kernel call with the (tiny,
  * driver-built) tree attached as a codegen reference object, so the
  * explode stage keeps the same fused pipeline as the uniform
  * arithmetic scheme. (VERDICT r2 item 7.)
  */
object KdbKernels {
  def assign(tree: KdbTree, x0: Double, y0: Double, x1: Double, y1: Double): ArrayData =
    new GenericArrayData(tree.assign(x0, y0, x1, y1).toArray)
  def locate(tree: KdbTree, x: Double, y: Double): Int = tree.locate(x, y)
}

/** `<fn>(x0, y0, x1, y1)` → array<int> of leaf ids overlapping the box. */
final case class KdbAssignExpr(tree: KdbTree,
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def prettyName: String = "kdb_assign"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    KdbKernels.assign(tree, a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kdbTree", tree, classOf[KdbTree].getName)
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.spatial.KdbKernels.assign($ref, $a, $b, $c, $d)")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** `<fn>(x, y)` → int leaf id containing the point. */
final case class KdbLocateExpr(tree: KdbTree, left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "kdb_locate"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    KdbKernels.locate(tree, l.asInstanceOf[Double], r.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kdbTree", tree, classOf[KdbTree].getName)
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.spatial.KdbKernels.locate($ref, $l, $r)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object KdbExpr {
  private val counter = new AtomicLong(0)

  /** Register `kdb_assign_<n>` / `kdb_locate_<n>` temp functions bound
    * to this tree (unique names: concurrent grid joins in one session
    * must not clobber each other's trees mid-analysis). Returns the two
    * function names. */
  def register(spark: SparkSession, tree: KdbTree): (String, String) = {
    val n = counter.incrementAndGet()
    val assignName = s"kdb_assign_$n"
    val locateName = s"kdb_locate_$n"
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(assignName, {
      case Seq(a, b, c, d) => KdbAssignExpr(tree, a, b, c, d)
      case other => throw new IllegalArgumentException(
        s"$assignName(x0, y0, x1, y1), got ${other.size} args")
    }, "built-in")
    reg.createOrReplaceTempFunction(locateName, {
      case Seq(l, r) => KdbLocateExpr(tree, l, r)
      case other => throw new IllegalArgumentException(
        s"$locateName(x, y), got ${other.size} args")
    }, "built-in")
    (assignName, locateName)
  }
}
