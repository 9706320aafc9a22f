package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the document-sketch hot loops
  * (MinHash signatures, SimHash fingerprints, sorted-set intersection).
  *
  * The higher-order-function formulations (`transform(sequence(0,63),
  * i -> array_min(transform(sh, ...)))`) evaluate lambdas through the
  * interpreter and materialize an intermediate array per permutation —
  * 64 allocations per document. These expressions generate a single
  * static call inside whole-stage codegen and compute all minima /
  * bit-counts in one tight pass, no intermediate allocation. At 100 TB
  * the sketch pass is pure per-row CPU (the narrowest, most scalable
  * stage shape) — constant-factor wins here multiply across the fleet.
  */
object SketchKernels {

  /** splitmix64 finalizer (public-domain mixing constants) — used to
    * derive the i-th "permutation" hash from one base hash, so each
    * shingle string is hashed exactly once upstream. */
  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Even-bit spread of the low 31 bits (Morton interleave half):
    * bit i of the input lands on bit 2i of the output. */
  @inline def spread31(v0: Long): Long = {
    var x = v0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Z-order (Morton) key of two coordinates in [0, 2^31): x on even
    * bits, y on odd — always non-negative, so BIGINT ordering is curve
    * ordering. */
  @inline def zorder64(x: Long, y: Long): Long =
    spread31(x) | (spread31(y) << 1)

  /** MinHash signature: per-permutation minima of mixed hashes, one
    * pass over the input, no intermediate arrays. */
  def minhashSig(hs: ArrayData, perms: Int): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val g = hs.getLong(j)
      var i = 0
      while (i < perms) {
        val h = mix(g + (i + 1) * 0x9e3779b97f4a7c15L)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash (Charikar 2002): 64-bit majority fingerprint over token
    * hashes. Bit i is set when at least half the inputs have bit i set
    * (ties round up, matching `ones * 2 >= n`); empty input → 0. */
  def simhash64(hs: ArrayData): Long = {
    val n = hs.numElements()
    if (n == 0) return 0L
    val cnt = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) cnt(i) += 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (cnt(i) * 2 >= n) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Strict left-fold dot product over two double arrays — the same
    * float-addition ORDER as `aggregate(zip_with(a, b, (x,y) -> x*y),
    * 0d, (acc,v) -> acc+v)` and DuckDB's sequential `list_sum`, so
    * results stay bit-identical to both while skipping the interpreted
    * lambda machinery and the zipped intermediate array. */
  def dotFold(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** |a ∩ b| for two ASCENDING-sorted long arrays via linear merge —
    * no per-call hash-set allocation (unlike `array_intersect`). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `minhash_sig(array<long>[, perms])` → `array<long>` of size perms. */
final case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    SketchKernels.minhashSig(v.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.minhashSig($c, $perms)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(array<long>)` → `bigint` majority fingerprint. */
final case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    SketchKernels.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `dot_fold(array<double>, array<double>)` → `double` strict
  * left-fold dot product (see [[SketchKernels.dotFold]]). */
final case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "dot_fold"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SketchKernels.dotFold(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.SketchKernels.dotFold($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `sorted_intersect_size(array<long>, array<long>)` → `int`.
  * Both inputs MUST be sorted ascending (e.g. via `array_sort`). */
final case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_size"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SketchKernels.sortedIntersectSize(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.SketchKernels.sortedIntersectSize($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `zorder64(x, y)` → `long` Morton-interleaved clustering key for
  * two integer coordinates in [0, 2^31). Sorting (or range-
  * partitioning) a write by this key co-locates rows that are close in
  * BOTH dimensions, so parquet row-group min/max stats stay tight on
  * each raw coordinate column and a 2-D range predicate prunes at the
  * row-group level — the multi-dimensional data-skipping layout
  * (Delta/Iceberg OPTIMIZE ZORDER) as a plain codegen'd expression.
  * For double coordinates over fixed geographic bounds use
  * `st_zorder` ([[graft.spatial.ZOrderExpr]]), which quantizes to
  * 21-bit cells then delegates to this kernel. */
final case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "zorder64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SketchKernels.zorder64(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.SketchKernels.zorder64($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SQL registration (idempotent), mirroring SpatialFunctions. */
object SketchFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(FunctionIdentifier("sorted_intersect_size"))) return
    reg.createOrReplaceTempFunction("minhash_sig", {
      case Seq(c)                               => MinHashSig(c, 64)
      case Seq(c, Literal(p: Int, IntegerType)) => MinHashSig(c, p)
      case other => throw new IllegalArgumentException(
        s"minhash_sig(arr[, perms-literal]), got ${other.size} args")
    }, "built-in")
    reg.createOrReplaceTempFunction("simhash64", {
      case Seq(c) => SimHash64(c)
      case other => throw new IllegalArgumentException(
        s"simhash64(arr), got ${other.size} args")
    }, "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_size", {
      case Seq(l, r) => SortedIntersectSize(l, r)
      case other => throw new IllegalArgumentException(
        s"sorted_intersect_size(a, b), got ${other.size} args")
    }, "built-in")
    reg.createOrReplaceTempFunction("dot_fold", {
      case Seq(l, r) => DotFold(l, r)
      case other => throw new IllegalArgumentException(
        s"dot_fold(a, b), got ${other.size} args")
    }, "built-in")
    reg.createOrReplaceTempFunction("zorder64", {
      // integral inputs of any width are welcome: widen to long here
      // (the analyzer resolves these casts; long→long folds away)
      case Seq(l, r) =>
        import org.apache.spark.sql.catalyst.expressions.Cast
        ZOrder64(Cast(l, LongType), Cast(r, LongType))
      case other => throw new IllegalArgumentException(
        s"zorder64(x, y), got ${other.size} args")
    }, "built-in")
  }
}
