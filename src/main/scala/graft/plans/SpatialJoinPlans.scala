package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

import org.locationtech.jts.geom.{Envelope, Geometry => JtsGeometry}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree

import graft.spatial.Geo

/** Spatial join planning — the Spark-native re-expression of the
  * reference's SpatialJoinExec subsystem (/root/reference/src/
  * datafusion-extra/spatial/src/join, ~7.5k LoC of out-of-core
  * R-tree machinery). Here the optimizer-integrated path is a planner
  * Strategy that recognizes `JOIN ON ST_xxx(l.geom, r.geom)` conditions
  * (the reference's optimizer.rs:33-115 rule) and emits a broadcast
  * R-tree index join (exec.rs / stream.rs); the partitioned scale path
  * lives in [[graft.operators.SpatialJoin]] as a grid-partitioned
  * DataFrame composition that Spark's shuffle executes natively.
  */
object SpatialJoinPlans {

  /** Join-condition predicate forms (spatial_predicate.rs:10-66). */
  sealed trait SpatialPredicate extends Serializable {
    /** exact refinement on (probe, build) geometries */
    def refine(probe: JtsGeometry, build: JtsGeometry): Boolean
    /** refinement against a PREPARED build geometry (cached interior/
      * edge structures, JTS prep package) — None when the predicate has
      * no prepared form (then the plain path is always used). The
      * reference's refinement backends expose the same split
      * (spatial_join.spatial_library + speculative mode, option.rs:40-49). */
    def refinePrepared(prep: PreparedGeometry, probe: JtsGeometry): Option[Boolean]
    /** envelope expansion around the probe for index lookup */
    def expand: Double
  }
  final case class Relation(name: String) extends SpatialPredicate {
    def refine(p: JtsGeometry, b: JtsGeometry): Boolean = name match {
      case "st_intersects"      => p.intersects(b)
      case "st_contains"        => p.contains(b)
      case "st_within"          => p.within(b)
      case "st_covers"          => p.covers(b)
      case "st_coveredby"       => p.coveredBy(b)
      case "st_touches"         => p.touches(b)
      case "st_crosses"         => p.crosses(b)
      case "st_overlaps"        => p.overlaps(b)
      case "st_equals"          => p.equalsTopo(b)
      case "st_bbox_intersects" => p.getEnvelopeInternal.intersects(b.getEnvelopeInternal)
    }
    // prepared geometry is the BUILD side: each probe-vs-build relation
    // maps to its converse evaluated on the prepared build
    def refinePrepared(prep: PreparedGeometry, p: JtsGeometry): Option[Boolean] = name match {
      case "st_intersects" => Some(prep.intersects(p))
      case "st_contains"   => Some(prep.within(p))      // probe contains build
      case "st_within"     => Some(prep.contains(p))    // probe within build
      case "st_covers"     => Some(prep.coveredBy(p))
      case "st_coveredby"  => Some(prep.covers(p))
      case "st_touches"    => Some(prep.touches(p))     // symmetric
      case "st_crosses"    => Some(prep.crosses(p))     // symmetric
      case "st_overlaps"   => Some(prep.overlaps(p))    // symmetric
      case _               => None // st_equals / bbox: no prepared form
    }
    def expand: Double = 0.0
    /** predicate with sides swapped (spatial_predicate.rs:139-152) */
    def inverted: Relation = Relation(name match {
      case "st_contains"  => "st_within"
      case "st_within"    => "st_contains"
      case "st_covers"    => "st_coveredby"
      case "st_coveredby" => "st_covers"
      case other          => other // symmetric
    })
  }
  final case class Distance(d: Double, strict: Boolean) extends SpatialPredicate {
    def refine(p: JtsGeometry, b: JtsGeometry): Boolean =
      if (strict) p.distance(b) < d else p.isWithinDistance(b, d)
    def refinePrepared(prep: PreparedGeometry, p: JtsGeometry): Option[Boolean] =
      None // JTS prepared geometries have no distance form
    def expand: Double = d
  }

  private val relationNames = Set(
    "st_intersects", "st_contains", "st_within", "st_covers", "st_coveredby",
    "st_touches", "st_crosses", "st_overlaps", "st_equals", "st_bbox_intersects")

  /** Extracted spatial condition: probe-side expr, build-side expr,
    * predicate (already oriented as probe-vs-build = left-vs-right). */
  final case class Extracted(leftGeom: Expression, rightGeom: Expression,
      pred: SpatialPredicate)

  /** Recognize the three condition shapes the reference parses
    * (utils.rs:7-30): ST_Relation(l, r); ST_DWithin(l, r, d);
    * ST_Distance(l, r) < d / d > ST_Distance(l, r) (both comparison
    * directions, bound on either side). */
  def extract(cond: Expression, left: Seq[Attribute], right: Seq[Attribute]): Option[Extracted] = {
    def sideOf(e: Expression): Option[Boolean] = { // true = left
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(AttributeSet(left))) Some(true)
      else if (refs.subsetOf(AttributeSet(right))) Some(false)
      else None
    }
    def orient(a: Expression, b: Expression, rel: Relation): Option[Extracted] =
      (sideOf(a), sideOf(b)) match {
        case (Some(true), Some(false)) => Some(Extracted(a, b, rel))
        case (Some(false), Some(true)) => Some(Extracted(b, a, rel.inverted))
        case _                         => None
      }
    def orientD(a: Expression, b: Expression, d: Double, strict: Boolean): Option[Extracted] =
      (sideOf(a), sideOf(b)) match {
        case (Some(true), Some(false)) => Some(Extracted(a, b, Distance(d, strict)))
        case (Some(false), Some(true)) => Some(Extracted(b, a, Distance(d, strict)))
        case _                         => None
      }
    def litD(e: Expression): Option[Double] = e match {
      case Literal(v, _) if v != null => Some(v.toString.toDouble)
      case _                          => None
    }
    cond match {
      case graft.spatial.StPredicateExpr(name, l, r) if relationNames(name) =>
        orient(l, r, Relation(name))
      case u: ScalaUDF if u.udfName.exists(n => relationNames(n.toLowerCase)) =>
        orient(u.children(0), u.children(1), Relation(u.udfName.get.toLowerCase))
      case u: ScalaUDF if u.udfName.exists(_.equalsIgnoreCase("st_dwithin")) =>
        litD(u.children(2)).flatMap(d =>
          orientD(u.children(0), u.children(1), d, strict = false))
      // st_distance registers as a native node (round 9), so the four
      // comparison shapes match it structurally (it can no longer
      // appear as a ScalaUDF)
      case LessThan(graft.spatial.StDistanceExpr(l, r), lim) =>
        litD(lim).flatMap(d => orientD(l, r, d, strict = true))
      case LessThanOrEqual(graft.spatial.StDistanceExpr(l, r), lim) =>
        litD(lim).flatMap(d => orientD(l, r, d, strict = false))
      case GreaterThan(lim, graft.spatial.StDistanceExpr(l, r)) =>
        litD(lim).flatMap(d => orientD(l, r, d, strict = true))
      case GreaterThanOrEqual(lim, graft.spatial.StDistanceExpr(l, r)) =>
        litD(lim).flatMap(d => orientD(l, r, d, strict = false))
      case _ => None
    }
  }
}

/** Planner strategy (the reference's ExtensionPlanner,
  * physical_planner.rs:62-286): joins whose only condition is a spatial
  * predicate become a broadcast R-tree join, building on the smaller
  * side (physical_planner.rs:128-136 swaps inputs by stats). Falls
  * through (Nil) when the shape doesn't match, letting Spark's own
  * strategies (incl. BroadcastNestedLoopJoin) take over — the
  * reference's fallback at physical_planner.rs:104-126.
  */
object SpatialJoinStrategy extends SparkStrategy {
  import SpatialJoinPlans._

  /** Max bytes we are willing to collect+index on the build side; above
    * this, fall through to Spark (or use the grid-partitioned API).
    * Overridable via spark.graft.spatial_join.build_limit_bytes. */
  private def buildLimit: Long =
    graft.spatial.GraftConf.buildLimitBytes(
      org.apache.spark.sql.SparkSession.active)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, joinType @ (Inner | LeftSemi | LeftAnti | LeftOuter |
        RightOuter | FullOuter), Some(cond), _) =>
      extract(cond, left.output, right.output) match {
        case Some(ex) =>
          val lSize = left.stats.sizeInBytes
          val rSize = right.stats.sizeInBytes
          val limit = BigInt(buildLimit)
          def swappedPred = ex.pred match {
            case r: Relation => r.inverted
            case d           => d
          }
          // build on LEFT, probe with RIGHT (side-swap by stats; the
          // reference's physical_planner.rs:128-136)
          def swapped(jt: JoinType) = BroadcastSpatialJoinExec(
            planLater(right), planLater(left),
            ex.rightGeom, ex.leftGeom, swappedPred, jt)
          def direct(jt: JoinType) = BroadcastSpatialJoinExec(
            planLater(left), planLater(right),
            ex.leftGeom, ex.rightGeom, ex.pred, jt)
          def project(out: Seq[Attribute], child: SparkPlan) =
            org.apache.spark.sql.execution.ProjectExec(out, child) :: Nil
          val nullableL = left.output.map(_.withNullability(true))
          val nullableR = right.output.map(_.withNullability(true))
          joinType match {
            // inner joins may build on either side: pick the smaller
            case Inner if lSize < rSize && lSize <= limit =>
              project(left.output ++ right.output, swapped(Inner))
            // RIGHT outer = LEFT outer with sides swapped (unmatched
            // emission stays on the probe side — no bitmap needed)
            case RightOuter if lSize <= limit =>
              project(nullableL ++ right.output, swapped(LeftOuter))
            // FULL outer tracks matched build rows (the Spark shape of
            // the reference's unmatched bitmaps, stream.rs:1350-1445);
            // symmetric, so build on whichever side fits
            case FullOuter if rSize <= limit && rSize <= lSize =>
              direct(FullOuter) :: Nil
            case FullOuter if lSize <= limit =>
              project(nullableL ++ nullableR, swapped(FullOuter))
            case FullOuter if rSize <= limit =>
              direct(FullOuter) :: Nil
            case Inner | LeftSemi | LeftAnti | LeftOuter if rSize <= limit =>
              direct(joinType) :: Nil
            case _ => Nil // too big to index-broadcast: Spark fallback
          }
        case None => Nil
      }
    case _ => Nil
  }
}

/** Broadcast R-tree spatial join: the build (right) side is collected
  * and broadcast, each task builds an STRtree once (lazily, shared per
  * partition), probes stream through with envelope lookup + exact
  * refinement — the Spark shape of the reference's single-partition
  * mode (index/spatial_index.rs:25-130 + stream.rs probe loop).
  *
  * Supports Inner, LeftSemi, LeftAnti, LeftOuter (unmatched-probe
  * emission needs only per-row state) and FullOuter (build-side
  * unmatched emission via a matched-index bitset OR-ed across probe
  * partitions, then a union with the never-matched build rows — the
  * Spark shape of the reference's unmatched bitmaps,
  * stream.rs:84-90,1350-1445, and of Spark's own
  * BroadcastNestedLoopJoinExec.defaultJoin bitset pass). RightOuter is
  * planned as a side-swapped LeftOuter by [[SpatialJoinStrategy]].
  */
final case class BroadcastSpatialJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftGeom: Expression, rightGeom: Expression,
    pred: SpatialJoinPlans.SpatialPredicate,
    joinType: JoinType) extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftSemi | LeftAnti => left.output
    case LeftOuter           => left.output ++ right.output.map(_.withNullability(true))
    case FullOuter           => left.output.map(_.withNullability(true)) ++
                                right.output.map(_.withNullability(true))
    case _                   => left.output ++ right.output
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)

  /** Build the per-task probe index from the broadcast rows (entries
    * keep their index into the full build array so FullOuter can track
    * matches; null/unparseable build geometries are unmatched by
    * definition and only surface through the FullOuter union). */
  private def buildIndex(rows: Array[InternalRow], bound: Expression): STRtree = {
    val index = new STRtree()
    var i = 0
    while (i < rows.length) {
      val wkb = bound.eval(rows(i)).asInstanceOf[Array[Byte]]
      val geom = if (wkb == null) null else Geo.fromWkb(wkb)
      if (geom != null) index.insert(geom.getEnvelopeInternal, new BuildEntry(geom, rows(i), i))
      i += 1
    }
    index.build()
    index
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val sampleSize = graft.spatial.GraftConf.speculativeSample(
      org.apache.spark.sql.SparkSession.active)
    val buildRows: Array[InternalRow] = right.executeCollect().map(_.copy())
    val bc: Broadcast[Array[InternalRow]] = sparkContext.broadcast(buildRows)
    val rGeomBound = BindReferences.bindReference(rightGeom, right.output)
    val lGeomBound = BindReferences.bindReference(leftGeom, left.output)
    val predicate = pred
    val jt = joinType
    val outputAttrs = output
    val leftWidth = left.output.size
    val rightWidth = right.output.size

    val streamed: RDD[InternalRow] = left.execute().mapPartitions[InternalRow] { iter =>
      val index = buildIndex(bc.value, rGeomBound)
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow()
      val nullRight = new GenericInternalRow(rightWidth)
      val refiner = new SpeculativeRefiner(predicate, sampleSize)

      iter.flatMap { probeRow =>
        val wkb = lGeomBound.eval(probeRow).asInstanceOf[Array[Byte]]
        val probeGeom = if (wkb == null) null else Geo.fromWkb(wkb)
        if (probeGeom == null) {
          jt match {
            case LeftAnti              => Iterator.single(toUnsafe(probeRow))
            case LeftOuter | FullOuter => Iterator.single(toUnsafe(joined(probeRow, nullRight)))
            case _                     => Iterator.empty
          }
        } else {
          val env = new Envelope(probeGeom.getEnvelopeInternal)
          if (predicate.expand > 0) env.expandBy(predicate.expand)
          val candidates = index.query(env).iterator()
          var matches = List.empty[InternalRow]
          var any = false
          while (candidates.hasNext && !(any && (jt == LeftSemi || jt == LeftAnti))) {
            val e = candidates.next().asInstanceOf[BuildEntry]
            if (refiner.refine(probeGeom, e)) {
              any = true
              if (jt != LeftSemi && jt != LeftAnti) matches ::= e.row
            }
          }
          jt match {
            case LeftSemi          => if (any) Iterator.single(toUnsafe(probeRow)) else Iterator.empty
            case LeftAnti          => if (any) Iterator.empty else Iterator.single(toUnsafe(probeRow))
            case (LeftOuter | FullOuter) if !any =>
              Iterator.single(toUnsafe(joined(probeRow, nullRight)))
            case _ => matches.reverseIterator.map(b => toUnsafe(joined(probeRow, b)))
          }
        }
      }
    }

    if (jt != FullOuter) streamed
    else {
      // Second pass: OR together each probe partition's matched-build
      // bitset (tiny: one bit per build row, build side is broadcast-
      // bounded), then emit the never-matched build rows null-extended.
      val matched = left.execute().mapPartitions { iter =>
        val index = buildIndex(bc.value, rGeomBound)
        val bits = new java.util.BitSet(bc.value.length)
        val refiner = new SpeculativeRefiner(predicate, sampleSize)
        iter.foreach { probeRow =>
          val wkb = lGeomBound.eval(probeRow).asInstanceOf[Array[Byte]]
          val probeGeom = if (wkb == null) null else Geo.fromWkb(wkb)
          if (probeGeom != null) {
            val env = new Envelope(probeGeom.getEnvelopeInternal)
            if (predicate.expand > 0) env.expandBy(predicate.expand)
            val candidates = index.query(env).iterator()
            while (candidates.hasNext) {
              val e = candidates.next().asInstanceOf[BuildEntry]
              if (!bits.get(e.idx) && refiner.refine(probeGeom, e)) bits.set(e.idx)
            }
          }
        }
        Iterator.single(bits)
      }.fold(new java.util.BitSet(buildRows.length)) { (a, b) => a.or(b); a }

      val unmatchedIdx = buildRows.indices.filterNot(matched.get)
      val unmatched = sparkContext
        .parallelize(unmatchedIdx, 1)
        .mapPartitions[InternalRow] { idxIter =>
          val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
          val joined = new JoinedRow()
          val nullLeft = new GenericInternalRow(leftWidth)
          val rows = bc.value
          idxIter.map(i => toUnsafe(joined(nullLeft, rows(i))))
        }
      streamed.union(unmatched)
    }
  }
}

/** One build-side row (+ its index in the broadcast array, for
  * FullOuter matched tracking): geometry + lazily prepared form
  * (computed only if the speculative refiner decides prepared wins). */
final class BuildEntry(val geom: JtsGeometry, val row: InternalRow, val idx: Int) {
  lazy val prepared: PreparedGeometry = PreparedGeometryFactory.prepare(geom)
}

/** A17, the reference's speculative execution-mode selection
  * (option.rs:49 "Speculative, sample 100 probes"): time the first
  * `SampleSize` refinements through BOTH the plain and the prepared
  * backend, then commit to the cheaper one for the rest of the task.
  * Predicates without a prepared form always use the plain path. One
  * instance per task — no cross-task coordination, identical results
  * either way (only the evaluation strategy differs).
  */
final class SpeculativeRefiner(pred: SpatialJoinPlans.SpatialPredicate,
    sampleSize: Int = 100) {
  private val SampleSize = sampleSize
  private var sampled = 0
  private var plainNanos = 0L
  private var prepNanos = 0L
  // -1 undecided (sampling), 0 plain, 1 prepared
  private var mode: Int = pred match {
    case r: SpatialJoinPlans.Relation
        if r.name != "st_equals" && r.name != "st_bbox_intersects" => -1
    case _ => 0 // distance / equals / bbox: no prepared form
  }

  def refine(probe: JtsGeometry, e: BuildEntry): Boolean = mode match {
    case 0 => pred.refine(probe, e.geom)
    case 1 => pred.refinePrepared(e.prepared, probe).get
    case _ =>
      val t0 = System.nanoTime()
      val viaPrepared = pred.refinePrepared(e.prepared, probe)
      val t1 = System.nanoTime()
      val plain = pred.refine(probe, e.geom)
      val t2 = System.nanoTime()
      viaPrepared match {
        case None => mode = 0 // no prepared form: stop sampling
        case Some(_) =>
          prepNanos += t1 - t0
          plainNanos += t2 - t1
          sampled += 1
          if (sampled >= SampleSize)
            mode = if (prepNanos < plainNanos) 1 else 0
      }
      plain
  }
}
