package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchKernels
import graft.spatial.{KdbTree, Projections}

/** Property-based tests (ScalaCheck) for the pure kernels behind the
  * codegen expressions: the defining algebraic property of each kernel
  * is checked on randomized inputs, independent of any fixture.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def sig(hs: Seq[Long]): Seq[Long] =
    SketchKernels.minhashSig(new GenericArrayData(hs.toArray), 64)
      .toLongArray().toSeq

  test("minhash: sig(A ∪ B) is the elementwise min of sig(A), sig(B)") {
    val genSet = Gen.nonEmptyListOf(Gen.long)
    check(Prop.forAll(genSet, genSet) { (a: List[Long], b: List[Long]) =>
      val u = sig(a ++ b)
      val (sa, sb) = (sig(a), sig(b))
      u == sa.zip(sb).map { case (x, y) => math.min(x, y) }
    })
  }

  test("minhash: signature is order- and multiplicity-invariant") {
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.long)
      seed <- Gen.long
    } yield (xs, seed)
    check(Prop.forAll(gen) { case (xs: List[Long], seed: Long) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs ++ xs.take(3))
      sig(shuffled) == sig(xs.distinct.sorted)
    })
  }

  test("zorder64: de-interleaving recovers both coordinates exactly") {
    val coord = Gen.choose(0L, (1L << 31) - 1)
    def unpick(z: Long, off: Int): Long =
      (0 until 31).map(i => ((z >> (2 * i + off)) & 1L) << i).sum
    check(Prop.forAll(coord, coord) { (x: Long, y: Long) =>
      val z = SketchKernels.zorder64(x, y)
      z >= 0 && unpick(z, 0) == x && unpick(z, 1) == y
    })
  }

  test("kdb tree: assign equals brute-force region overlap; locate agrees") {
    val pt = Gen.choose(0.0, 100.0)
    val genSamples = Gen.listOfN(60, Gen.zip(pt, pt))
    // independent leaf-region enumeration (assign's dual): walk the
    // tree accumulating half-open bounds
    def regions(t: KdbTree,
        b: (Double, Double, Double, Double) = (Double.NegativeInfinity,
          Double.PositiveInfinity, Double.NegativeInfinity, Double.PositiveInfinity))
        : Seq[(Int, (Double, Double, Double, Double))] = t match {
      case KdbTree.Leaf(id) => Seq(id -> b)
      case KdbTree.Split(vertical, v, lo, hi) =>
        val (x0, x1, y0, y1) = b
        if (vertical)
          regions(lo, (x0, math.min(x1, v), y0, y1)) ++
            regions(hi, (math.max(x0, v), x1, y0, y1))
        else
          regions(lo, (x0, x1, y0, math.min(y1, v))) ++
            regions(hi, (x0, x1, math.max(y0, v), y1))
    }
    check(Prop.forAll(genSamples, pt, pt, pt, pt) {
      (samples: List[(Double, Double)], ax: Double, bx: Double, ay: Double, by: Double) =>
        val tree = KdbTree.build(samples.toArray, 16)
        val (x0, x1) = (math.min(ax, bx), math.max(ax, bx))
        val (y0, y1) = (math.min(ay, by), math.max(ay, by))
        val got = tree.assign(x0, y0, x1, y1).toSet
        val want = regions(tree).collect {
          // box [lo,hi] overlaps half-open region [rl, rh) iff hi >= rl && lo < rh
          case (id, (rx0, rx1, ry0, ry1))
            if x1 >= rx0 && x0 < rx1 && y1 >= ry0 && y0 < ry1 => id
        }.toSet
        val pointCell = tree.locate(x0, y0)
        got == want && tree.assign(x0, y0, x0, y0) == Seq(pointCell)
    })
  }

  test("projections: inverse(forward) roundtrips inside each CRS domain") {
    // (srid, lon range, lat range); domains stay inside each
    // projection's validity region
    // UTM domains are the true 6°-wide zones: the Snyder TM series is
    // specified in-zone (error ~1e-6 deg already at 2× the zone
    // half-width at high latitude)
    val domains = Seq(
      (3857, (-179.0, 179.0), (-84.0, 84.0)),
      (32633, (12.1, 17.9), (0.5, 83.5)),   // UTM 33N
      (32733, (12.1, 17.9), (-79.5, -0.5)), // UTM 33S
      (26917, (-83.9, -78.1), (24.0, 83.0)), // NAD83 UTM 17N
      (5070, (-124.0, -67.0), (25.0, 49.0)), // CONUS Albers
      (2154, (-4.5, 9.5), (41.5, 51.0)),   // Lambert-93
      (3031, (-179.0, 179.0), (-89.0, -61.0)), // Antarctic stereo
      (3035, (-10.0, 30.0), (35.0, 70.0))) // LAEA Europe
    for ((srid, (lo0, lo1), (la0, la1)) <- domains) {
      val proj = Projections.forSrid(srid).get
      check(Prop.forAll(Gen.choose(lo0, lo1), Gen.choose(la0, la1)) {
        (lon: Double, lat: Double) =>
          val (x, y) = proj.forward(lon, lat)
          val (lon2, lat2) = proj.inverse(x, y)
          math.abs(lon2 - lon) < 1e-6 && math.abs(lat2 - lat) < 1e-6
      }, n = 100)
    }
  }

  test("TopKAgg: any reduce/merge partitioning equals global sort-take(k)") {
    import graft.operators.{TopKAgg, TopKIn}
    // candidates with DELIBERATE ordv ties (small value domain) so the
    // id tie-break is exercised; ids unique by construction
    val genRows = Gen.nonEmptyListOf(Gen.choose(0, 9))
      .map(_.zipWithIndex.map { case (v, i) => TopKIn(v.toDouble, i.toLong, 0L) })
    val genCase = for {
      rows <- genRows
      k <- Gen.choose(1, 8)
      asc <- Gen.oneOf(true, false)
      cuts <- Gen.listOfN(3, Gen.choose(0, rows.size))
    } yield (rows, k, asc, cuts.sorted)
    check(Prop.forAll(genCase) { case (rows, k, asc, cuts) =>
      val agg = new TopKAgg(k, asc)
      // split into 4 "partitions", reduce each, merge in tree order —
      // the ObjectHashAggregate partial/merge path
      val bounds = (0 +: cuts) :+ rows.size
      val parts = bounds.zip(bounds.tail).map { case (a, b) => rows.slice(a, b) }
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(partials.reduce(agg.merge))
      val expected = rows.sortBy(r => (if (asc) r.ordv else -r.ordv, r.id)).take(k)
      merged == expected
    })
  }
}
