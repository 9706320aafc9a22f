package graft.spatial

/** KDB-tree spatial partitioner (reference A10,
  * spatial/src/join/partitioning/kdb.rs:40-214): recursive axis-aligned
  * median splits fitted to a bounded sample of envelope centers, so
  * leaf regions adapt to the data distribution (uniform grids hot-spot
  * under skew). Built on the driver from ≤10k samples (the reference's
  * cap, option.rs:62-70), shipped to tasks inside closures (few KB).
  *
  * Leaves partition the whole plane: the outermost regions are
  * unbounded, so every point maps to exactly one leaf — which makes the
  * reference-point duplicate suppression exact.
  */
sealed trait KdbTree extends Serializable {
  /** all leaves whose region intersects the (expanded) envelope */
  def assign(x0: Double, y0: Double, x1: Double, y1: Double): Seq[Int]
  /** the single leaf containing the point */
  def locate(x: Double, y: Double): Int
  def numLeaves: Int
}

object KdbTree {

  final case class Leaf(id: Int) extends KdbTree {
    def assign(x0: Double, y0: Double, x1: Double, y1: Double): Seq[Int] = Seq(id)
    def locate(x: Double, y: Double): Int = id
    def numLeaves: Int = 1
  }

  /** Split on `value` along axis (vertical = x-split): coords < value
    * go low, >= value go high. Regions are otherwise unbounded. */
  final case class Split(vertical: Boolean, value: Double,
      low: KdbTree, high: KdbTree) extends KdbTree {
    def assign(x0: Double, y0: Double, x1: Double, y1: Double): Seq[Int] = {
      val (lo, hi) = if (vertical) (x0, x1) else (y0, y1)
      val a = if (lo < value) low.assign(x0, y0, x1, y1) else Nil
      val b = if (hi >= value) high.assign(x0, y0, x1, y1) else Nil
      a ++ b
    }
    def locate(x: Double, y: Double): Int = {
      val c = if (vertical) x else y
      if (c < value) low.locate(x, y) else high.locate(x, y)
    }
    def numLeaves: Int = low.numLeaves + high.numLeaves
  }

  /** Build from sampled envelope centers. `targetLeaves` bounds the
    * partition count (= shuffle width for the spatial join). */
  def build(samples: Array[(Double, Double)], targetLeaves: Int): KdbTree = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)

    def rec(pts: Array[(Double, Double)], leaves: Int, vertical: Boolean): KdbTree =
      if (leaves <= 1 || pts.length < 2 || distinctCoords(pts, vertical) < 2)
        Leaf(counter.getAndIncrement())
      else {
        val coords = pts.map(p => if (vertical) p._1 else p._2).sorted
        var median = coords(coords.length / 2)
        // a median equal to the min splits nothing; move to first greater
        if (median == coords(0)) {
          val greater = coords.find(_ > median)
          if (greater.isEmpty) return Leaf(counter.getAndIncrement())
          median = greater.get
        }
        val (lo, hi) = pts.partition(p => (if (vertical) p._1 else p._2) < median)
        val loLeaves = math.max(1, math.round(leaves * lo.length.toDouble / pts.length).toInt)
        val hiLeaves = math.max(1, leaves - loLeaves)
        Split(vertical, median,
          rec(lo, loLeaves, !vertical),
          rec(hi, hiLeaves, !vertical))
      }

    def distinctCoords(pts: Array[(Double, Double)], vertical: Boolean): Int =
      pts.iterator.map(p => if (vertical) p._1 else p._2).distinct.take(2).size

    if (samples.isEmpty) Leaf(0)
    else rec(samples, math.max(1, targetLeaves), vertical = true)
  }
}
