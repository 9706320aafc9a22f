package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spatial.GraftConf

/** Distributed connected components by iterative min-label propagation
  * — the building block behind near-dup graph clustering (d06) and
  * density clustering (sp07).
  *
  * Each round is one hash-join shuffle keyed on the edge endpoint plus
  * a map-side-combined min aggregate; the loop runs O(graph diameter)
  * rounds, and `localCheckpoint` truncates the per-round lineage (the
  * Pregel trick without GraphX's RDD API). Both current users have
  * small, star-like components (near-dup clusters, density blobs), so
  * 2-5 rounds close at any corpus size; nothing driver-side ever holds
  * more than the loop's change counter.
  */
object Components {

  /** Min-label fixpoint over a symmetric edge set.
    *
    * @param edges    (src, dst) rows; must contain BOTH orientations of
    *                 every undirected edge (propagation is directional)
    * @param vertices (v) rows; vertices absent from `edges` keep their
    *                 own id as the component (singleton components)
    * @return (v, comp) with comp = min vertex id reachable from v
    */
  def minLabel(edges: DataFrame, vertices: DataFrame,
      maxRounds: Int = -1): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val spark = edges.sparkSession
    val cap = if (maxRounds > 0) maxRounds
      else GraftConf.componentsMaxRounds(spark)
    var labels = vertices.select(col("v")).distinct()
      .withColumn("comp", col("v"))
      .localCheckpoint(true)
    var delta = 1L
    var rounds = 0
    while (delta > 0 && rounds < cap) {
      val nbrMin = e
        .join(labels.select(col("v").as("dst"), col("comp").as("ncomp")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("ncomp")).as("nbr_min"))
      // convergence flag rides along in the checkpointed row, so the
      // delta check is a column sum over materialized data instead of a
      // second full-width anti-join (`except`) per round
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "v"), Seq("v"), "left")
        .select(col("v"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"),
          (col("nbr_min") < col("comp")).as("changed"))
        .localCheckpoint(true)
      delta = next.filter(col("changed")).count()
      labels = next.select(col("v"), col("comp"))
      rounds += 1
    }
    e.unpersist()
    // Unconverged labels silently split one true component in two — for
    // consumers like d12 (leakage-free split) that is the exact defect the
    // operator exists to prevent, so fail loudly instead of returning them.
    if (delta > 0) throw new IllegalStateException(
      s"Components.minLabel did not converge after $rounds rounds " +
      s"($delta labels still changing); raise spark.graft.components.max_rounds")
    labels
  }

  /** Bounded-round k-core peel (Matula-Beck shape): each round drops
    * every vertex with out-degree < k and restricts the edge set to
    * surviving endpoints. Runs a FIXED number of rounds — the budgeted
    * stage count a 100 TB job plans around — and truncates lineage with
    * `localCheckpoint(true)` after every round, exactly like
    * [[minLabel]]. Without the truncation each round's plan embeds ~3
    * copies of the previous round's (the survivor set feeds two
    * semi-joins), so Catalyst analysis goes exponential in the round
    * count while the executors idle; with it the per-round plan is
    * constant-size.
    *
    * @param edges  (src, dst) rows; must contain BOTH orientations of
    *               every undirected edge (degree is counted on src)
    * @param k      minimum surviving degree
    * @param rounds fixed peel-round budget
    * @return (survivingVertices(src), survivingEdges(src, dst)) after
    *         the final round
    */
  def kCorePeel(edges: DataFrame, k: Int,
      rounds: Int): (DataFrame, DataFrame) = {
    var e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var v = e.select(col("src")).distinct()
    for (_ <- 1 to rounds) {
      v = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("src"))
        .localCheckpoint(true)
      e = e.join(v, Seq("src"), "left_semi")
        .join(v.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(true)
    }
    (v, e)
  }
}
