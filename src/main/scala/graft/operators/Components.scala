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

  /** Rounds the last [[minLabel]] call took — profiling diagnostic for
    * the scale smoke (per-stage attribution of iterative cost). */
  @volatile var lastRounds: Int = 0

  /** Rounds the last [[kCorePeel]] / [[kTrussPeel]] call actually ran
    * before the fixpoint early-exit fired — spec/profiling diagnostic
    * (the round budget stays the contract; these record the savings). */
  @volatile var lastPeelRounds: Int = 0
  @volatile var lastTrussRounds: Int = 0

  /** The checkpoint-backed RDD of a `localCheckpoint(true)`'d frame —
    * the flat [[org.apache.spark.sql.execution.LogicalRDD]] leaf that
    * call produces. Used to free SUPERSEDED loop generations
    * deterministically: checkpoint blocks are otherwise reclaimed only
    * when the GC-driven ContextCleaner notices the dropped reference,
    * and a long-lived JVM running many iterative queries accumulates
    * dead generations faster than GC notices them (observed: a late
    * scale-smoke leg OOMing against its predecessors' residue while
    * passing standalone). Freeing a generation is sound exactly when
    * nothing will ever read it again — each loop below frees gen k-1
    * only after gen k has eagerly materialized. Returns None if the
    * plan isn't the expected leaf (then the GC path still applies). */
  private def checkpointRdd(
      df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Min-label fixpoint over a symmetric edge set.
    *
    * Rounds 1-2 are plain neighbor-min propagation (the cheap path the
    * star-like near-dup graphs close on). From round 3 on, when the
    * previous round's frontier is still LARGE
    * (GraftConf.componentsJumpMinDelta, default 100k changed labels)
    * the round ALSO pointer-jumps (comp ← label(comp), sound because
    * labels only decrease, so label(comp(v)) ≤ comp(v)) — path
    * compression that turns O(diameter) convergence into
    * O(log diameter). At ×100 fixture density DBSCAN blobs grow long
    * chains; without the jump the round count — not per-round cost —
    * was sp07's super-linear term. Small graphs never clear the
    * frontier gate, so their plain-propagation cost is unchanged.
    *
    * @param edges    (src, dst) rows; must contain BOTH orientations of
    *                 every undirected edge (propagation is directional)
    * @param vertices (v) rows; vertices absent from `edges` keep their
    *                 own id as the component (singleton components)
    * @return (v, comp) with comp = min vertex id reachable from v
    */
  def minLabel(edges: DataFrame, vertices: DataFrame,
      maxRounds: Int = -1): DataFrame = {
    // localCheckpoint, not persist (r13): a persisted frame keeps its
    // FULL logical plan, so every round's nbrMin/stepped analysis (and
    // Catalyst optimization) re-walks the whole upstream tree — for the
    // dedup callers that tree is the entire LSH candidate+verify
    // pipeline, re-analyzed O(rounds) times on the driver while the
    // executors idle (the d24 lesson, applied to the edge set this loop
    // was still holding as a persist). The eager checkpoint runs the
    // upstream once and every round sees a flat leaf.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var eCkpt = checkpointRdd(e)
    val spark = edges.sparkSession
    val cap = if (maxRounds > 0) maxRounds
      else GraftConf.componentsMaxRounds(spark)
    var labels = vertices.select(col("v")).distinct()
      .withColumn("comp", col("v"))
      .localCheckpoint(true)
    var prevCkpt = checkpointRdd(labels)
    var delta = 1L
    var rounds = 0
    // the in-flight jump intermediate, held so a mid-round failure
    // (task OOM, cancellation) can't leak its persist() — the edges
    // cache and this handle are released in the finally below; the
    // checkpoint generations stay on the GC-cleaner path on failure
    var liveJump: Option[DataFrame] = None
    try while (delta > 0 && rounds < cap) {
      val nbrMin = e
        .join(labels.select(col("v").as("dst"), col("comp").as("ncomp")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("ncomp")).as("nbr_min"))
      val stepped = labels
        .join(nbrMin.withColumnRenamed("src", "v"), Seq("v"), "left")
        .select(col("v"), col("comp").as("comp0"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
      // pointer jump from round 3 on large frontiers: follow the
      // label's own label. The intermediate is PERSISTED (explicitly
      // released once `next` materializes), not localCheckpoint'ed —
      // checkpoint blocks are only reclaimed by the GC-driven
      // ContextCleaner, and one extra pinned 3-column generation per
      // round starved execution memory at ×100 scale (the round-8
      // smoke's sp07 OOM)
      val (compressed, jumpHandle) =
        if (rounds < 2 || delta < GraftConf.componentsJumpMinDelta(spark))
          (stepped, None)
        else {
          val s = stepped.persist()
          liveJump = Some(s)
          val jumped = s
            .join(s.select(col("v").as("comp"), col("comp").as("jump")),
              Seq("comp"), "left")
            .select(col("v"), col("comp0"),
              least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
          (jumped, Some(s))
        }
      // convergence flag rides along in the checkpointed row, so the
      // delta check is a column sum over materialized data instead of a
      // second full-width anti-join (`except`) per round
      val next = compressed
        .select(col("v"), col("comp"), (col("comp") < col("comp0")).as("changed"))
        .localCheckpoint(true)
      delta = next.filter(col("changed")).count()
      jumpHandle.foreach(_.unpersist(false)) // next is materialized; the
      // jump intermediate can never be re-read
      liveJump = None
      prevCkpt.foreach(_.unpersist(false)) // ... nor can gen k-1
      prevCkpt = checkpointRdd(next)
      labels = next.select(col("v"), col("comp"))
      rounds += 1
    } finally {
      // the labels the caller consumes never re-read the edge
      // checkpoint, so its blocks are released here; the FINAL labels
      // checkpoint must stay live (the caller's plan reads it) — it is
      // registered below for release with the query's other tracked
      // state once the caller's action completes
      eCkpt.foreach(_.unpersist(false))
      eCkpt = None
      liveJump.foreach(_.unpersist(false))
    }
    prevCkpt.foreach(graft.util.Persist.trackRdd(spark, _))
    lastRounds = rounds
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
    var eCkpt = checkpointRdd(e)
    var vCkpt = Option.empty[org.apache.spark.rdd.RDD[_]]
    // fixpoint early-exit: peeling is monotone (each round's semi-joins
    // only REMOVE edges, so e_r ⊆ e_{r-1} and equal counts ⇒ equal
    // sets), hence once a round leaves the edge set unchanged every
    // later round is the identity — running it is pure waste (2
    // semi-joins + an aggregate + a checkpoint materialization per
    // round at 100 TB). The count is read off the just-materialized
    // checkpoint (densestPeel already proves that cost is negligible);
    // the fixed round budget survives as the CAP, so output is
    // bit-identical to the unconditional loop.
    var prevEdges = -1L
    var ran = 0
    var converged = false
    for (_ <- 1 to rounds if !converged) {
      v = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("src"))
        .localCheckpoint(true)
      e = e.join(v, Seq("src"), "left_semi")
        .join(v.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      // this round's v and e are materialized: the previous generation
      // can never be re-read — free it now instead of waiting on GC
      eCkpt.foreach(_.unpersist(false))
      vCkpt.foreach(_.unpersist(false))
      eCkpt = checkpointRdd(e)
      vCkpt = checkpointRdd(v)
      ran += 1
      val ne = e.count()
      if (ne == prevEdges) converged = true else prevEdges = ne
    }
    lastPeelRounds = ran
    // the FINAL generations survive into the caller's plan; register
    // them so the query's consumer frees their blocks after its action
    eCkpt.foreach(graft.util.Persist.trackRdd(edges.sparkSession, _))
    vCkpt.foreach(graft.util.Persist.trackRdd(edges.sparkSession, _))
    (v, e)
  }

  /** Bounded-round k-truss peel: each round computes per-edge SUPPORT
    * (triangles containing the edge, = |N(u) ∩ N(v)|) with two key
    * equi-joins on vertex ids, then drops edges with support < k-2.
    * 3-trusses keep only edges embedded in at least one triangle —
    * tighter than 2-cores (a long cycle is a 2-core but has no
    * 3-truss). Same checkpointed-loop discipline as [[kCorePeel]]:
    * constant-size per-round plan, shuffles keyed on vertices only.
    *
    * @param edges (src, dst) in BOTH orientations (like the other peels)
    * @return surviving canonical undirected edges (lo, hi), lo < hi
    */
  def kTrussPeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var u = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .where(col("lo") < col("hi")).distinct()
      .localCheckpoint(true)
    var uCkpt = checkpointRdd(u)
    // same monotone fixpoint early-exit as kCorePeel: the semi-join only
    // removes edges, so an unchanged count means every later round is
    // the identity — skip it (the wedge closure is this operator's
    // expensive stage, two joins over the symmetrized edge list)
    var prevEdges = -1L
    var ran = 0
    var converged = false
    for (_ <- 1 to rounds if !converged) {
      val sym = u.select(col("lo").as("s"), col("hi").as("d"))
        .union(u.select(col("hi").as("s"), col("lo").as("d")))
      // wedge closure: edge (lo,hi) + shared neighbor d of both ends
      val sup = u.as("e")
        .join(sym.as("x"), col("x.s") === col("e.lo"))
        .join(sym.as("y"),
          col("y.s") === col("e.hi") && col("y.d") === col("x.d"))
        .groupBy(col("e.lo").as("lo"), col("e.hi").as("hi"))
        .agg(count(lit(1)).as("sup"))
      // zero-support edges have no sup row: the semi-join drops them
      u = u.join(sup.where(col("sup") >= k - 2), Seq("lo", "hi"), "left_semi")
        .localCheckpoint(true)
      uCkpt.foreach(_.unpersist(false)) // superseded generation
      uCkpt = checkpointRdd(u)
      ran += 1
      val ne = u.count()
      if (ne == prevEdges) converged = true else prevEdges = ne
    }
    lastTrussRounds = ran
    // final generation: released by the consumer, not the GC cleaner
    uCkpt.foreach(graft.util.Persist.trackRdd(edges.sparkSession, _))
    u
  }

  /** Bounded-round densest-subgraph peel (Bahmani–Kumar–Vassilvitskii
    * 2012, ε = 0.5): each round removes EVERY vertex whose degree is
    * ≤ 2(1+ε)·ρ where ρ = |E|/|V| is the current undirected density —
    * the keep test `deg · |V| > 3 · |E|` stays in exact integer
    * arithmetic so replays are engine-identical. Returns per-round
    * (round, nVertices, nEdges); the best-density round is a
    * 1/(2(1+ε))-approximation of the densest subgraph. Only two scalar
    * counts per round ever reach the driver; the vertex set is the
    * endpoints of the surviving edges (isolated vertices contribute
    * nothing to density).
    */
  def densestPeel(undirected: DataFrame, rounds: Int): Seq[(Int, Long, Long)] = {
    var e = undirected.select(col("lo"), col("hi")).localCheckpoint(true)
    var eCkpt = checkpointRdd(e)
    val stats = scala.collection.mutable.Buffer[(Int, Long, Long)]()
    var prevNe = -1L
    for (r <- 0 to rounds) {
      val ne = e.count()
      val nv = e.select(col("lo").as("v"))
        .union(e.select(col("hi").as("v"))).distinct().count()
      stats += ((r, nv, ne))
      // fixpoint early-exit: an unchanged edge count means the previous
      // peel removed nothing; the keep test is a deterministic function
      // of the edge set, so every later round repeats these exact stats
      // — fill them without running the rounds (output-identical)
      if (ne == prevNe && r < rounds) {
        for (rr <- (r + 1) to rounds) stats += ((rr, nv, ne))
        eCkpt.foreach(_.unpersist(false)) // only stats leave this fn
        return stats.toSeq
      }
      prevNe = ne
      if (r < rounds && ne > 0) {
        val deg = e.select(col("lo").as("v"))
          .union(e.select(col("hi").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        val keep = deg.where(col("deg") * nv > lit(3L) * ne).select(col("v"))
          .localCheckpoint(true)
        e = e.join(keep.select(col("v").as("lo")), Seq("lo"), "left_semi")
          .join(keep.select(col("v").as("hi")), Seq("hi"), "left_semi")
          .localCheckpoint(true)
        // new e is materialized: old e and this round's keep are dead
        eCkpt.foreach(_.unpersist(false))
        checkpointRdd(keep).foreach(_.unpersist(false))
        eCkpt = checkpointRdd(e)
      } else if (ne == 0 && r < rounds) {
        // graph exhausted: remaining rounds are all-empty
        for (rr <- (r + 1) to rounds) stats += ((rr, 0L, 0L))
        eCkpt.foreach(_.unpersist(false)) // only stats leave this fn
        return stats.toSeq
      }
    }
    eCkpt.foreach(_.unpersist(false)) // only stats leave this fn
    stats.toSeq
  }
}
