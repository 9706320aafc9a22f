package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch: the scale-safe rank machinery (util.Rank) pinned
  * against Spark's own single-partition window functions, plus
  * single-node replays for the decorrelation shapes (q78) and the χ²
  * drift statistic (t50).
  */
class Round6OpsSpec extends GraftSuite {

  test("Rank.globalRowNumber equals the single-window row_number") {
    import graft.util.Rank
    val df = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    // a non-unique leading sort key forces the tiebreak path
    val sort = Seq(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
    val got = Rank.globalRowNumber(df, sort, numParts = 5)
      .select(col("c_custkey"), col("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df
      .withColumn("rk", row_number().over(Window.orderBy(sort: _*)).cast("long"))
      .select(col("c_custkey"), col("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.util.Persist.releaseAll()
    assert(got == want)
  }

  test("Rank.ntileOf equals native ntile for every n mod k residue") {
    import graft.util.Rank
    // k=5 with n = 23 (r=3), 25 (r=0), 7 (n>k, q=1), 4 (n<k → q=0 branch)
    for (n <- Seq(4, 7, 23, 25)) {
      val df = spark.range(1, n + 1).toDF("rk")
        .withColumn("n", lit(n.toLong))
      val got = df.select(col("rk"),
        Rank.ntileOf(col("rk"), col("n"), 5).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = spark.range(1, n + 1).toDF("id")
        .withColumn("b", ntile(5).over(Window.orderBy(col("id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n")
    }
  }

  test("q78: waiting-supplier counts equal a correlated-EXISTS replay") {
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_suppkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ords = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderstatus",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sixtyDaysUs = 60L * 86400 * 1000000L
    // the textbook form: per late (order, supp) pair on an F order,
    // EXISTS another supplier on the order, NOT EXISTS another LATE one
    val byOrder = li.groupBy(_._1)
    val waiting = li.iterator
      .filter { case (ok, sk, ship) =>
        ords.get(ok).exists { case (st, od) =>
          st == "F" && ship > od + sixtyDaysUs
        }
      }
      .map(l => (l._1, l._2)).toSet[(Long, Long)]
      .filter { p =>
        val (ok, sk) = p
        val others = byOrder(ok).filter(_._2 != sk)
        val od = ords(ok)._2
        others.nonEmpty && !others.exists(_._3 > od + sixtyDaysUs)
      }
    val want = waiting.toSeq.groupBy(p => sup(p._2))
      .map { case (name, ps) => name -> ps.size.toLong }
    val got = SparkEntry.queries("q78_waiting_suppliers")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.util.Persist.releaseAll()
    // q78 returns the top-20; the replay has everything — compare the cut
    val top = want.toSeq.sortBy { case (n, c) => (-c, n) }.take(20).toMap
    assert(got == top)
  }

  test("t50: chi2 equals a histogram replay") {
    val docs = Tables.documents(spark, sf).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val lens = docs.flatMap { case (src, text) =>
      text.split("\\s+").filter(_.nonEmpty).map(t => (src, math.min(t.length, 11)))
    }
    val nn = lens.length.toDouble
    val cb = lens.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    val bySrc = lens.groupBy(_._1)
    val want = bySrc.map { case (src, xs) =>
      val ns = xs.length.toDouble
      val o = xs.groupBy(_._2).map { case (b, ys) => b -> ys.length }
      val terms = cb.keys.toSeq.sorted.map { b =>
        val e = cb(b) / nn * ns
        val ob = o.getOrElse(b, 0).toDouble
        (ob - e) * (ob - e) / e
      }
      // mirror Det.dsum: round each addend to 6 dp, exact decimal sum
      val chi = terms.foldLeft(java.math.BigDecimal.ZERO)((acc, x) =>
        acc.add(new java.math.BigDecimal(x)
          .setScale(6, java.math.RoundingMode.HALF_UP))).doubleValue
      src -> chi
    }
    val got = SparkEntry.queries("t50_length_drift_chi2")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    graft.util.Persist.releaseAll()
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(got(k) == v, s"source $k")
  }

  test("d24: core flags satisfy the k-core structural invariants") {
    val rows = SparkEntry.queries("d24_kcore_decomposition")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getLong(4)))
    graft.util.Persist.releaseAll()
    assert(rows.nonEmpty)
    for ((id, deg, in2, in3, d2) <- rows) {
      if (in3) assert(in2, s"$id: 3-core must nest inside 2-core")
      if (!in2) assert(d2 == 0L, s"$id: outside the 2-core but has core degree")
      if (in2) assert(deg >= 2, s"$id: 2-core member with original degree < 2")
      // converged-within-5-rounds check: every 2-core member must keep
      // degree ≥ 2 INSIDE the core subgraph (true only at a fixed point)
      if (in2) assert(d2 >= 2, s"$id: unconverged 2-core membership")
      if (in3) assert(deg >= 3, s"$id: 3-core member with original degree < 3")
    }
    // the fixture's dup graph has genuine cores and genuine periphery
    assert(rows.exists(_._3) && rows.exists(!_._3))
  }

  test("Components.kCorePeel equals a driver-side peel replay") {
    // triangle {1,2,3} + pendant chain 3-4-5 + star hub 6 with leaves
    // 7..10 + K4 {20,21,22,23}: exercises 2-core (triangle, K4), 3-core
    // (K4 only), and tree-like periphery that must peel away
    val undirected = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (6L, 8L), (6L, 9L), (6L, 10L),
      (20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L), (21L, 23L), (22L, 23L))
    val edges = spark.createDataFrame(
      undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) })
      .toDF("src", "dst")
    def replay(k: Int): Set[Long] = {
      var adj = undirected.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      for (_ <- 1 to 5) {
        val deg = adj.groupBy(_._1).map { case (v, es) => v -> es.size }
        val keep = deg.filter(_._2 >= k).keySet
        adj = adj.filter { case (a, b) => keep(a) && keep(b) }
      }
      adj.map(_._1).toSet
    }
    for (k <- Seq(2, 3)) {
      val (v, e) = graft.operators.Components.kCorePeel(edges, k, 5)
      val gotV = v.collect().map(_.getLong(0)).toSet
      val want = replay(k)
      assert(gotV == want, s"k=$k: got $gotV want $want")
      // surviving edges connect only surviving vertices, both directions
      val gotE = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotE.forall { case (a, b) => want(a) && want(b) && gotE((b, a)) })
    }
    assert(replay(3) == Set(20L, 21L, 22L, 23L)) // fixture sanity
  }

  test("Components.kTrussPeel equals a driver-side support replay") {
    // K4 {20..23} (every edge support 2) + triangle with a pendant
    // (1,2,3 + 3-4) + a 4-cycle {30..33} (2-core but ZERO triangles —
    // the case that separates truss from core) + star hub 6
    val undirected = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L), (21L, 23L), (22L, 23L),
      (30L, 31L), (31L, 32L), (32L, 33L), (30L, 33L),
      (6L, 7L), (6L, 8L))
    val edges = spark.createDataFrame(
      undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) })
      .toDF("src", "dst")
    def replay(k: Int, rounds: Int): Set[(Long, Long)] = {
      var u = undirected.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      for (_ <- 1 to rounds) {
        val nbrs = u.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
        u = u.filter { case (a, b) =>
          (nbrs(a) intersect nbrs(b)).size >= k - 2
        }
      }
      u
    }
    val got = graft.operators.Components.kTrussPeel(edges, 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = replay(3, 3)
    assert(got == want, s"got $got want $want")
    // fixture sanity: triangle + K4 survive, 4-cycle and trees peel away
    assert(want == Set((1L, 2L), (1L, 3L), (2L, 3L),
      (20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L), (21L, 23L), (22L, 23L)))
  }

  test("peel fixpoint early-exit: converged fixtures stop before the round budget") {
    // K4 {20..23} is already a 2-core/3-core fixpoint: round 1 peels the
    // pendant, round 2 re-confirms (count unchanged) — so kCorePeel must
    // run 2 rounds of its 5-round budget, and the output must equal the
    // full-budget answer (monotonicity makes early exit output-identical)
    val undirected = Seq((20L, 21L), (20L, 22L), (20L, 23L),
      (21L, 22L), (21L, 23L), (22L, 23L), (23L, 24L)) // K4 + pendant 24
    val edges = spark.createDataFrame(
      undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) })
      .toDF("src", "dst")
    val (v2, _) = graft.operators.Components.kCorePeel(edges, 2, 5)
    assert(v2.collect().map(_.getLong(0)).toSet == Set(20L, 21L, 22L, 23L))
    assert(graft.operators.Components.lastPeelRounds == 2,
      s"expected early exit at round 2, ran ${graft.operators.Components.lastPeelRounds}")
    val u3 = graft.operators.Components.kTrussPeel(edges, 3, 3)
    assert(u3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L), (21L, 23L), (22L, 23L)))
    assert(graft.operators.Components.lastTrussRounds == 2,
      s"expected early exit at round 2, ran ${graft.operators.Components.lastTrussRounds}")
    // a fixture that genuinely needs the budget still runs it: a 6-chain
    // peels one layer per round under k=2 until empty (no premature exit)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val chainEdges = spark.createDataFrame(
      chain.flatMap { case (a, b) => Seq((a, b), (b, a)) }).toDF("src", "dst")
    val (vc, _) = graft.operators.Components.kCorePeel(chainEdges, 2, 5)
    assert(vc.collect().isEmpty)
    assert(graft.operators.Components.lastPeelRounds >= 3)
  }

  test("Components.densestPeel density improves toward the densest cluster") {
    // K5 {50..54} (density 2.0) + sparse periphery: chain 1-2-3-4 and
    // star 6-(7,8,9); the peel must discard the periphery and land on
    // the K5 as the best round
    val k5 = for (a <- 50L to 54L; b <- (a + 1) to 54L) yield (a, b)
    val undirected = k5 ++ Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (6L, 7L), (6L, 8L), (6L, 9L))
    val u = spark.createDataFrame(undirected.map(identity)).toDF("lo", "hi")
    val stats = graft.operators.Components.densestPeel(u, 6)
    assert(stats.size == 7 && stats.head == ((0, 13L, 16L)))
    val dens = stats.map { case (r, nv, ne) =>
      (r, if (nv == 0) 0.0 else ne.toDouble / nv)
    }
    val best = dens.maxBy(_._2)
    // the K5 alone has density 10/5 = 2.0; the full graph 16/13 ≈ 1.23
    assert(best._2 == 2.0, s"peel should isolate the K5: $stats")
    // driver-side replay of the integer keep rule
    def replay(): Seq[(Int, Long, Long)] = {
      var e = undirected.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val out = scala.collection.mutable.Buffer[(Int, Long, Long)]()
      for (r <- 0 to 6) {
        val vs = e.flatMap(p => Seq(p._1, p._2))
        out += ((r, vs.size.toLong, e.size.toLong))
        if (r < 6 && e.nonEmpty) {
          val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
            .groupBy(identity).map { case (v, xs) => v -> xs.size }
          val keep = deg.filter { case (_, dg) =>
            dg.toLong * vs.size > 3L * e.size
          }.keySet
          e = e.filter(p => keep(p._1) && keep(p._2))
        }
      }
      out.toSeq
    }
    assert(stats == replay(), s"got $stats want ${replay()}")
  }

  test("v38: knn graph mutual flags are symmetric and ranks bounded") {
    val g = SparkEntry.queries("v38_knn_graph")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getBoolean(4)))
    graft.util.Persist.releaseAll()
    assert(g.nonEmpty)
    val edges = g.map(e => (e._1, e._2)).toSet
    for ((v, nb, sim, rank, mutual) <- g) {
      assert(rank >= 1 && rank <= 3)
      assert(sim <= 1.0 + 1e-9 && sim >= -1.0 - 1e-9)
      assert(mutual == edges.contains((nb, v)), s"($v,$nb) mutual flag")
    }
    // per-vertex ranks are dense from 1
    g.groupBy(_._1).foreach { case (v, es) =>
      assert(es.map(_._4).sorted.toSeq == (1 to es.length).toSeq, s"vertex $v")
    }
  }

  test("sp19: Gi* z-scores sum to ~0 under the null normalization") {
    val z = SparkEntry.queries("sp19_getis_ord_gi")(spark, sf)
      .select("gi_star").collect().map(_.getDouble(0))
    graft.util.Persist.releaseAll()
    assert(z.length > 10)
    // Gi* is a z-score: the lattice mean must be near zero and the
    // spread near 1 (loose structural bounds, not a hash — the hash is
    // the oracle's job)
    val mean = z.sum / z.length
    assert(math.abs(mean) < 0.5, s"mean $mean")
    assert(z.exists(v => math.abs(v) > 0.5))
  }

  test("q79: quintile buckets are reshuffle-invariant") {
    val q = SparkEntry.queries("q79_rfm_segments")(spark, sf)
    val a = q.collect().toSeq
    graft.util.Persist.releaseAll()
    val b = SparkEntry.queries("q79_rfm_segments")(spark, sf).collect().toSeq
    graft.util.Persist.releaseAll()
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("q81: small-qty revenue equals a correlated-AVG replay") {
    // textbook Q17 form: qty < 0.2 * avg(qty per part), revenue / 7 —
    // replayed with exact rational arithmetic (qty*5*cnt < sumQty)
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val parts = Tables.part(spark, sf)
      .where(col("p_brand") === "Brand#4" && col("p_type") === "MEDIUM")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val byPart = li.groupBy(_._1)
    val sumQty = byPart.map { case (k, v) => k -> v.map(_._2).sum }
    val cnt = byPart.map { case (k, v) => k -> v.size }
    val rev = li.filter { case (pk, qty, _) =>
      parts.contains(pk) && qty * 5 * cnt(pk) < sumQty(pk)
    }.map(_._3).sum
    val want = rev / 7.0
    val got = SparkEntry.queries("q81_small_qty_revenue")(spark, sf)
      .head().getDouble(0)
    graft.util.Persist.releaseAll()
    assert(math.abs(got - want) < 1e-6 * math.max(1.0, math.abs(want)),
      s"got $got want $want")
  }

  test("q82: churned-rich counts equal a threshold+recency replay") {
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val recent = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val nations = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val pos = cust.filter(_._3 > 0)
    val (sumBal, n) = (pos.map(_._3).sum, pos.length)
    val target = Set(1, 3, 5, 7, 9, 11, 13)
    val want = cust.filter { case (ck, nk, bal) =>
      target.contains(nk) && bal * n > sumBal && !recent.contains(ck)
    }.groupBy(t => nations(t._2))
      .map { case (nm, v) => nm -> v.length }
    val got = SparkEntry.queries("q82_churned_rich_customers")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    graft.util.Persist.releaseAll()
    assert(got == want, s"got $got want $want")
  }
}
