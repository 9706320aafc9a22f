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
}
