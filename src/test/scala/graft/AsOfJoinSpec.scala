package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join vs brute-force oracle (greatest right ts <= left ts per
  * key), plus tolerance and plan-shape checks. */
class AsOfJoinSpec extends GraftSuite {
  import SparkTestBase.spark.implicits._

  // trades (left): 300 rows over 7 keys; quotes (right): sparser, with
  // keys that have no quote at all and quotes after the last trade
  private lazy val trades = spark.range(0, 300).select(
    (col("id") % 7).as("k"),
    (col("id") * 37 % 1000).as("ts"),
    col("id").as("trade_id"))
  private lazy val quotes = spark.range(0, 60).select(
    (col("id") % 5).as("k"),
    (col("id") * 91 % 997).as("ts"),
    (col("id") * 10).as("px"))

  private def brute: Map[(Long, Long, Long), Option[(Long, Long)]] = {
    val ts = trades.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val qs = quotes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ts.map { case (k, t, id) =>
      val eligible = qs.filter(q => q._1 == k && q._2 <= t)
      val best = if (eligible.isEmpty) None
        else { val m = eligible.maxBy(_._2); Some((m._3, m._2)) }
      (k, t, id) -> best
    }.toMap
  }

  test("as-of join equals brute-force latest-quote-per-trade") {
    val got = AsOfJoin.leftAsOf(trades, quotes, "k", "ts")
      .select(col("k"), col("ts"), col("trade_id"), col("px"), col("matched_ts"))
      .collect()
    assert(got.length == 300) // left join: every trade exactly once
    val expected = brute
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getLong(2))
      expected(key) match {
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4), s"expected no match for $key")
        case Some((px, qts)) =>
          assert(!r.isNullAt(3) && r.getLong(3) == px && r.getLong(4) == qts,
            s"wrong match for $key: got ${r.getLong(3)}@${r.getLong(4)}, want $px@$qts")
      }
    }
  }

  test("tolerance nulls out stale matches") {
    val got = AsOfJoin.leftAsOf(trades, quotes, "k", "ts", tolerance = 50L)
      .select(col("k"), col("ts"), col("trade_id"), col("px"), col("matched_ts"))
      .collect()
    val expected = brute
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getLong(2))
      expected(key).filter { case (_, qts) => key._2 - qts <= 50L } match {
        case None => assert(r.isNullAt(3), s"stale match survived for $key")
        case Some((px, _)) => assert(r.getLong(3) == px)
      }
    }
  }

  test("plan: one shuffle on the key, no range join explosion") {
    val df = AsOfJoin.leftAsOf(trades, quotes, "k", "ts")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of join degenerated:\n$p")
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(k"))
    assert(shuffles <= 2, s"too many key shuffles ($shuffles):\n$p")
  }
  test("NULL in the matched right row is preserved, not papered over") {
    import java.lang.{Long => JLong}
    val q = Seq[(Long, Long, JLong)]((1L, 1L, JLong.valueOf(10L)), (1L, 2L, null))
      .toDF("k", "ts", "px")
    val t = Seq((1L, 3L, 100L)).toDF("k", "ts", "trade_id")
    val row = AsOfJoin.leftAsOf(t, q, "k", "ts")
      .select("px", "matched_ts").head()
    // the as-of match is the ts=2 quote whose px IS null
    assert(row.isNullAt(0), s"expected null px, got ${row}")
    assert(row.getLong(1) == 2L)
  }

  test("timestamp ts columns: tolerance is microseconds") {
    val base = 1700000000000L
    val q = Seq((1L, new java.sql.Timestamp(base), 10L))
      .toDF("k", "ts", "px")
    val t = Seq((1L, new java.sql.Timestamp(base + 3000L), 100L)) // +3s
      .toDF("k", "ts", "trade_id")
    // 5-second tolerance (micros): the 3s-old quote is fresh
    val fresh = AsOfJoin.leftAsOf(t, q, "k", "ts", tolerance = 5000000L).head()
    assert(!fresh.isNullAt(fresh.fieldIndex("px")))
    // 1-second tolerance: stale
    val stale = AsOfJoin.leftAsOf(t, q, "k", "ts", tolerance = 1000000L).head()
    assert(stale.isNullAt(stale.fieldIndex("px")))
  }
}
