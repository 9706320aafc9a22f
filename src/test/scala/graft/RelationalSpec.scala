package graft

import graft.queries.Relational

class RelationalSpec extends GraftSuite {

  for (q <- Relational.defs) {
    test(s"${q.name} executes at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q01 has 6 return/status groups") {
    assert(SparkEntry.queries("q01_pricing_summary")(spark, sf).count() == 6)
  }

  test("q16 preserves all 25 nations via left join") {
    assert(SparkEntry.queries("q16_nation_customers")(spark, sf).count() == 25)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("q39: sweep-line peaks equal brute-force interval overlap counts") {
    import SparkTestBase.spark.implicits._
    val out = SparkEntry.queries("q39_peak_concurrency")(spark, sf)
      .select("hr", "max_concurrency").as[(Long, Long)].collect().toMap
    val sessions = SparkEntry.queries("q20_user_sessions")(spark, sf)
      .select("start_us", "end_us").as[(Long, Long)].collect()
    val byHr = sessions.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(_ / 3600000000L)
    assert(out.keySet == byHr.keySet)
    byHr.foreach { case (hr, points) =>
      val brute = points.distinct
        .map(t => sessions.count { case (a, b) => a <= t && t <= b }.toLong).max
      assert(out(hr) == brute, s"hour $hr: sweep ${out(hr)} != brute $brute")
    }
  }

  test("q37 ema: first event per user equals its value; replay matches") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q37_ema_decay")(spark, sf)
      .select("user_id", "us", "event_id", "ema").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val vals = graft.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")), col("value")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((_, g) <- out.groupBy(_._1)) {
      val ordered = g.sortBy(e => (e._2, e._3))
      assert(ordered.head._4 == vals(ordered.head._3)._2,
        "no history: ema == value")
      // replay the unrolled chain in the same left-to-right order
      for ((e, i) <- ordered.zipWithIndex) {
        var ema = 0.0
        for (k <- 0 to math.min(i, 20))
          ema += vals(ordered(i - k)._3)._2 * math.pow(2.0, -k)
        assert(e._4 == ema, s"event ${e._3}: ema ${e._4} != replay $ema")
      }
    }
  }
}
