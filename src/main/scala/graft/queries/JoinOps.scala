package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.util.Det._
import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}

/** Oracle-checked driver entries for the composed join operators
  * (AsOfJoin, RangeJoin) — the operators themselves are spec-tested
  * against brute force; these queries hash-verify them end-to-end
  * against DuckDB on the driver fixtures. */
object JoinOps {

  def defs: Seq[QDef] = Seq(q30, q31, q64, q65)

  /** AS-OF join over the events stream: for each purchase, the user's
    * latest preceding view (the attribution lookup). Views are
    * pre-deduped to one per (user, instant) so ties cannot make the
    * match nondeterministic in either engine. */
  private val q30 = QDef(
    "q30_asof_purchase_view",
    """WITH v AS (
      |  SELECT user_id, epoch_us(ts) AS us, MAX(value) AS v_value
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, epoch_us(ts)),
      |p AS (
      |  SELECT user_id, epoch_us(ts) AS us, value AS p_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, p.us, p.p_value,
      |  (SELECT v.v_value FROM v WHERE v.user_id = p.user_id AND v.us <= p.us
      |   ORDER BY v.us DESC LIMIT 1) AS v_value,
      |  (SELECT v.us FROM v WHERE v.user_id = p.user_id AND v.us <= p.us
      |   ORDER BY v.us DESC LIMIT 1) AS matched_ts
      |FROM p ORDER BY p.user_id, p.us, p.p_value""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("value").as("p_value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("us"))
      .agg(max(col("value")).as("v_value"))
    AsOfJoin.leftAsOf(purchases, views, "user_id", "us")
      .select(col("user_id"), col("us"), col("p_value"),
        col("v_value"), col("matched_ts"))
      .orderBy(col("user_id"), col("us"), col("p_value"))
  }

  /** Range join: deterministic account-balance points against key-
    * derived 1-D intervals through the bin-partitioned path; the
    * oracle is the plain BETWEEN join. */
  private val q31 = QDef(
    "q31_range_point_interval",
    """SELECT c.c_custkey, p.p_partkey
      |FROM customer c JOIN part p
      |  ON ((c.c_custkey * 48271) % 10007) % 1000 + 0.5
      |       BETWEEN ((p.p_partkey * 40503) % 9973) % 990
      |           AND ((p.p_partkey * 40503) % 9973) % 990 + (p.p_partkey % 13) + 1
      |ORDER BY c_custkey, p_partkey""".stripMargin) { (s, d) =>
    val points = Tables.customer(s, d).select(col("c_custkey"),
      expr("CAST((c_custkey * 48271) % 10007 % 1000 AS DOUBLE) + 0.5").as("x"))
    val intervals = Tables.part(s, d).select(col("p_partkey"),
      expr("CAST((p_partkey * 40503) % 9973 % 990 AS DOUBLE)").as("lo"),
      expr("CAST((p_partkey * 40503) % 9973 % 990 + p_partkey % 13 + 1 AS DOUBLE)").as("hi"))
    RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = 50.0)
      .select(col("c_custkey"), col("p_partkey"))
      .orderBy(col("c_custkey"), col("p_partkey"))
  }

  /** Entity resolution by the sorted-neighborhood method (Hernandez &
    * Stolfo 1995): rank records by a sort key, compare only records
    * within a fixed window w of each other — O(N·w) comparisons instead
    * of per-block quadratic pair work. Distributed shape: the global
    * rank is a range partition + per-partition offsets (the only
    * unpartitioned window reads the P-row partition-count table), and
    * the windowed pairing is a plain equi-join on rank+delta, so the
    * shuffle carries rank keys — never the cross product. The verify
    * stage (Levenshtein + field features) runs on the O(N·w) candidate
    * set only. w and the similarity threshold are the recall knobs. */
  private val q64 = QDef(
    "q64_entity_resolution",
    """WITH r AS (
      |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
      |    ROW_NUMBER() OVER (ORDER BY c_name) AS rk
      |  FROM customer)
      |SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev,
      |  a.c_mktsegment = b.c_mktsegment AS same_segment,
      |  abs(a.c_acctbal - b.c_acctbal) AS bal_gap,
      |  CAST((3 - levenshtein(a.c_name, b.c_name)) * 10
      |    + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 5 ELSE 0 END
      |    AS BIGINT) AS score
      |FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 5
      |WHERE levenshtein(a.c_name, b.c_name) <= 2
      |ORDER BY a_key, b_key""".stripMargin) { (s, d) =>
    import graft.util.Persist.Syntax
    val w = org.apache.spark.sql.expressions.Window
    val c = Tables.customer(s, d)
    // scale-safe global rank: range partition on the sort key, then
    // offset(partition) + local row_number — the unpartitioned window
    // below touches only the P-row per-partition count table
    val ranged = c.repartitionByRange(8, col("c_name"))
      .withColumn("pid", spark_partition_id()).persistTracked()
    val offs = ranged.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .withColumn("off", sum(col("c")).over(w.orderBy(col("pid"))) - col("c"))
      .select(col("pid"), col("off"))
    val rk = ranged.join(broadcast(offs), "pid")
      .withColumn("rk", col("off") +
        row_number().over(w.partitionBy(col("pid"))
          .orderBy(col("c_name"), col("c_custkey"))))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"), col("rk"))
      .persistTracked()
    val probes = rk
      .withColumn("d", explode(expr("sequence(1, 5)")))
      .select(col("c_custkey").as("a_key"), col("c_name").as("a_name"),
        col("c_acctbal").as("a_bal"), col("c_mktsegment").as("a_seg"),
        (col("rk") + col("d")).as("b_rk"))
    val build = rk.select(col("rk").as("b_rk"), col("c_custkey").as("b_key"),
      col("c_name").as("b_name"), col("c_acctbal").as("b_bal"),
      col("c_mktsegment").as("b_seg"))
    probes.join(build, "b_rk")
      .withColumn("lev", levenshtein(col("a_name"), col("b_name")))
      .where(col("lev") <= 2)
      .select(col("a_key"), col("b_key"), col("lev").cast("long").as("lev"),
        (col("a_seg") === col("b_seg")).as("same_segment"),
        abs(col("a_bal") - col("b_bal")).as("bal_gap"),
        ((lit(3) - col("lev")) * 10 +
          when(col("a_seg") === col("b_seg"), 5).otherwise(0))
          .cast("long").as("score"))
      .orderBy(col("a_key"), col("b_key"))
  }

  /** The skew-salted join serving a driver-checked query: events (the
    * skewed fact — one hot user dominates a shuffle partition at scale)
    * join the customer dimension through [[SkewJoin.salted]], which
    * spreads each probe key over 8 salt buckets and replicates the
    * build side 8x, then roll up to segment totals. The salt never
    * reaches the result, so the oracle is the plain join formulation —
    * proving the rewrite is semantics-preserving end-to-end, not just
    * spec-level. */
  private val q65 = QDef(
    "q65_skew_salted_join",
    s"""SELECT c_mktsegment, COUNT(*) AS n_events,
       |  ${sqlDsum("value")} AS total_value
       |FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val probe = Tables.events(s, d).select(col("user_id"), col("value"))
    val build = Tables.customer(s, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    SkewJoin.salted(probe, build, Seq("user_id"), buckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("c_mktsegment"))
  }
}
