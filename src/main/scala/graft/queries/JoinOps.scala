package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.operators.{AsOfJoin, RangeJoin}

/** Oracle-checked driver entries for the composed join operators
  * (AsOfJoin, RangeJoin) — the operators themselves are spec-tested
  * against brute force; these queries hash-verify them end-to-end
  * against DuckDB on the driver fixtures. */
object JoinOps {

  def defs: Seq[QDef] = Seq(q30, q31)

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
}
