package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.util.Det._
import graft.util.Persist.Syntax

/** Relational operator coverage (SURVEY §2.B): scans, filters, joins of
  * every flavor, aggregation incl. grouping sets, windows, set ops,
  * subqueries, top-k — written DataFrame-first so Catalyst owns the
  * physical strategy (broadcast vs shuffle, pushdown, AQE).
  *
  * Scale posture: dimension tables (`region`, `nation` — fixed 5/25 rows
  * at any SF) are explicitly `broadcast()`; fact-fact joins shuffle on
  * their keys and aggregations are partial-first (Spark hash-agg), so
  * every plan here survives a 1000-executor 100 TB run unchanged.
  */
object Relational {

  def defs: Seq[QDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q23, q24, q25, q27, q28, q29,
    q40, q46, q58, q60, q62, q63, q66, q67, q68, q69, q70, q72, q73,
    q75, q76, q77, q78, q81, q82, q83, q84, q85, q86, q87, q88, q89)

  /** TPC-H Q1 pricing summary: single-pass hash aggregate, map-side
    * partial agg, 6-group output. Reference surface: DataFusion agg
    * (SURVEY §2.B "Aggregation"). */
  private val q01 = QDef(
    "q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS sum_disc_price,
       |  ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax)")} AS sum_charge,
       |  ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty,
       |  ${sqlDsum("l_extendedprice")} / COUNT(*) AS avg_price,
       |  ${sqlDsum("l_discount")} / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6 forecast: pure filter + global agg — the whole query is one
    * parquet scan with pushed predicates, no shuffle beyond final merge. */
  private val q02 = QDef(
    "q02_revenue_forecast",
    s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_discount").between(0.05, 0.07))
      .filter(col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
  }

  /** TPC-H Q3 shipping priority: 3-way join (dim filter pushed below the
    * join), grouped revenue, top-10. customer filter shrinks the build
    * side so AQE broadcasts it at bench scale. */
  private val q03 = QDef(
    "q03_shipping_priority",
    s"""SELECT l_orderkey,
       |  ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue,
       |  o_orderdate, o_orderpriority
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderdate, l_orderkey
       |LIMIT 10""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** Semi join (EXISTS): orders having at least one heavy lineitem.
    * `left_semi` keeps the probe side streaming — no row duplication. */
  private val q04 = QDef(
    "q04_priority_semijoin",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val heavy = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    Tables.orders(s, d)
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q5 local-supplier volume: 6-way join; `nation`/`region` are
    * broadcast (25/5 rows at every SF), fact joins shuffle on keys. */
  private val q05 = QDef(
    "q05_region_volume",
    s"""SELECT n_name,
       |  ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    val asia = broadcast(
      Tables.nation(s, d).join(
        broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    Tables.lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(asia, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Anti join (NOT EXISTS): customers with no large order. */
  private val q06 = QDef(
    "q06_idle_customers",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Ranking window: top-3 orders per market segment by total price.
    * One shuffle on the partition key, in-partition sort. */
  private val q07 = QDef(
    "q07_segment_top_orders",
    """SELECT c_mktsegment, o_orderkey, o_totalprice, rn
      |FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 3
      |ORDER BY c_mktsegment, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** Analytic window frame: per-customer running order total + previous
    * order gap (lag). ROWS frame, deterministic tie-break on orderkey. */
  private val q08 = QDef(
    "q08_running_totals",
    s"""SELECT o_custkey, o_orderkey,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
       |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       |  LAG(o_orderkey) OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
       |FROM orders
       |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(30,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_orderkey", lag(col("o_orderkey"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("prev_orderkey"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** ROLLUP grouping sets with GROUPING() discriminators. */
  private val q09 = QDef(
    "q09_rollup_returns",
    s"""SELECT l_returnflag, l_linestatus,
       |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
       |  ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"),
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("g_rf"),
        col("g_ls"), col("sum_qty"), col("n"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
  }

  /** Set operations: INTERSECT / EXCEPT / UNION ALL over key sets. */
  private val q10 = QDef(
    "q10_set_ops",
    """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000)
      |SELECT 'both' AS tag, c_custkey FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big)
      |UNION ALL
      |SELECT 'only_building' AS tag, c_custkey FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big)
      |ORDER BY tag, c_custkey""".stripMargin) { (s, d) =>
    val building = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey")).distinct()
    building.intersect(big).withColumn("tag", lit("both"))
      .unionByName(building.except(big).withColumn("tag", lit("only_building")))
      .select(col("tag"), col("c_custkey"))
      .orderBy(col("tag"), col("c_custkey"))
  }

  /** Multi-distinct aggregation (expand-based in Spark). */
  private val q11 = QDef(
    "q11_distinct_agg",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part,
      |  COUNT(DISTINCT l_orderkey) AS n_ord
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_orderkey")).as("n_ord"))
      .orderBy(col("l_returnflag"))
  }

  /** Correlated scalar subquery: parts priced above their type's mean.
    * Expressed as window mean (identical semantics, one shuffle). */
  private val q12 = QDef(
    "q12_above_type_avg",
    s"""SELECT p_partkey, p_name, p_type, p_retailprice
       |FROM (
       |  SELECT p_partkey, p_name, p_type, p_retailprice,
       |    CAST(SUM(CAST(p_retailprice AS DECIMAL(30,6))) OVER (PARTITION BY p_type) AS DOUBLE)
       |      / COUNT(*) OVER (PARTITION BY p_type) AS type_avg
       |  FROM part)
       |WHERE p_retailprice > CAST(1.05 AS DOUBLE) * type_avg
       |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("p_type"))
    Tables.part(s, d)
      .withColumn("type_avg",
        sum(col("p_retailprice").cast("decimal(30,6)")).over(w).cast("double")
          / count(lit(1)).over(w))
      .filter(col("p_retailprice") > lit(1.05) * col("type_avg"))
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** Top-k with dimension join: 20 largest orders + customer attributes. */
  private val q13 = QDef(
    "q13_top_orders",
    """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q14-style conditional aggregation: promo revenue share. */
  private val q14 = QDef(
    "q14_promo_share",
    s"""SELECT
       |  CAST(100.0 AS DOUBLE) * ${sqlDsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) ELSE CAST(0.0 AS DOUBLE) END")}
       |    / ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS promo_revenue_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin) { (s, d) =>
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * dsum(when(col("p_type").like("PROMO%"), rev).otherwise(lit(0.0)))
        / dsum(rev)).as("promo_revenue_pct"))
  }

  /** GROUP BY + HAVING: suppliers above a shipped-revenue threshold. */
  private val q15 = QDef(
    "q15_top_suppliers",
    s"""SELECT l_suppkey, ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS total_rev,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |GROUP BY l_suppkey
       |HAVING COUNT(*) > 100
       |ORDER BY l_suppkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_rev"),
        count(lit(1)).as("n_items"))
      .filter(col("n_items") > 100)
      .orderBy(col("l_suppkey"))
  }

  /** Outer join preserving empty groups: per-nation customer counts where
    * nations without customers still appear (count 0). */
  private val q16 = QDef(
    "q16_nation_customers",
    """SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_customers
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_nationkey, n_name
      |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    broadcast(Tables.nation(s, d))
      .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"))
      .orderBy(col("n_nationkey"))
  }

  /** Date bucketing: monthly order volume/revenue via string month key
    * (string keys sidestep timestamp-unit mismatches with the oracle). */
  private val q17 = QDef(
    "q17_monthly_orders",
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS revenue
       |FROM orders
       |GROUP BY strftime(o_orderdate, '%Y-%m')
       |ORDER BY month""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("month"))
  }

  /** Correlated EXISTS with a non-equi correlation term — exercises
    * Catalyst subquery decorrelation; same SQL runs on both engines. */
  private val q23 = QDef(
    "q23_correlated_exists",
    """SELECT o_orderkey, o_totalprice FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql("""SELECT o_orderkey, o_totalprice FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
      |ORDER BY o_orderkey""".stripMargin)
  }

  /** Full CUBE grouping sets with GROUPING discriminators. */
  private val q24 = QDef(
    "q24_cube",
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g1, GROUPING(l_linestatus) AS g2,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql("""SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g1, GROUPING(l_linestatus) AS g2,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag, l_linestatus""".stripMargin)
  }

  /** Exact interpolated percentiles (Spark `percentile` = DuckDB
    * `quantile_cont`: same sorted-interpolation definition). */
  private val q25 = QDef(
    "q25_percentiles",
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.9) AS p90,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql("""SELECT o_orderpriority,
      |  percentile(o_totalprice, 0.5) AS p50,
      |  percentile(o_totalprice, 0.9) AS p90,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** String functions: LIKE, upper, substring, length, concat. */
  private val q18 = QDef(
    "q18_string_funcs",
    """SELECT p_brand, UPPER(SUBSTRING(p_name, 1, 5)) AS prefix,
      |  COUNT(*) AS n, MIN(LENGTH(p_name)) AS min_len
      |FROM part
      |WHERE p_name LIKE '%bolt%' OR p_name LIKE '%widget%'
      |GROUP BY p_brand, UPPER(SUBSTRING(p_name, 1, 5))
      |ORDER BY p_brand, prefix""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_name").like("%bolt%") || col("p_name").like("%widget%"))
      .groupBy(col("p_brand"), upper(substring(col("p_name"), 1, 5)).as("prefix"))
      .agg(count(lit(1)).as("n"), min(length(col("p_name"))).as("min_len"))
      .orderBy(col("p_brand"), col("prefix"))
  }
  /** Window-function breadth: ntile, percent_rank, cume_dist, lead, and
    * nth_value with an explicit full frame (the default frames differ
    * between engines for nth_value, so the frame is pinned in both).
    * One shuffle on the partition key, as any per-key ordering. */
  private val q27 = QDef(
    "q27_window_suite",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(ntile(3) OVER w AS BIGINT) AS tile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  lead(l_quantity, 1) OVER w AS next_qty,
      |  nth_value(l_quantity, 2) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_qty
      |FROM lineitem WHERE l_orderkey < 800
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 800)
      .select(col("l_orderkey"), col("l_linenumber"),
        ntile(3).over(w).cast("long").as("tile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        lead(col("l_quantity"), 1).over(w).as("next_qty"),
        nth_value(col("l_quantity"), 2).over(wf).as("second_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** LATERAL correlated subquery: per order, its top-2 lineitems by
    * price — the decorrelated per-group top-k shape (one shuffle on the
    * correlation key after decorrelation, not a per-row re-scan). */
  private val q28 = QDef(
    "q28_lateral_topk",
    """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
      |FROM orders o,
      |LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem
      |         WHERE l_orderkey = o.o_orderkey
      |         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
      |WHERE o.o_orderkey < 400
      |ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders_q28")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q28")
    s.sql(
      """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        |FROM orders_q28 o,
        |LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem_q28
        |         WHERE l_orderkey = o.o_orderkey
        |         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        |WHERE o.o_orderkey < 400
        |ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber""".stripMargin)
  }
  /** Explicit GROUPING SETS (beyond q24's CUBE/q09's ROLLUP) with a
    * paginated ORDER BY ... LIMIT/OFFSET on top — the external-sort +
    * top-k + offset shape. Fully deterministic ordering before the
    * offset, so both engines page identically. */
  private val q29 = QDef(
    "q29_grouping_sets_offset",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
       |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
       |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
       |LIMIT 5 OFFSET 2""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q29")
    s.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
         |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem_q29
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
         |LIMIT 5 OFFSET 2""".stripMargin)
  }

  /** Recursive CTE (Spark 4.1 `WITH RECURSIVE` → iterative `UnionLoop`
    * execution): a reporting-chain walk over a synthesized binary-tree
    * hierarchy (customer k reports to k div 2), rolled up to per-depth
    * counts. Each recursion level is ONE distributed hash join of the
    * frontier against the customer scan — O(log n) levels, no driver
    * loop, the anchor/frontier is never collected. Reference surface:
    * DataFusion inherits recursive CTEs (SURVEY §2.B subqueries/CTE);
    * DuckDB executes the identical SQL as the oracle. */
  private val q40 = QDef(
    "q40_recursive_hierarchy",
    """WITH RECURSIVE h(custkey, depth) AS (
      |  SELECT c_custkey, 0 FROM customer WHERE c_custkey <= 1
      |  UNION ALL
      |  SELECT c.c_custkey, h.depth + 1
      |  FROM customer c JOIN h ON c.c_custkey // 2 = h.custkey
      |  WHERE c.c_custkey > 1)
      |SELECT depth, COUNT(*) AS n_members,
      |  CAST(MIN(custkey) AS BIGINT) AS min_key,
      |  CAST(MAX(custkey) AS BIGINT) AS max_key
      |FROM h GROUP BY depth ORDER BY depth""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer_q40")
    s.sql(
      """WITH RECURSIVE h(custkey, depth) AS (
        |  SELECT c_custkey, 0 FROM customer_q40 WHERE c_custkey <= 1
        |  UNION ALL
        |  SELECT c.c_custkey, h.depth + 1
        |  FROM customer_q40 c JOIN h ON c.c_custkey div 2 = h.custkey
        |  WHERE c.c_custkey > 1)
        |SELECT depth, COUNT(*) AS n_members,
        |  CAST(MIN(custkey) AS BIGINT) AS min_key,
        |  CAST(MAX(custkey) AS BIGINT) AS max_key
        |FROM h GROUP BY depth ORDER BY depth""".stripMargin)
  }

  /** Market-basket part affinity — co-occurrence mining over order
    * baskets: for every part pair bought together in ≥2 orders, the
    * co-order count and the lift n_ab·N / (n_a·n_b) (>1 = bought
    * together more than chance — the association signal behind
    * "customers who bought X also bought Y").
    *
    * Scale shape: baskets build as per-order part sets in one
    * map-side-combined aggregate and the pair explosion unfolds
    * IN-ROW from each sorted basket, so pair work is bounded by basket
    * size squared per order (≈7 lines/order), never corpus-quadratic —
    * the canonical distributed market-basket shape. Frequencies join
    * back by part key; lift is ONE division of exact integer products,
    * so the oracle matches bit-exactly. */
  private val q46 = QDef(
    "q46_part_affinity",
    """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |n AS (SELECT count(DISTINCT ok) AS n_orders FROM op),
      |pf AS (SELECT pk, count(*) AS n_p FROM op GROUP BY pk),
      |pairs AS (
      |  SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_ab
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT CAST(pairs.pa AS BIGINT) AS part_a, CAST(pairs.pb AS BIGINT) AS part_b,
      |  CAST(pairs.n_ab AS BIGINT) AS n_together,
      |  CAST(fa.n_p AS BIGINT) AS n_a, CAST(fb.n_p AS BIGINT) AS n_b,
      |  CAST(pairs.n_ab * n.n_orders AS DOUBLE) / CAST(fa.n_p * fb.n_p AS DOUBLE) AS lift
      |FROM pairs JOIN pf fa ON pairs.pa = fa.pk JOIN pf fb ON pairs.pb = fb.pk
      |CROSS JOIN n
      |ORDER BY part_a, part_b""".stripMargin) { (s, d) =>
    // baskets as per-order sorted part SETS (r14, guide §2.4): the old
    // shape materialized the distinct (order, part) table and SELF-
    // JOINED it on the order key — the distinct's shuffle plus two more
    // join-side shuffles of the same 600k rows. One collect_set
    // aggregate builds each basket in-row (map-side combined), the
    // ordered pairs unfold from the sorted array (x at position i pairs
    // with every later element — exactly the a.pk < b.pk join output),
    // and the part frequencies/order count read off the SAME basket
    // frame instead of re-shuffling the pair table. Basket size bounds
    // the in-row pair work just like it bounded the self-join's
    // per-key work — the canonical distributed market-basket shape.
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(expr("array_sort(collect_set(pk))").as("parts"))
      .persistTracked()
    val n = baskets.agg(count(lit(1)).as("n_orders"))
    val pf = baskets.select(explode(col("parts")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_p"))
    // opt-in fail-fast: basket pair work is Σ C(|basket|, 2) — a
    // degenerate giant basket makes it corpus-quadratic; the budget
    // aborts loudly before the pair stage launches (the guard's count
    // frame is built lazily, only when the conf is set)
    graft.operators.PairBudget.guardSelfJoin(
      baskets.select(col("ok"), explode(col("parts")).as("pk")), Seq("ok"),
      "q46 basket pair expansion (part co-occurrence)")
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts)),
          |    y -> struct(x AS pa, y AS pb))))""".stripMargin)).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= 2)
    pairs
      .join(pf.select(col("pk").as("pa"), col("n_p").as("n_a")), Seq("pa"))
      .join(pf.select(col("pk").as("pb"), col("n_p").as("n_b")), Seq("pb"))
      .crossJoin(broadcast(n))
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_ab").as("n_together"), col("n_a"), col("n_b"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("part_a"), col("part_b"))
  }

  /** Order-fulfilment SLA report — per order priority, the ship-delay
    * distribution (days from order date to each lineitem's ship date):
    * counts, exact interpolated P50/P90, max, and the >90-day late
    * rate. The operational latency card q45/t35 compute for events and
    * tokens, applied to the TPC-H order lifecycle. Delay is INTEGER
    * epoch-day arithmetic (micros div 86400000000), so percentile
    * inputs are identical in both engines; `percentile` ≡
    * `quantile_cont` bit-exact (the q45 rule), and the late rate is
    * ONE division of exact counts.
    *
    * Scale shape: one orderkey equi-join (orders side prunes to two
    * columns before the shuffle), then one 5-group aggregate; exact
    * per-group percentile state is bounded by group row counts — at
    * 100 TB swap in approx_percentile like every latency SLA does. */
  private val q58 = QDef(
    "q58_ship_sla",
    """WITH j AS (
      |  SELECT o.o_orderpriority AS priority,
      |    (epoch_us(l.l_shipdate) // 86400000000) -
      |      (epoch_us(o.o_orderdate) // 86400000000) AS delay_days
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
      |SELECT priority, COUNT(*) AS n_lineitems,
      |  quantile_cont(delay_days, 0.5) AS p50_days,
      |  quantile_cont(delay_days, 0.9) AS p90_days,
      |  MAX(delay_days) AS max_days,
      |  CAST(SUM(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS DOUBLE) /
      |    COUNT(*) AS late_rate
      |FROM j GROUP BY priority ORDER BY priority""".stripMargin) { (s, d) =>
    // the date columns must land as UTC-epoch TimestampType in EVERY
    // session (unix_micros rejects the NTZ type a fresh session would
    // infer) — same normalization Tables.events applies
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        expr("unix_micros(o_orderdate) div 86400000000").as("od"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o_orderkey"),
        expr("unix_micros(l_shipdate) div 86400000000").as("sd"))
    o.join(l, Seq("o_orderkey"))
      .select(col("priority"), (col("sd") - col("od")).as("delay_days"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_lineitems"),
        expr("percentile(delay_days, 0.5D)").as("p50_days"),
        expr("percentile(delay_days, 0.9D)").as("p90_days"),
        max(col("delay_days")).as("max_days"),
        (sum(when(col("delay_days") > 90, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("late_rate"))
      .orderBy(col("priority"))
  }

  /** Referential-integrity audit — the data-quality checks a warehouse
    * runs after every load (dbt tests / Deequ constraints, as one
    * query): orphan lineitems (fact rows whose order key resolves to
    * no dimension row), childless orders, duplicate primary keys on
    * both tables, and NULL foreign keys; one row per check with its
    * violation count and pass flag. Everything is an anti-join or a
    * keyed count — the shapes Catalyst already optimizes — and the
    * union of five one-row aggregates.
    *
    * Scale shape: two key anti-joins + two key count-distinct-style
    * aggregates over strictly keyed data; no windows, nothing
    * pairwise. */
  private val q60 = QDef(
    "q60_integrity_audit",
    """WITH checks AS (
      |  SELECT 1 AS check_idx, 'orphan_lineitems' AS check_name,
      |    (SELECT COUNT(*) FROM lineitem l
      |     WHERE l.l_orderkey IS NOT NULL
      |       AND NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey)) AS n_bad,
      |    (SELECT COUNT(*) FROM lineitem) AS n_total
      |  UNION ALL
      |  SELECT 2, 'childless_orders',
      |    (SELECT COUNT(*) FROM orders o
      |     WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |                       WHERE l.l_orderkey = o.o_orderkey)),
      |    (SELECT COUNT(*) FROM orders)
      |  UNION ALL
      |  SELECT 3, 'dup_order_keys',
      |    (SELECT COALESCE(SUM(c - 1), 0) FROM
      |      (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) g
      |     WHERE c > 1),
      |    (SELECT COUNT(*) FROM orders)
      |  UNION ALL
      |  SELECT 4, 'dup_line_keys',
      |    (SELECT COALESCE(SUM(c - 1), 0) FROM
      |      (SELECT COUNT(*) AS c FROM lineitem
      |       GROUP BY l_orderkey, l_linenumber) g
      |     WHERE c > 1),
      |    (SELECT COUNT(*) FROM lineitem)
      |  UNION ALL
      |  SELECT 5, 'null_fk',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL),
      |    (SELECT COUNT(*) FROM lineitem))
      |SELECT check_idx, check_name, CAST(n_bad AS BIGINT) AS n_bad,
      |  CAST(n_total AS BIGINT) AS n_total, n_bad = 0 AS ok
      |FROM checks ORDER BY check_idx""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(col("o_orderkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"))
    val nL = l.agg(count(lit(1)).as("n_total"))
    val nO = o.agg(count(lit(1)).as("n_total"))
    def card(idx: Int, name: String, bad: DataFrame, tot: DataFrame) =
      bad.crossJoin(broadcast(tot))
        .select(lit(idx).as("check_idx"), lit(name).as("check_name"),
          col("n_bad"), col("n_total"))
    val orphans = l.where(col("l_orderkey").isNotNull)
      .join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
    val childless = o
      .join(l, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
    val dupO = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_bad"))
    val dupL = l.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_bad"))
    val nullFk = l.where(col("l_orderkey").isNull)
      .agg(count(lit(1)).as("n_bad"))
    card(1, "orphan_lineitems", orphans, nL)
      .unionAll(card(2, "childless_orders", childless, nO))
      .unionAll(card(3, "dup_order_keys", dupO, nO))
      .unionAll(card(4, "dup_line_keys", dupL, nL))
      .unionAll(card(5, "null_fk", nullFk, nL))
      .withColumn("ok", col("n_bad") === 0)
      .orderBy(col("check_idx"))
  }

  /** PostgreSQL `DISTINCT ON`: latest event per user. Exercises the
    * GraftSqlParser text rewrite (plans/GraftExtensions.scala) — the
    * PG-dialect surface the reference exposes through DataFusion. The
    * rewritten plan is one hash shuffle on the key + a ranking window,
    * no global sort. The oracle runs the *same* statement: DuckDB
    * implements DISTINCT ON natively, so the rewrite is checked against
    * an independent engine's semantics. */
  private val q62 = QDef(
    "q62_distinct_on_latest",
    """SELECT DISTINCT ON (user_id) user_id, ts, event_type, value
      |FROM events
      |ORDER BY user_id, ts DESC, event_id DESC""".stripMargin) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql("""SELECT DISTINCT ON (user_id) user_id, ts, event_type, value
      |FROM events
      |ORDER BY user_id, ts DESC, event_id DESC""".stripMargin)
  }

  /** `QUALIFY` (DuckDB/BigQuery dialect): top-3 orders per customer
    * filtered on a window alias without a subquery. Same parser-rewrite
    * surface as q62; DuckDB evaluates the identical statement natively
    * as the oracle. */
  private val q63 = QDef(
    "q63_qualify_top_orders",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |FROM orders
      |QUALIFY rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql("""SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |FROM orders
      |QUALIFY rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin)
  }

  /** TPC-H Q7 shape — bilateral volume shipping: revenue flowing
    * between two nations (supplier side vs customer side) by ship
    * year. A 6-way join where Catalyst broadcasts all four dimension
    * sides (supplier, customer, nation x2) and the only real shuffle
    * is lineitem-to-orders; the nation filter prunes before the join.
    * Reference surface: DataFusion multi-way join planning (SURVEY
    * §2.B "Joins"). */
  private val q66 = QDef(
    "q66_volume_shipping",
    s"""WITH flows AS (
       |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |    CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
       |    l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS volume
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |  WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       |     OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
       |SELECT supp_nation, cust_nation, l_year,
       |  ${sqlDsum("volume")} AS revenue
       |FROM flows GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val sn = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val cn = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .select(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(dsum(col("volume")).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape — national market share: the share of EUROPE
    * customers' order volume supplied by NATION_3, per order year.
    * Conditional-sum over a 7-way join (region gates the customer
    * nation); both sums are decimal-exact, divided once. */
  private val q67 = QDef(
    "q67_market_share",
    s"""WITH vols AS (
       |  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       |    l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) AS volume,
       |    sn.n_name AS supp_nation
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |  JOIN region r ON cn.n_regionkey = r.r_regionkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |  WHERE r.r_name = 'EUROPE')
       |SELECT o_year,
       |  ${sqlDsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0.0 AS DOUBLE) END")}
       |    / ${sqlDsum("volume")} AS mkt_share
       |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
    val cn = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region")))
    val sn = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .join(broadcast(Tables.region(s, d)), col("cn_region") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .where(col("r_name") === "EUROPE")
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
        col("supp_nation"))
      .groupBy(col("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0.0))) / dsum(col("volume"))).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q10 shape — returned-item customer ranking: top 20
    * customers by returned revenue in a one-year window. Top-k over a
    * grouped aggregate (TakeOrderedAndProject — per-partition top-20
    * then a 20-row merge, no global sort), ties broken on the key. */
  private val q68 = QDef(
    "q68_returned_items",
    s"""SELECT c.c_custkey, c.c_name, n.n_name,
       |  ${sqlDsum("l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount)")} AS revenue
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |WHERE l.l_returnflag = 'R'
       |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY c.c_custkey, c.c_name, n.n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .where(col("l_returnflag") === "R" &&
        col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18 shape — large-quantity orders: customers whose orders
    * exceed a total-quantity threshold, found via a semi-join against a
    * HAVING-filtered aggregate subquery (the aggregate runs ONCE over
    * lineitem with map-side combine; the qualifying keys then gate the
    * detail join). Decimal-exact quantity sums; top-50 by total price
    * with a key tiebreak. */
  private val q69 = QDef(
    "q69_large_quantity_orders",
    s"""WITH big AS (
       |  SELECT l_orderkey FROM lineitem
       |  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > 250)
       |SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       |  ${sqlDsum("l.l_quantity")} AS total_qty
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
       |GROUP BY 1, 2, 3, 4
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(30,6)")).as("qty"))
      .where(col("qty") > 250)
      .select(col("l_orderkey").as("big_key"))
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(big, col("o_orderkey") === col("big_key"), "left_semi")
      .groupBy(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
  }

  /** PG `SIMILAR TO` through the parser rewrite (GraftSqlParser
    * translates the SQL-standard pattern to RLIKE): language whitelist
    * plus a content pattern over documents. The oracle expresses the
    * SAME semantics via DuckDB's regexp_full_match (DuckDB's own
    * SIMILAR TO takes a raw regex, not the SQL pattern language, so the
    * translated-regex formulation IS the cross-engine ground truth). */
  private val q70 = QDef(
    "q70_similar_to",
    """SELECT doc_id, lang, source FROM documents
      |WHERE regexp_full_match(lang, '(en|de|fr)')
      |  AND regexp_full_match(text, '.*(join|merge).*')
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql("""SELECT doc_id, lang, source FROM documents
      |WHERE lang SIMILAR TO '(en|de|fr)'
      |  AND text SIMILAR TO '%(join|merge)%'
      |ORDER BY doc_id""".stripMargin)
  }

  /** SQL-standard FILTER clause over aggregates — one-pass conditional
    * aggregation (the engine-side replacement for N filtered
    * subqueries): per nation, order counts and decimal-exact revenue
    * split by status/priority predicates, plus a filtered distinct
    * count, all in a single hash aggregate. Both engines parse the
    * identical statement. */
  private val q72 = QDef(
    "q72_filtered_aggregates",
    s"""SELECT c_nationkey,
       |  COUNT(*) AS n_orders,
       |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       |  COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000) AS n_big_spenders,
       |  ${sqlDsum("o_totalprice")} AS revenue,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql(s"""SELECT c_nationkey,
       |  COUNT(*) AS n_orders,
       |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       |  COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000) AS n_big_spenders,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  }

  /** ANALYZE-style column statistics card — what a catalog stats
    * collector (DataFusion's ANALYZE, Spark's ANALYZE TABLE ... FOR
    * COLUMNS) materializes per column: row/non-null/exact-NDV counts,
    * numeric min/max (timestamps as epoch micros — exact in doubles),
    * and mean string length for text columns. ONE scan: every
    * per-column statistic computes in a single multi-distinct hash
    * aggregate (Catalyst expands for the distincts), then the 1-row
    * frame unpivots to the 6-row card. The oracle takes six scans —
    * the single-pass shape is the Spark-side point. */
  private val q73 = QDef(
    "q73_column_stats", {
      def row(col: String, minmax: String, avglen: String) =
        s"""SELECT '$col' AS col, COUNT(*) AS n_rows,
           |  COUNT($col) AS n_nonnull, COUNT(DISTINCT $col) AS ndv,
           |  $minmax, $avglen FROM orders""".stripMargin
      Seq(
        row("o_orderkey", "CAST(MIN(o_orderkey) AS DOUBLE) AS min_num, CAST(MAX(o_orderkey) AS DOUBLE) AS max_num", "CAST(NULL AS DOUBLE) AS avg_len"),
        row("o_custkey", "CAST(MIN(o_custkey) AS DOUBLE) AS min_num, CAST(MAX(o_custkey) AS DOUBLE) AS max_num", "CAST(NULL AS DOUBLE) AS avg_len"),
        row("o_orderstatus", "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num", s"${sqlDsum("length(o_orderstatus)")} / COUNT(o_orderstatus) AS avg_len"),
        row("o_totalprice", "MIN(o_totalprice) AS min_num, MAX(o_totalprice) AS max_num", "CAST(NULL AS DOUBLE) AS avg_len"),
        row("o_orderdate", "CAST(epoch_us(MIN(o_orderdate)) AS DOUBLE) AS min_num, CAST(epoch_us(MAX(o_orderdate)) AS DOUBLE) AS max_num", "CAST(NULL AS DOUBLE) AS avg_len"),
        row("o_orderpriority", "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num", s"${sqlDsum("length(o_orderpriority)")} / COUNT(o_orderpriority) AS avg_len"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col")
    }) { (s, d) =>
    val o = Tables.orders(s, d)
    val one = o.agg(
      count(lit(1)).as("n_rows"),
      count(col("o_orderkey")).as("nn_okey"), countDistinct(col("o_orderkey")).as("ndv_okey"),
      min(col("o_orderkey")).cast("double").as("min_okey"), max(col("o_orderkey")).cast("double").as("max_okey"),
      count(col("o_custkey")).as("nn_ckey"), countDistinct(col("o_custkey")).as("ndv_ckey"),
      min(col("o_custkey")).cast("double").as("min_ckey"), max(col("o_custkey")).cast("double").as("max_ckey"),
      count(col("o_orderstatus")).as("nn_st"), countDistinct(col("o_orderstatus")).as("ndv_st"),
      (dsum(length(col("o_orderstatus"))) / count(col("o_orderstatus"))).as("len_st"),
      count(col("o_totalprice")).as("nn_tp"), countDistinct(col("o_totalprice")).as("ndv_tp"),
      min(col("o_totalprice")).as("min_tp"), max(col("o_totalprice")).as("max_tp"),
      count(col("o_orderdate")).as("nn_od"), countDistinct(col("o_orderdate")).as("ndv_od"),
      unix_micros(min(col("o_orderdate")).cast("timestamp")).cast("double").as("min_od"),
      unix_micros(max(col("o_orderdate")).cast("timestamp")).cast("double").as("max_od"),
      count(col("o_orderpriority")).as("nn_pr"), countDistinct(col("o_orderpriority")).as("ndv_pr"),
      (dsum(length(col("o_orderpriority"))) / count(col("o_orderpriority"))).as("len_pr"))
    one.selectExpr("n_rows", s"""stack(6,
      |  'o_orderkey', nn_okey, ndv_okey, min_okey, max_okey, CAST(NULL AS DOUBLE),
      |  'o_custkey', nn_ckey, ndv_ckey, min_ckey, max_ckey, CAST(NULL AS DOUBLE),
      |  'o_orderstatus', nn_st, ndv_st, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), len_st,
      |  'o_totalprice', nn_tp, ndv_tp, min_tp, max_tp, CAST(NULL AS DOUBLE),
      |  'o_orderdate', nn_od, ndv_od, min_od, max_od, CAST(NULL AS DOUBLE),
      |  'o_orderpriority', nn_pr, ndv_pr, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), len_pr
      |) AS (col, n_nonnull, ndv, min_num, max_num, avg_len)""".stripMargin)
      .select(col("col"), col("n_rows"), col("n_nonnull"), col("ndv"),
        col("min_num"), col("max_num"), col("avg_len"))
      .orderBy(col("col"))
  }

  /** TPC-H Q2 shape — correlated-MIN supplier selection: for each part
    * of a brand, the supplier(s) whose line price equals the part's
    * minimum (a correlated scalar aggregate subquery; reference
    * inherits the decorrelation from DataFusion,
    * src/core/src/datasource — here Catalyst's RewriteCorrelatedScalarSubquery
    * turns it into an aggregate + join). IDENTICAL statement on both
    * engines; the comparison is raw-value equality (no arithmetic), so
    * double semantics can't diverge. Ties surface as extra rows and
    * order out deterministically. */
  private val q75 = QDef(
    "q75_min_cost_supplier", {
      val sql = """SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
        |  n.n_name, l.l_extendedprice AS best_price
        |FROM part p
        |JOIN lineitem l ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE p.p_brand = 'Brand#11'
        |  AND l.l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        |    WHERE l2.l_partkey = p.p_partkey)
        |ORDER BY p_partkey, s_suppkey, best_price""".stripMargin
      sql
    }) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql("""SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
      |  n.n_name, l.l_extendedprice AS best_price
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE p.p_brand = 'Brand#11'
      |  AND l.l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
      |    WHERE l2.l_partkey = p.p_partkey)
      |ORDER BY p_partkey, s_suppkey, best_price""".stripMargin)
  }

  /** TPC-H Q15 shape — top supplier by a revenue view: per-supplier
    * decimal-exact revenue over a 3-month ship window, then the
    * supplier(s) whose revenue equals the view's max (scalar subquery
    * over the aggregate — the max is a 1-row broadcast, never a global
    * sort). Revenue compares as DECIMAL (exact, associative), cast to
    * double only in the output. */
  private val q76 = QDef(
    "q76_top_revenue_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate < TIMESTAMP '1995-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
      |FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
      |WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,6)")).as("total_rev"))
    import graft.util.Persist.Syntax
    val r = rev.persistTracked()
    val mx = r.agg(max(col("total_rev")).as("max_rev"))
    Tables.supplier(s, d)
      .join(r, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(mx), col("total_rev") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q20 shape — nested correlated-threshold semi-join:
    * suppliers who shipped MORE than 3× their equal share of a red
    * part's total quantity (per-(part,supp) sums vs a correlated
    * per-part total+supplier-count: both aggregates run once,
    * map-side combined; the comparison joins on the part key and the
    * qualifying suppliers gate the supplier scan through a left-semi
    * join — nothing quadratic, no row ever re-scanned). The threshold
    * is RELATIVE (share × supplier count), so selectivity holds as
    * per-part supplier counts grow with scale. Decimal sums cast to
    * double for the comparison (correctly rounded identically in both
    * engines; decimal×decimal would overflow Spark's 38-digit cap and
    * silently round). */
  private val q77 = QDef(
    "q77_big_share_suppliers",
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(30,6))) AS supp_qty
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |pt AS (
      |  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(30,6))) AS part_qty,
      |    COUNT(DISTINCT l_suppkey) AS n_supps
      |  FROM lineitem GROUP BY l_partkey),
      |qualifying AS (
      |  SELECT DISTINCT ps.l_suppkey
      |  FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
      |  JOIN part p ON p.p_partkey = ps.l_partkey
      |  WHERE p.p_name LIKE '%red%'
      |    AND CAST(ps.supp_qty AS DOUBLE) * pt.n_supps
      |      > CAST(pt.part_qty AS DOUBLE) * 3.0)
      |SELECT s.s_suppkey, s.s_name, n.n_name
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_suppkey IN (SELECT l_suppkey FROM qualifying)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val redParts = Tables.part(s, d)
      .where(col("p_name").like("%red%"))
      .select(col("p_partkey"))
    // r13: the red-part semi-join moved BELOW the aggregates (guide
    // §3.2 — pre-filter the big side before shuffling it): only red
    // parts can ever qualify, so aggregating the other ~90% of lineitem
    // was wasted shuffle; the broadcast semi-join drops those rows at
    // the scan. Per-part aggregates are unaffected by other parts, so
    // the qualifying set is identical.
    val redLi = li
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
    val ps = redLi.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(30,6)")).as("supp_qty"))
    // pt is an exact re-aggregate of ps — decimal sums are associative,
    // and COUNT(DISTINCT l_suppkey) per part ≡ the number of
    // (part, supp) groups — so the second full lineitem aggregate
    // (which also paid a distinct-expand) is gone (guide §2.3
    // "aggregate before you shuffle", applied twice)
    val pt = ps.groupBy(col("l_partkey").as("pt_partkey"))
      .agg(sum(col("supp_qty")).as("part_qty"),
        count(lit(1)).as("n_supps"))
    val qualifying = ps
      .join(pt, col("l_partkey") === col("pt_partkey"))
      .where(col("supp_qty").cast("double") * col("n_supps")
        > col("part_qty").cast("double") * 3.0)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape — EXISTS + NOT EXISTS self-joins: suppliers who
    * were the ONLY late shipper on a multi-supplier finished order
    * ("late" = shipped 60+ days after the order date — the fixture has
    * no receipt/commit dates). Spark side: the per-order supplier
    * flags reduce to ONE aggregate over lineitem (distinct suppliers,
    * distinct late suppliers) joined back to the late lines — the
    * EXISTS ("another supplier touched the order") and NOT EXISTS ("no
    * OTHER supplier was late") become integer predicates on those
    * counts instead of two more self-joins; the oracle keeps the
    * textbook correlated form. Top 20 suppliers by waiting-order
    * count, name tiebreak. */
  private val q78 = QDef(
    "q78_waiting_suppliers",
    """WITH late AS (
      |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |    AND EXISTS (
      |      SELECT 1 FROM lineitem l2
      |      WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey)
      |    AND NOT EXISTS (
      |      SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      |      WHERE l3.l_orderkey = l.l_orderkey AND l3.l_suppkey <> l.l_suppkey
      |        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY))
      |SELECT s.s_name, COUNT(*) AS numwait
      |FROM late JOIN supplier s ON s.s_suppkey = late.l_suppkey
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val ords = Tables.orders(s, d).where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val lines = li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
    // one (order, supplier) aggregate replaces both correlated EXISTS
    // probes AND the separate late-pair distinct: r13's shape computed
    // the lineitem⋈orders join twice (perOrder and late each re-derived
    // it) and paid a 2-way COUNT(DISTINCT) expand; per (order, supp)
    // the only fact needed is "shipped late on this order at all", so
    // one map-side-combinable aggregate feeds both — the per-order
    // supplier counts are exact re-aggregates of its groups
    // (COUNT(DISTINCT supp) ≡ group count, the q77 argument), and the
    // late pair set is a filter on it (guide §2.3/§2.4).
    val ps = lines.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("is_late"), 1).otherwise(0)).as("late_any"))
      .persistTracked()
    val perOrder = ps.groupBy(col("l_orderkey").as("ok"))
      .agg(count(lit(1)).as("n_supps"),
        count(when(col("late_any") === 1, lit(1))).as("n_late"))
    val late = ps.where(col("late_any") === 1)
      .select(col("l_orderkey"), col("l_suppkey"))
    val waiting = late.join(perOrder, col("l_orderkey") === col("ok"))
      .where(col("n_supps") > 1 && col("n_late") === 1)
    waiting.join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q17 shape — small-quantity-order revenue: weekly-averaged
    * revenue from brand+type-filtered parts' lineitems whose quantity
    * sits under 20% of that part's average quantity (the correlated AVG
    * scalar subquery; Catalyst decorrelates it into a part-key
    * aggregate + join). The average comparison runs ENTIRELY in exact
    * decimal/integer arithmetic — `qty × 5 × cnt < Σqty` instead of
    * `qty < 0.2 × Σqty/cnt` — so neither engine's double division or
    * AVG merge order can flip a boundary row. Scale posture: the
    * per-part aggregate is map-side combined on the scan, the filtered
    * part keys are a broadcast semi-join, and only one shuffle (the
    * part-key aggregate) touches the fact table. */
  private val q81 = QDef(
    "q81_small_qty_revenue",
    """WITH pq AS (
      |  SELECT l_partkey AS pq_partkey,
      |    SUM(CAST(l_quantity AS DECIMAL(15,6))) AS sum_qty,
      |    CAST(5 * COUNT(*) AS DECIMAL(18,0)) AS five_cnt
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0
      |    AS avg_yearly
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN pq ON pq.pq_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#4' AND p.p_type = 'MEDIUM'
      |  AND CAST(l.l_quantity AS DECIMAL(15,6)) * pq.five_cnt < pq.sum_qty""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val pq = li.groupBy(col("l_partkey").as("pq_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(15,6)")).as("sum_qty"),
        (lit(5) * count(lit(1))).cast("decimal(18,0)").as("five_cnt"))
    val parts = Tables.part(s, d)
      .where(col("p_brand") === "Brand#4" && col("p_type") === "MEDIUM")
      .select(col("p_partkey"))
    li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(pq, col("l_partkey") === col("pq_partkey"))
      .where(col("l_quantity").cast("decimal(15,6)") * col("five_cnt")
        < col("sum_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(30,6)"))
        .cast("double") / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q22 shape — churned-but-rich customers: per nation (standing
    * in for Q22's phone country codes — the fixture carries no phone),
    * count and total balance of customers in 7 target nations whose
    * balance beats the positive-balance average and who placed NO order
    * since 2000 (NOT EXISTS → anti-join; the fixture's customers all
    * have SOME order, so the recency predicate is what keeps the
    * anti-join non-vacuous). The above-average test is exact-decimal
    * cross-multiplication (`bal × cnt > Σbal`), never a double mean.
    * Scale posture: the threshold aggregate is one 1-row broadcast, the
    * anti-join shuffles on the customer key only (date filter pushed to
    * the orders scan), nation is a broadcast dim. */
  private val q82 = QDef(
    "q82_churned_rich_customers",
    """WITH pos AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS sum_bal,
      |    COUNT(*) AS cnt
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n.n_name, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |CROSS JOIN pos
      |WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      |  AND CAST(c.c_acctbal AS DECIMAL(15,6)) * pos.cnt > pos.sum_bal
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY n.n_name
      |ORDER BY n_name""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val pos = cust.where(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast("decimal(30,6)")).as("sum_bal"),
        count(lit(1)).as("cnt"))
    val recent = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust
      .where(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
      .crossJoin(broadcast(pos))
      .where(col("c_acctbal").cast("decimal(15,6)") * col("cnt")
        > col("sum_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(30,6)")).cast("double")
          .as("totacctbal"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q19 shape — disjunctive join predicate (OR of brand/size/
    * quantity conjunctions): the optimizer stress test for common-
    * predicate extraction — Catalyst factors `p_brand IN (…)` and the
    * quantity envelope out of the disjunction so BOTH scans still get a
    * pushed filter, and the residual OR evaluates post-join. IDENTICAL
    * statement on both engines (q75's pattern); revenue through the
    * exact-decimal sum so the hash compare holds. */
  private val q83 = QDef(
    "q83_disjunctive_revenue", {
      val sql = s"""SELECT COUNT(*) AS n_lines,
        |  ${sqlDsum("l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount)")} AS revenue
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 10 AND 30
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin
      sql
    }) { (s, d) =>
    graft.Tables.registerViews(s, d)
    s.sql(s"""SELECT COUNT(*) AS n_lines,
      |  ${sqlDsum("l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount)")} AS revenue
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 10 AND 30
      |       AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
      |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin)
  }

  /** TPC-H Q9 shape — profit by nation and year: the 5-way star join
    * (fact ⋈ part ⋈ supplier ⋈ orders ⋈ nation) with an expression
    * aggregate over the joined row. The fixtures carry no partsupp
    * table, so the cost leg uses the part's retail price (same join
    * topology, same agg shape). Scale: one shuffle join chain over the
    * fact table; part is pre-filtered before joining so the selective
    * predicate prunes early; the 25-row nation is broadcast. */
  private val q84 = QDef(
    "q84_profit_by_nation_year",
    s"""SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       |  ${sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) " +
          "- 0.6 * p_retailprice * l_quantity")} AS sum_profit
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
       |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
    val parts = Tables.part(s, d).where(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    Tables.lineitem(s, d)
      .join(parts, col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - lit(0.6) * col("p_retailprice") * col("l_quantity")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape — group value threshold against a scalar subquery
    * over the SAME aggregation (partsupp stands in as lineitem value by
    * part, supplier-filtered to one nation). Scale: the corpus is
    * scanned twice (per-key agg + global total); the total is a one-row
    * broadcast into the HAVING filter — no per-row subquery execution. */
  private val q85 = QDef(
    "q85_big_value_parts",
    s"""WITH pv AS (
       |  SELECT l_partkey,
       |    ${sqlDsum("l_extendedprice * l_quantity")} AS value
       |  FROM lineitem
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |  WHERE n_name = 'NATION_7'
       |  GROUP BY l_partkey)
       |SELECT l_partkey AS partkey, value FROM pv
       |WHERE value > (SELECT ${sqlDsum("value")} * 0.001 FROM pv)
       |ORDER BY value DESC, partkey""".stripMargin) { (s, d) =>
    val nat7 = broadcast(Tables.nation(s, d).where(col("n_name") === "NATION_7")
      .select(col("n_nationkey")))
    val sup = Tables.supplier(s, d)
      .join(nat7, col("n_nationkey") === col("s_nationkey"))
      .select(col("s_suppkey"))
    val pv = Tables.lineitem(s, d)
      .join(sup, col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_extendedprice") * col("l_quantity")).as("value"))
    val total = pv.agg((dsum(col("value")) * 0.001).as("__threshold"))
    pv.crossJoin(broadcast(total))
      .where(col("value") > col("__threshold"))
      .select(col("l_partkey").as("partkey"), col("value"))
      .orderBy(col("value").desc, col("partkey"))
  }

  /** TPC-H Q12 shape — two-level CASE aggregation over a late-shipment
    * join (no l_shipmode in the fixtures: l_returnflag carries the
    * grouping dimension, lateness is shipdate > orderdate + 60 days).
    * Scale: single orders⋈lineitem shuffle join, counts fold map-side. */
  private val q86 = QDef(
    "q86_priority_shipping",
    """SELECT l_returnflag AS flag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag
      |ORDER BY flag""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag").as("flag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("low_line_count"))
      .orderBy(col("flag"))
  }

  /** TPC-H Q13 shape — customer order-count distribution: LEFT join
    * with a filter inside the join condition (customers with zero
    * qualifying orders must survive with count 0), then a histogram of
    * the counts. Scale: one key shuffle for the left join + per-key
    * count, then a tiny second aggregate over ≤ |distinct counts| rows. */
  private val q87 = QDef(
    "q87_custdist",
    """WITH c_orders AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey
      |    AND o_orderpriority NOT LIKE '%SPECIFIED%'
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    val cOrders = Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey") &&
          !col("o_orderpriority").like("%SPECIFIED%"),
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    cOrders.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q4 shape — order priority checking: orders in a date window
    * with at least one late lineitem (EXISTS), counted per priority.
    * The fixtures carry no l_commitdate/l_receiptdate, so "late" is
    * shipdate > orderdate + 75 days (the same lateness predicate the
    * q23 EXISTS shape uses). Written as a left-semi join — the plan
    * Catalyst decorrelates EXISTS into — so the fact table is touched
    * once and the count folds map-side after the semi. Completes the
    * 22-shape TPC-H battery together with q89. */
  private val q88 = QDef(
    "q88_order_priority_check",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
        && col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q16 shape — parts/supplier relationship distribution: count
    * of distinct suppliers per (brand, type, size) over qualifying
    * parts, excluding complaint suppliers via NOT IN. The fixtures have
    * no partsupp, so lineitem stands in as the part↔supplier relation
    * (same topology as the q84/q85 adaptations). Scale: the ≤|supplier|
    * exclusion list is a broadcast anti-join (NOT IN over a non-null
    * key), part prunes before the fact join, and COUNT(DISTINCT) runs
    * as Spark's two-phase distinct aggregate — no corpus-level
    * materialization anywhere. */
  private val q89 = QDef(
    "q89_parts_supplier_distribution",
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13'
      |  AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) {
    (s, d) =>
    val excluded = Tables.supplier(s, d)
      .where(col("s_name").like("%7")).select(col("s_suppkey"))
    val p = Tables.part(s, d)
      .where(col("p_brand") =!= "Brand#13" &&
        !col("p_type").like("PROMO%") &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(p, col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }
}
