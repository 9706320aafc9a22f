package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.operators.RangeJoin
import graft.util.Persist.Syntax
import graft.util.Det._

/** Batch event analytics over the `events` fixture: time bucketing,
  * sessionization (gaps-and-islands), JSON extraction, pivot.
  *
  * The reference has no streaming surface (SURVEY §2.B "Streaming:
  * None") — these are the batch time-window equivalents the driver's
  * `events` table motivates. Time keys are exchanged as strings or epoch
  * microseconds so the nanosecond parquet unit (DuckDB side) and Spark's
  * microsecond timestamps can never disagree on encoding.
  *
  * Scale: sessionization is one shuffle on `user_id` (the window
  * partition key) — at 100 TB that's the minimal repartition any
  * per-entity ordering needs; no driver-side state.
  */
object Events {

  def defs: Seq[QDef] = Seq(q19, q20, q21, q22, q26, q32, q33, q34, q35, q36,
    q37, q38, q39, q41, q42, q43, q44, q45, q47, q48, q49, q50, q51, q52,
    q53, q54, q55, q56, q57, q59, q61, q71, q74, q79, q80)

  /** Event-time RANGE window frames: per user, the trailing-1-hour
    * event count and value sum at every event (the "activity in the
    * last hour" feature a fraud/abuse pipeline computes). RANGE frames
    * over epoch-µs keys make peers (equal timestamps) share a frame in
    * both engines; the windowed sum runs in DECIMAL so float order
    * can't diverge. One shuffle on user_id. */
  private val q34 = QDef(
    "q34_trailing_window",
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
      |SELECT event_id, user_id, us,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sum_1h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY us
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, us, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 6))).over(w)
          .cast("double"))
      .select(col("event_id"), col("user_id"), col("us"), col("n_1h"), col("sum_1h"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  /** Hourly gap-fill + forward-fill — time-series regularization (the
    * resample step every feature pipeline runs before windowed models):
    * each user's event stream becomes a dense hourly grid between their
    * first and last hour, zero counts on silent hours, and the hour's
    * last event type carried forward across gaps (`last ... IGNORE
    * NULLS` in both engines; the in-hour "last" is picked by (us,
    * event_id) so it is deterministic).
    *
    * Scale shape: one hash aggregate for the per-user bounds, a
    * sequence-explode whose fan-out is the GRID size (bounded by the
    * time range, not the event count), left joins on (user_id, hr) and
    * one per-user window — all shuffles on the user key. 20 users keep
    * the dense output fixture-stable across SFs. */
  private val q35 = QDef(
    "q35_hourly_gap_fill",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    epoch_us(ts) // 3600000000 AS hr
      |  FROM events WHERE user_id < 20),
      |b AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM e GROUP BY user_id),
      |g AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM b),
      |c AS (SELECT user_id, hr, COUNT(*) AS n FROM e GROUP BY user_id, hr),
      |lv AS (
      |  SELECT user_id, hr, event_type FROM (
      |    SELECT user_id, hr, event_type,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, hr ORDER BY us DESC, event_id DESC) AS rn
      |    FROM e) WHERE rn = 1),
      |f AS (
      |  SELECT g.user_id, g.hr, COALESCE(c.n, 0) AS n_events, lv.event_type AS hour_last
      |  FROM g LEFT JOIN c ON c.user_id = g.user_id AND c.hr = g.hr
      |         LEFT JOIN lv ON lv.user_id = g.user_id AND lv.hr = g.hr)
      |SELECT user_id, hr, CAST(n_events AS BIGINT) AS n_events,
      |  last_value(hour_last IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_type
      |FROM f ORDER BY user_id, hr""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("hr", expr("us div 3600000000"))
    val b = e.groupBy(col("user_id")).agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val g = b.select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val c = e.groupBy(col("user_id"), col("hr")).agg(count(lit(1)).as("n"))
    val wLast = Window.partitionBy(col("user_id"), col("hr"))
      .orderBy(col("us").desc, col("event_id").desc)
    val lv = e.withColumn("rn", row_number().over(wLast)).filter(col("rn") === 1)
      .select(col("user_id"), col("hr"), col("event_type"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.join(c, Seq("user_id", "hr"), "left")
      .join(lv, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("event_type"), ignoreNulls = true).over(wFill).as("carried_type"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** Conversion funnel view → click → purchase: per user, the first
    * view, the first click AFTER it, the first purchase after THAT, all
    * within 24h of the first view — the ordered-sequence matching every
    * product-analytics stack runs. Expressed as three min-aggregations
    * chained by user_id joins (each stage shuffles on user_id only —
    * no per-event self-join explosion); epoch-µs keys keep both
    * engines integer-exact. */
  private val q32 = QDef(
    "q32_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, MIN(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(us) AS c_us FROM e JOIN v ON e.user_id = v.user_id
      |      WHERE event_type = 'click' AND us > v_us AND us <= v_us + 86400000000
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(us) AS p_us FROM e
      |      JOIN v ON e.user_id = v.user_id JOIN c ON e.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND us > c_us AND us <= v_us + 86400000000
      |      GROUP BY e.user_id)
      |SELECT
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click,
      |  (SELECT COUNT(*) FROM p) AS n_purchase,
      |  CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / (SELECT COUNT(*) FROM v) AS view_to_click,
      |  CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / (SELECT COUNT(*) FROM c) AS click_to_purchase""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .where(col("us") > col("v_us") && col("us") <= col("v_us") + 86400000000L)
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"), first(col("v_us")).as("v_us"))
    val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .where(col("us") > col("c_us") && col("us") <= col("v_us") + 86400000000L)
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        (col("n_click").cast("double") / col("n_view")).as("view_to_click"),
        (col("n_purchase").cast("double") / col("n_click")).as("click_to_purchase"))
  }

  /** Weekly cohort retention: cohort = the epoch-week of a user's
    * first event; a cell counts distinct cohort users active `offset`
    * weeks later. Integer epoch-week arithmetic (µs div week) is
    * calendar-free and engine-exact; the whole matrix is two shuffles
    * (user first-week, then cohort×offset aggregate). */
  private val q33 = QDef(
    "q33_cohort_retention",
    """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
      |SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
      |  CAST(wk - cohort_wk AS BIGINT) AS week_offset,
      |  COUNT(DISTINCT e.user_id) AS n_active
      |FROM e JOIN f ON e.user_id = f.user_id
      |GROUP BY cohort_wk, wk - cohort_wk
      |ORDER BY cohort_wk, week_offset""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("wk", expr("us div 604800000000")) // integer division
      .drop("us")
    val f = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    e.join(f, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  /** Tumbling 1-hour window per event type (string bucket key). */
  private val q19 = QDef(
    "q19_events_hourly",
    s"""SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, event_type,
       |  COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events
       |GROUP BY strftime(ts, '%Y-%m-%d %H:00'), event_type
       |ORDER BY hour, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Sessionization: per-user sessions split on >30 min inactivity.
    * lag → new-session flag → running sum = session id, then per-session
    * aggregates. Epoch-µs keys keep both engines bit-identical. */
  private val q20 = QDef(
    "q20_user_sessions",
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
       |f AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
       |                       OR us - LAG(us) OVER w > 1800000000
       |                     THEN 1 ELSE 0 END AS new_s
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
       |g AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |      FROM f)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       |  MIN(us) AS start_us, MAX(us) AS end_us,
       |  ${sqlDsum("value")} AS total_value
       |FROM g GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        dsum(col("value")).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Sessionization via Spark's NATIVE session_window operator (the
    * same 30-min-gap semantics as q20's gaps-and-islands, but executed
    * by the built-in merging-session aggregation — one shuffle on
    * (user_id, session), no window functions). window.end is
    * end-of-activity + gap by definition; the oracle reproduces both
    * bounds from the islands. */
  private val q26 = QDef(
    "q26_session_window",
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
       |f AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
       |                       OR us - LAG(us) OVER w > 1800000000
       |                     THEN 1 ELSE 0 END AS new_s
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
       |g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |      FROM f)
       |SELECT user_id, MIN(us) AS start_us,
       |  MAX(us) + 1800000000 AS end_us,
       |  COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value
       |FROM g GROUP BY user_id, session_id
       |ORDER BY user_id, start_us""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("start_us"))
  }

  /** JSON extraction from `props` ({"k": int}) + modular bucketing.
    * Spark uses get_json_object (codegen'd Jackson path); the oracle uses
    * a regex so it needs no DuckDB JSON extension. */
  private val q21 = QDef(
    "q21_events_json",
    s"""SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS k_bucket,
       |  COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM events
       |GROUP BY 1
       |ORDER BY k_bucket""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("k_bucket",
        get_json_object(col("props"), "$.k").cast("long") % 10)
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("k_bucket"))
  }

  /** Pivot: per-user event-type counts as columns. */
  private val q22 = QDef(
    "q22_user_event_pivot",
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    types.foldLeft(pivoted)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("user_id"))
  }

  /** UNPIVOT/melt — the inverse of q22: the wide per-user count matrix
    * back to long (user_id, event_type, n) rows, zeros included (what
    * distinguishes melt from a plain GROUP BY — silent users still get
    * a row per type). Spark's native `unpivot` (melt) operator; the
    * oracle expresses the same thing as a UNION ALL. */
  private val q36 = QDef(
    "q36_event_melt", {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val arms = types.map(t =>
        s"""SELECT user_id, '$t' AS event_type,
           |  COUNT(*) FILTER (WHERE event_type = '$t') AS n
           |FROM events GROUP BY user_id""".stripMargin).mkString("\nUNION ALL\n")
      s"""SELECT * FROM (
         |$arms
         |) ORDER BY user_id, event_type""".stripMargin
    }) { (s, d) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    val wide = types.foldLeft(pivoted)((df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L))))
    wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Exponentially-decayed trailing value (EMA, decay ½, window 21
    * events) — the recency-weighted activity feature a fraud/ranking
    * pipeline maintains per user. The recursion is unrolled into an
    * explicit lag-chain: ema = Σ_{k=0..20} lag(value,k)·2⁻ᵏ. Bit-exact
    * across engines WITHOUT decimal tricks because every piece is
    * IEEE-pinned: lag is positional (unique (us, event_id) order),
    * 2⁻ᵏ is an exact double, and the explicit left-to-right `+` chain
    * fixes the summation order in both engines (an aggregate SUM would
    * not — window segment trees re-associate).
    *
    * Scale: one shuffle on user_id, one WindowExec pass evaluating all
    * 21 lags over the same frame, no joins. */
  private val q37 = QDef(
    "q37_ema_decay", {
      val terms = (0 to 20).map { k =>
        val v = if (k == 0) "value"
        else s"coalesce(lag(value, $k) OVER w, CAST(0 AS DOUBLE))"
        s"$v * power(CAST(2 AS DOUBLE), -$k)"
      }.mkString("\n      + ")
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
         |SELECT event_id, user_id, us,
         |  $terms AS ema
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         |ORDER BY user_id, us, event_id""".stripMargin
    }) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val terms = (0 to 20).map { k =>
      val v = if (k == 0) col("value") else coalesce(lag(col("value"), k).over(w), lit(0.0))
      v * pow(lit(2.0), lit(-k))
    }
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("ema", terms.reduceLeft(_ + _))
      .select(col("event_id"), col("user_id"), col("us"), col("ema"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  /** Hourly volume anomaly detection per event type — the data-drift
    * monitor a pipeline runs over its ingest: trailing-24h mean/σ
    * (ROWS frame excluding the current hour) and a 3σ z-score flag.
    * The mean/σ derive from INTEGER window sums (Σx, Σx²) turned into
    * doubles through one explicitly-ordered expression chain, so both
    * engines compute identical floats; σ's variance is clamped at 0
    * before sqrt (float cancellation can dip a hair negative, and the
    * engines disagree on sqrt(-ε)). One (type, hr) aggregate + one
    * type-partitioned window pass — at 100 TB the window input is
    * hours × types, already tiny. */
  private val q38 = QDef(
    "q38_hourly_anomaly",
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr FROM events),
      |c AS (SELECT event_type, hr, COUNT(*) AS cnt FROM e GROUP BY event_type, hr),
      |w AS (
      |  SELECT event_type, hr, cnt,
      |    SUM(cnt) OVER tw AS s1, SUM(cnt * cnt) OVER tw AS s2, COUNT(*) OVER tw AS n
      |  FROM c
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY hr
      |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |m AS (
      |  SELECT event_type, hr, cnt,
      |    CASE WHEN n = 24 THEN CAST(s1 AS DOUBLE) / 24 END AS mu,
      |    CASE WHEN n = 24 THEN
      |      sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / 24) / 24,
      |                    CAST(0 AS DOUBLE))) END AS sigma
      |  FROM w),
      |z AS (
      |  SELECT event_type, hr, cnt, mu, sigma,
      |    CASE WHEN sigma > CAST(0 AS DOUBLE)
      |         THEN (CAST(cnt AS DOUBLE) - mu) / sigma END AS z
      |  FROM m)
      |SELECT event_type, CAST(hr AS BIGINT) AS hr, CAST(cnt AS BIGINT) AS cnt,
      |  mu, sigma, z, COALESCE(abs(z) > CAST(3 AS DOUBLE), FALSE) AS is_anomaly
      |FROM z ORDER BY event_type, hr""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select(col("event_type"), (unix_micros(col("ts")).cast("long")).as("us"))
      .withColumn("hr", expr("us div 3600000000"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    val tw = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-24, -1)
    val w = c
      .withColumn("s1", sum(col("cnt")).over(tw))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(tw))
      .withColumn("n", count(lit(1)).over(tw))
    val m = w
      .withColumn("mu", when(col("n") === 24, col("s1").cast("double") / lit(24)))
      .withColumn("sigma", when(col("n") === 24,
        sqrt(greatest(
          (col("s2").cast("double") - col("s1").cast("double") * col("s1") / lit(24)) / lit(24),
          lit(0.0).cast("double")))))
      .withColumn("z", when(col("sigma") > lit(0.0).cast("double"),
        (col("cnt").cast("double") - col("mu")) / col("sigma")))
    m.select(col("event_type"), col("hr").cast("long").as("hr"),
        col("cnt").cast("long").as("cnt"), col("mu"), col("sigma"), col("z"),
        coalesce(abs(col("z")) > lit(3.0).cast("double"), lit(false)).as("is_anomaly"))
      .orderBy(col("event_type"), col("hr"))
  }

  /** Peak session concurrency per hour via a DISTRIBUTED sweep-line:
    * session intervals (q20's 30-min-gap islands) become ±1 boundary
    * deltas, totally ordered by (us, start-before-end, user, session);
    * the running delta sum at each change point IS the live-session
    * count, and hours aggregate their change points' peaks. The global
    * running sum uses the t17 two-level prefix-sum shape — within-hour
    * cumsum (partitioned window) + exclusive per-hour offsets (the only
    * unpartitioned window scans ~one row per hour, never the deltas) —
    * so the sweep never funnels the corpus through one partition.
    * Touching sessions ([a,b] meeting [b,c]) count as overlapping:
    * starts sort before ends at the same instant. */
  private val q39 = QDef(
    "q39_peak_concurrency",
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
       |f AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
       |                       OR us - LAG(us) OVER w > 1800000000
       |                     THEN 1 ELSE 0 END AS new_s
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
       |g AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |      FROM f),
       |s AS (SELECT user_id, session_id, MIN(us) AS start_us, MAX(us) AS end_us
       |      FROM g GROUP BY user_id, session_id),
       |dl AS (
       |  SELECT start_us AS us, 1 AS d, user_id, session_id FROM s
       |  UNION ALL
       |  SELECT end_us AS us, -1 AS d, user_id, session_id FROM s),
       |r AS (
       |  SELECT us, d,
       |    CAST(SUM(d) OVER (ORDER BY us, d DESC, user_id, session_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
       |  FROM dl)
       |SELECT us // 3600000000 AS hr,
       |  MAX(conc + CASE WHEN d = -1 THEN 1 ELSE 0 END) AS max_concurrency,
       |  COUNT(*) AS n_changes,
       |  CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
       |FROM r GROUP BY us // 3600000000 ORDER BY hr""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val sess = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val deltas = sess
      .select(col("start_us").as("us"), lit(1).as("d"), col("user_id"), col("session_id"))
      .unionByName(sess.select(col("end_us").as("us"), lit(-1).as("d"),
        col("user_id"), col("session_id")))
      .withColumn("hr", expr("us div 3600000000"))
      .persistTracked() // within-hour cumsum + hour totals both scan it
    val wIn = Window.partitionBy(col("hr"))
      .orderBy(col("us"), col("d").desc, col("user_id"), col("session_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = deltas.groupBy(col("hr")).agg(sum(col("d")).as("tot"))
      .withColumn("off", sum(col("tot")).over(wOff) - col("tot"))
      .select(col("hr"), col("off"))
    deltas
      .withColumn("cum", sum(col("d")).over(wIn))
      .join(broadcast(off), Seq("hr"))
      .withColumn("conc", (col("off") + col("cum")).cast("long"))
      // the live count AT an instant: an end row's own -1 has not yet
      // taken effect at its timestamp (touching intervals overlap)
      .withColumn("point_conc", col("conc") + when(col("d") === -1, 1L).otherwise(0L))
      .groupBy(col("hr"))
      .agg(max(col("point_conc")).as("max_concurrency"),
        count(lit(1)).as("n_changes"),
        sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_starts"))
      .select(col("hr").cast("long").as("hr"), col("max_concurrency"),
        col("n_changes"), col("n_starts"))
      .orderBy(col("hr"))
  }

  /** Latest-wins upsert materialization (the CDC merge view / SCD
    * "current" table): the append-only event log collapses to one row
    * per (user, event_type) — the most recent value, its event time
    * (as epoch micros), and the version count. The standard way a
    * Spark pipeline materializes a keyed current-state table from a
    * changelog without a mutable store: one window over the key, kept
    * rows written out (deterministic tie-break on event_id; the
    * fixture has no timestamp collisions, asserted cheaply by the
    * n_versions sum matching the log size).
    *
    * Scale shape: ONE shuffle on the natural key; at 100 TB the same
    * pass runs per ingest batch against the previous snapshot (d11's
    * incremental shape applied to state). */
  private val q41 = QDef(
    "q41_upsert_latest",
    """WITH r AS (
      |  SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
      |  FROM events)
      |SELECT user_id, event_type, value AS latest_value, ts_us AS latest_ts_us,
      |  CAST(n_versions AS BIGINT) AS n_versions
      |FROM r WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val wCnt = Window.partitionBy(col("user_id"), col("event_type"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(wCnt))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("value").as("latest_value"),
        unix_micros(col("ts")).as("latest_ts_us"),
        col("n_versions"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Seasonal (hour-of-day) traffic baseline + load ratio — the
    * seasonality-aware companion to q38's trailing z-score: each
    * (event_type, hour) compares against the MEAN of its own
    * hour-of-day slot across the whole span, so a 3 am spike isn't
    * excused by the daily cycle the way a trailing window can. The
    * baseline averages over PRESENT hours (q35's gap-fill densifies if
    * silent hours should count as zero).
    *
    * Determinism: counts are exact integers; baseline is ONE IEEE
    * division (sum/hours), load_ratio one more — both engines chain
    * identically (the q38-proven pattern). Scale shape: two narrow-key
    * aggregates ((type, hr), (type, hod)) and a broadcast of the
    * 24×|types| baseline table — one corpus scan, map-side combined. */
  private val q42 = QDef(
    "q42_seasonal_baseline",
    """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr FROM events),
      |c AS (SELECT event_type, hr, COUNT(*) AS cnt FROM e GROUP BY event_type, hr),
      |b AS (SELECT event_type AS b_type, hr % 24 AS hod, CAST(SUM(cnt) AS BIGINT) AS tot,
      |        COUNT(*) AS n_hours
      |      FROM c GROUP BY event_type, hr % 24)
      |SELECT c.event_type, CAST(c.hr AS BIGINT) AS hr, CAST(c.cnt AS BIGINT) AS cnt,
      |  CAST(b.tot AS DOUBLE) / b.n_hours AS baseline,
      |  CAST(c.cnt AS DOUBLE) / (CAST(b.tot AS DOUBLE) / b.n_hours) AS load_ratio
      |FROM c JOIN b ON b.b_type = c.event_type AND b.hod = c.hr % 24
      |ORDER BY c.event_type, hr""".stripMargin) { (s, d) =>
    val c = Tables.events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("hr", expr("us div 3600000000"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("cnt"))
    val b = c.withColumn("hod", col("hr") % 24)
      .groupBy(col("event_type"), col("hod"))
      .agg(sum(col("cnt")).as("tot"), count(lit(1)).as("n_hours"))
    c.withColumn("hod", col("hr") % 24)
      .join(broadcast(b), Seq("event_type", "hod"))
      .select(col("event_type"), col("hr"), col("cnt"),
        (col("tot").cast("double") / col("n_hours")).as("baseline"),
        (col("cnt").cast("double") /
          (col("tot").cast("double") / col("n_hours"))).as("load_ratio"))
      .orderBy(col("event_type"), col("hr"))
  }

  /** Per-type top-5 users by exact total value — the leaderboard /
    * heavy-account query, served by the two-level
    * [[graft.operators.TopK]] aggregate rather than a row_number
    * window: after the (type, user) pre-aggregate, per-partition O(k)
    * partials merge per type, so no single task ever holds one type's
    * full user list (the 100 TB shape; a window would serialize each
    * type's millions of users into one partition). Value sums go
    * through [[graft.util.Det.dsum]] so ranking keys are
    * bit-deterministic; event counts ride TopK's `extra` payload slot. */
  private val q43 = QDef(
    "q43_type_top_users",
    s"""WITH s AS (
       |  SELECT event_type, user_id, ${sqlDsum("value")} AS total_value,
       |    count(*) AS n_events
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
       |        ORDER BY total_value DESC, user_id) AS rnk FROM s)
       |SELECT event_type, CAST(user_id AS BIGINT) AS user_id, total_value,
       |  CAST(n_events AS BIGINT) AS n_events, CAST(rnk AS INTEGER) AS rnk
       |FROM r WHERE rnk <= 5 ORDER BY event_type, rnk""".stripMargin) { (s, d) =>
    import graft.operators.TopK
    val sums = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(dsum(col("value")).as("total_value"),
        count(lit(1)).as("n_events"))
    TopK.topK(sums, Seq("event_type"), col("total_value"), col("user_id"),
        5, asc = false, extra = col("n_events"))
      .select(col("event_type"), col("id").as("user_id"),
        col("ordv").as("total_value"), col("extra").as("n_events"),
        col("rank").as("rnk"))
      .orderBy(col("event_type"), col("rnk"))
  }

  /** CUSUM changepoint per event type — where did the rate shift? The
    * classic cumulative-sum statistic over hourly counts: CUSUM_i =
    * Σ_{j≤i} (c_j − mean), peaking exactly where the level changes; the
    * report row is the hour of max |CUSUM| (earliest on ties) with the
    * signed peak and direction. The monitoring query behind "traffic
    * stepped up on the 22nd".
    *
    * Determinism: CUSUM_i = (H·prefix_i − i·S)/H with H = hour count
    * and S = total events — the numerator is pure BIGINT arithmetic,
    * ONE IEEE division at the end, so the oracle matches bit-exactly
    * (and argmax over |num| is an integer comparison).
    *
    * Scale shape: one (type, hour) pre-aggregate (map-side combined),
    * then windows over the per-type HOURLY series — partitions are
    * bounded by the time horizon (720 rows/month/type), never by event
    * volume, the same posture as q38/q39/q42. */
  private val q44 = QDef(
    "q44_cusum_changepoint",
    """WITH h AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d %H:00') AS hr, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, count(*) AS n_hours, sum(c) AS s FROM h GROUP BY 1),
      |p AS (
      |  SELECT event_type, hr, c,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY hr) AS pf,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS i
      |  FROM h),
      |n AS (
      |  SELECT p.event_type, p.hr, p.c,
      |    CAST(t.n_hours * p.pf - p.i * t.s AS BIGINT) AS num, t.n_hours
      |  FROM p JOIN t ON p.event_type = t.event_type),
      |mx AS (
      |  SELECT event_type, hr, c, num, n_hours,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY abs(num) DESC, hr) AS rk
      |  FROM n)
      |SELECT event_type, hr AS change_hr, CAST(c AS BIGINT) AS n_at_change,
      |  CAST(num AS DOUBLE) / n_hours AS cusum_peak, (num < 0) AS rising
      |FROM mx WHERE rk = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val h = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:00").as("hr"))
      .agg(count(lit(1)).as("c"))
      .persistTracked()
    val t = h.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("s"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val p = h
      .withColumn("pf", sum(col("c")).over(w))
      .withColumn("i", row_number().over(w))
    val n = p.join(t, Seq("event_type"))
      .withColumn("num", col("n_hours") * col("pf") - col("i") * col("s"))
    val wm = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("num")).desc, col("hr"))
    n.withColumn("rk", row_number().over(wm))
      .where(col("rk") === 1)
      .select(col("event_type"), col("hr").as("change_hr"),
        col("c").as("n_at_change"),
        (col("num").cast("double") / col("n_hours")).as("cusum_peak"),
        (col("num") < 0).as("rising"))
      .orderBy(col("event_type"))
  }

  /** Daily value-distribution bands per event type — the SLO/latency
    * report shape: exact interpolated P50/P95/P99 of `value` per
    * (type, day), plus the count. Spark's `percentile` and DuckDB's
    * `quantile_cont` compute the same R-7 interpolation bit-exactly
    * (q25's proven parity, here grouped 5×31 ways).
    *
    * Scale shape: one hash aggregate keyed (type, day); exact
    * percentile state is the per-group value multiset — the honest
    * exact form (the approx path is percentile_approx/ApproxAggSpec);
    * groups are day-bounded so state per key is bounded by daily
    * volume, and the shuffle carries (key, value) pairs only. */
  private val q45 = QDef(
    "q45_daily_value_bands",
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |  count(*) AS n,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.95) AS p95,
      |  quantile_cont(value, 0.99) AS p99
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, 0.5D)").as("p50"),
        expr("percentile(value, 0.95D)").as("p95"),
        expr("percentile(value, 0.99D)").as("p99"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Event-type Markov transition matrix — per user's chronological
    * event stream, the next-event counts and probabilities P(dst|src):
    * the behavior-model input (what follows a signup?) and the anomaly
    * prior (a transition with p≈0 appearing in force is an incident).
    * Each probability row-sums to 1 per source type.
    *
    * Scale shape: ONE user-keyed window (lag/lead over each user's own
    * events — partition width = a user's event count, the q20/q37
    * posture) feeding a (src, dst) aggregate of at most |types|² rows;
    * probabilities are ONE division of exact counts. Tie order inside
    * a user's stream is pinned by (ts, event_id) in both engines. */
  private val q47 = QDef(
    "q47_event_transitions",
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |t AS (SELECT event_type AS src, nxt AS dst, count(*) AS n
      |  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT src AS src2, sum(n) AS n_src FROM t GROUP BY 1)
      |SELECT t.src, t.dst, CAST(t.n AS BIGINT) AS n,
      |  CAST(t.n AS DOUBLE) / tot.n_src AS p,
      |  CAST(tot.n_src AS BIGINT) AS n_src
      |FROM t JOIN tot ON t.src = tot.src2 ORDER BY t.src, t.dst""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val t = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .where(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("n"))
      .persistTracked()
    val tot = t.groupBy(col("src").as("src2")).agg(sum(col("n")).as("n_src"))
    t.join(tot, col("src") === col("src2"))
      .select(col("src"), col("dst"), col("n"),
        (col("n").cast("double") / col("n_src")).as("p"),
        col("n_src"))
      .orderBy(col("src"), col("dst"))
  }

  /** Top session paths — behavior path mining: per 30-minute-gap user
    * session (q20's sessionization), the path of the first 5 event
    * types ('view>click>purchase'), counted across all sessions; paths
    * seen ≥10× ranked by frequency (with a truncation count for
    * sessions longer than the prefix). The funnel-discovery complement
    * of q47's pairwise transitions.
    *
    * Scale shape: sessionization is q20's user-keyed gaps-and-islands
    * windows; the path string is built from a per-SESSION sorted
    * collect bounded by the 5-event prefix (slice before join — the
    * collected array is bounded by session length, never user
    * history); then one path-keyed count. The final top-30 is bounded
    * output, ordered deterministically by (count desc, path). */
  private val q48 = QDef(
    "q48_session_paths",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |f AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid FROM f),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS rn,
      |        COUNT(*) OVER (PARTITION BY user_id, sid) AS slen
      |      FROM g),
      |p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY us, event_id) AS path,
      |        max(slen) AS slen
      |      FROM r WHERE rn <= 5 GROUP BY user_id, sid)
      |SELECT path, count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN slen > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
      |FROM p GROUP BY path HAVING count(*) >= 10
      |ORDER BY n_sessions DESC, path LIMIT 30""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val g = e
      .withColumn("brk",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(w))
    val p = g.groupBy(col("user_id"), col("sid"))
      .agg(
        array_join(expr(
          "transform(slice(array_sort(collect_list(struct(us, event_id, event_type))), 1, 5), s -> s.event_type)"),
          ">").as("path"),
        count(lit(1)).as("slen"))
    p.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("slen") > 5, 1L).otherwise(0L)).as("n_truncated"))
      .where(col("n_sessions") >= 10)
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(30)
  }

  /** Last-touch attribution — the conversion-credit report: each
    * purchase is attributed to the user's most recent preceding
    * non-purchase event within a 7-day lookback ('none' when the
    * purchase is cold), then purchases and revenue roll up by touch
    * type. The marketing-analytics staple that q48's funnel paths and
    * q47's transition matrix feed into.
    *
    * Scale shape: ONE user-keyed window (last-ignore-nulls over an
    * unbounded-preceding frame — Spark evaluates it in a single
    * streaming pass per user, state is one value, not the history)
    * and one 5-row aggregate; the share denominator is a window sum
    * over the 5 grouped rows, not a second scan. Revenue sums are
    * exact decimal ([[graft.util.Det.dsum]]). */
  private val q49 = QDef(
    "q49_last_touch_attribution",
    s"""WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
      |t AS (SELECT *,
      |        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |          OVER w AS touch_type,
      |        last_value(CASE WHEN event_type <> 'purchase' THEN us END IGNORE NULLS)
      |          OVER w AS touch_us
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |p AS (SELECT CASE WHEN touch_us IS NOT NULL AND us - touch_us <= 604800000000
      |               THEN touch_type ELSE 'none' END AS touch_type, value
      |      FROM t WHERE event_type = 'purchase')
      |SELECT touch_type, COUNT(*) AS n_purchases,
      |  ${sqlDsum("value")} AS attributed_value,
      |  CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
      |FROM p GROUP BY touch_type ORDER BY touch_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"))
    val t = e
      .withColumn("touch_type",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .withColumn("touch_us",
        last(when(col("event_type") =!= "purchase", col("us")),
          ignoreNulls = true).over(w))
    val p = t.filter(col("event_type") === "purchase")
      .select(
        when(col("touch_us").isNotNull &&
          col("us") - col("touch_us") <= 604800000000L,
          col("touch_type")).otherwise("none").as("touch_type"),
        col("value"))
    p.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("attributed_value"))
      .withColumn("share",
        col("n_purchases").cast("double") /
          sum(col("n_purchases")).over(Window.partitionBy()))
      .orderBy(col("touch_type"))
  }

  /** Funnel conversion — the ordered view→click→purchase completion
    * report over q48's 30-minute sessions: a session converts stage k
    * only if the stage-k event happens strictly AFTER the previous
    * stage's first completion ((us, event_id) struct order, so
    * same-microsecond ties break identically in both engines). The
    * output is the one-row funnel card: session counts per stage and
    * the per-stage conversion ratios (NULL-guarded divisions — the
    * honest answer on this fixture's uniform event types is a funnel
    * that decays ~5× per stage).
    *
    * Scale shape: sessionization is the user-keyed window pair; each
    * stage is one session-keyed aggregate + one session-keyed join
    * (three total, same key — AQE coalesces the exchanges), and the
    * final card is a single global aggregate over one row per
    * session. Nothing is ever pairwise and no session's events are
    * ever collected into an array. */
  private val q50 = QDef(
    "q50_funnel_conversion",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |f AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid FROM f),
      |s1 AS (SELECT user_id, sid,
      |         min(CASE WHEN event_type = 'view' THEN struct_pack(us := us, eid := event_id) END) AS t1
      |       FROM g GROUP BY user_id, sid),
      |s2 AS (SELECT g.user_id, g.sid,
      |         min(CASE WHEN g.event_type = 'click' AND struct_pack(us := g.us, eid := g.event_id) > s1.t1
      |               THEN struct_pack(us := g.us, eid := g.event_id) END) AS t2
      |       FROM g JOIN s1 USING (user_id, sid) GROUP BY g.user_id, g.sid),
      |s3 AS (SELECT g.user_id, g.sid,
      |         min(CASE WHEN g.event_type = 'purchase' AND struct_pack(us := g.us, eid := g.event_id) > s2.t2
      |               THEN struct_pack(us := g.us, eid := g.event_id) END) AS t3
      |       FROM g JOIN s2 USING (user_id, sid) GROUP BY g.user_id, g.sid),
      |j AS (SELECT s1.user_id, s1.sid, s1.t1, s2.t2, s3.t3
      |      FROM s1 JOIN s2 USING (user_id, sid) JOIN s3 USING (user_id, sid))
      |SELECT count(*) AS n_sessions,
      |  CAST(count(t1) AS BIGINT) AS n_view,
      |  CAST(count(t2) AS BIGINT) AS n_view_click,
      |  CAST(count(t3) AS BIGINT) AS n_full_funnel,
      |  CASE WHEN count(*) = 0 THEN NULL
      |       ELSE CAST(count(t1) AS DOUBLE) / count(*) END AS r_view,
      |  CASE WHEN count(t1) = 0 THEN NULL
      |       ELSE CAST(count(t2) AS DOUBLE) / count(t1) END AS r_click_given_view,
      |  CASE WHEN count(t2) = 0 THEN NULL
      |       ELSE CAST(count(t3) AS DOUBLE) / count(t2) END AS r_purchase_given_click
      |FROM j""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val ev = e
      .withColumn("brk",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(w))
      .select(col("user_id"), col("sid"), col("event_type"),
        struct(col("us"), col("event_id").as("eid")).as("t"))
    // The three stage minima chain as session-keyed WINDOWS over the
    // rows the sessionization pass already shuffled (guide §2.4: window
    // partitioned by a superset of the prior partitioning needs no new
    // exchange): t1 is the session min over views, t2/t3 reference the
    // previous stage's window column in their own filter — each stage
    // is one WindowExec on the same hash(user_id) distribution. r13's
    // shape ran each stage as a separate aggregate re-joined to the
    // persisted session frame (3 aggregates + 3 session-keyed joins);
    // the chained windows compute the identical minima (same rows, same
    // struct order, same NULL propagation when a stage is absent), and
    // one per-session dedup aggregate replaces the join chain. The
    // session persist is gone with the re-reads.
    val wp = Window.partitionBy(col("user_id"), col("sid"))
    ev
      .withColumn("t1",
        min(when(col("event_type") === "view", col("t"))).over(wp))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("t") > col("t1"),
          col("t"))).over(wp))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("t") > col("t2"),
          col("t"))).over(wp))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
        min(col("t3")).as("t3"))
      .agg(count(lit(1)).as("n_sessions"), count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"), count(col("t3")).as("n_full_funnel"))
      .select(col("n_sessions"), col("n_view"), col("n_view_click"),
        col("n_full_funnel"),
        when(col("n_sessions") === 0, lit(null))
          .otherwise(col("n_view").cast("double") / col("n_sessions"))
          .as("r_view"),
        when(col("n_view") === 0, lit(null))
          .otherwise(col("n_view_click").cast("double") / col("n_view"))
          .as("r_click_given_view"),
        when(col("n_view_click") === 0, lit(null))
          .otherwise(col("n_full_funnel").cast("double") / col("n_view_click"))
          .as("r_purchase_given_click"))
  }

  /** Touch-to-purchase latency — q49's timing companion: for each
    * converted purchase (a non-purchase touch within the 7-day
    * lookback), the touch→purchase latency distribution per touch
    * type (exact interpolated P50/P90 + max, the q45-proven
    * `percentile` ≡ `quantile_cont` pair). The "how long does
    * conversion take per channel" card that sizes attribution
    * windows.
    *
    * Scale shape: identical to q49 — ONE user-keyed last-ignore-nulls
    * window, O(1) state per user — then a 5-group percentile
    * aggregate whose state is bounded by per-type conversion counts. */
  private val q51 = QDef(
    "q51_conversion_latency",
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      |t AS (SELECT *,
      |        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |          OVER w AS touch_type,
      |        last_value(CASE WHEN event_type <> 'purchase' THEN us END IGNORE NULLS)
      |          OVER w AS touch_us
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |p AS (SELECT touch_type, us - touch_us AS lat_us FROM t
      |      WHERE event_type = 'purchase' AND touch_us IS NOT NULL
      |        AND us - touch_us <= 604800000000)
      |SELECT touch_type, count(*) AS n_conversions,
      |  quantile_cont(lat_us, 0.5) AS p50_latency_us,
      |  quantile_cont(lat_us, 0.9) AS p90_latency_us,
      |  CAST(max(lat_us) AS BIGINT) AS max_latency_us
      |FROM p GROUP BY touch_type ORDER BY touch_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    e.withColumn("touch_type",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .withColumn("touch_us",
        last(when(col("event_type") =!= "purchase", col("us")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("touch_us").isNotNull &&
        col("us") - col("touch_us") <= 604800000000L)
      .select(col("touch_type"), (col("us") - col("touch_us")).as("lat_us"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        percentile(col("lat_us"), lit(0.5)).as("p50_latency_us"),
        percentile(col("lat_us"), lit(0.9)).as("p90_latency_us"),
        max(col("lat_us")).as("max_latency_us"))
      .orderBy(col("touch_type"))
  }

  /** RFM customer segmentation over purchase events: per user, recency
    * (hours since last purchase, against the corpus-max anchor),
    * frequency (purchase count) and monetary (exact decimal value sum),
    * each cut into quartiles by NTILE(4) with fully deterministic tie
    * orders, then a champion / loyal / at_risk / regular label from the
    * quartile triple — the standard CRM segmentation batch job.
    *
    * Scale shape: events collapse to ONE user-key aggregate (map-side
    * combined) before anything else; the NTILE windows run over
    * user-level rows only (~0.1% of events — the t19 "grouped rows only"
    * exemption; at 100 TB the quartile edges would come from
    * approx-percentiles instead of a rank pass). */
  private val q52 = QDef(
    "q52_rfm_segments",
    s"""WITH p AS (SELECT user_id, epoch_us(ts) AS us, value FROM events
       |           WHERE event_type = 'purchase'),
       |a AS (SELECT MAX(us) AS anchor_us FROM p),
       |u AS (
       |  SELECT user_id,
       |    CAST((a.anchor_us - MAX(us)) // 3600000000 AS BIGINT) AS recency_h,
       |    COUNT(*) AS frequency, ${sqlDsum("value")} AS monetary
       |  FROM p CROSS JOIN a GROUP BY user_id, a.anchor_us),
       |q AS (
       |  SELECT *,
       |    NTILE(4) OVER (ORDER BY recency_h, user_id) AS r_q,
       |    NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
       |    NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
       |  FROM u)
       |SELECT user_id, recency_h, frequency, monetary,
       |  CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
       |  CAST(m_q AS INTEGER) AS m_q,
       |  CASE WHEN r_q = 1 AND f_q = 1 AND m_q = 1 THEN 'champion'
       |       WHEN r_q <= 2 AND f_q <= 2 THEN 'loyal'
       |       WHEN r_q >= 3 AND f_q <= 2 THEN 'at_risk'
       |       ELSE 'regular' END AS segment
       |FROM q ORDER BY user_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
    val a = p.agg(max(col("us")).as("anchor_us"))
    val u = p.crossJoin(broadcast(a))
      .groupBy(col("user_id"), col("anchor_us"))
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("frequency"),
        dsum(col("value")).as("monetary"))
      .withColumn("recency_h",
        expr("(anchor_us - last_us) div 3600000000"))
    u.withColumn("r_q",
        ntile(4).over(Window.orderBy(col("recency_h"), col("user_id"))))
      .withColumn("f_q",
        ntile(4).over(Window.orderBy(col("frequency").desc, col("user_id"))))
      .withColumn("m_q",
        ntile(4).over(Window.orderBy(col("monetary").desc, col("user_id"))))
      .withColumn("segment",
        when(col("r_q") === 1 && col("f_q") === 1 && col("m_q") === 1, "champion")
          .when(col("r_q") <= 2 && col("f_q") <= 2, "loyal")
          .when(col("r_q") >= 3 && col("f_q") <= 2, "at_risk")
          .otherwise("regular"))
      .select(col("user_id"), col("recency_h"), col("frequency"), col("monetary"),
        col("r_q").cast("int").as("r_q"), col("f_q").cast("int").as("f_q"),
        col("m_q").cast("int").as("m_q"), col("segment"))
      .orderBy(col("user_id"))
  }

  /** k-anonymity audit over behavioral quasi-identifiers: each user's
    * signature is their sorted distinct event-type set plus two
    * generalized bands (activity = n_events div 20, hour-coverage =
    * distinct hours div 6 — generalization is exactly how k-anonymity
    * coarsens attributes); k is the number of users sharing a
    * signature. The release-risk histogram (how many signatures/users
    * sit at each k, with the k < 5 re-identification flag) is the
    * privacy gate run before publishing event-derived features —
    * Sweeney's k-anonymity applied to behavioral traces.
    *
    * Scale shape: events collapse to one user-key distinct-set
    * aggregate (map-side combined), then a signature-key count, then a
    * k-key histogram — three shuffles over strictly shrinking data.
    * The signature is a sorted distinct set, so Spark's unordered
    * collect_set and DuckDB's unordered list() agree deterministically
    * after sort. */
  private val q53 = QDef(
    "q53_k_anonymity",
    """WITH sig AS (
      |  SELECT user_id,
      |    array_to_string(list_sort(list_distinct(list(event_type))), ',')
      |      || '|' || CAST(COUNT(*) // 20 AS VARCHAR)
      |      || '|' || CAST(COUNT(DISTINCT hour(ts)) // 6 AS VARCHAR) AS sig
      |  FROM events GROUP BY user_id),
      |g AS (SELECT sig, COUNT(*) AS k FROM sig GROUP BY sig)
      |SELECT k, COUNT(*) AS n_signatures,
      |  CAST(k * COUNT(*) AS BIGINT) AS n_users,
      |  k < 5 AS at_risk
      |FROM g GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
    val sig = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
        count(lit(1)).as("n"),
        countDistinct(hour(col("ts"))).as("nh"))
      .select(concat(col("types"),
        lit("|"), expr("n div 20").cast("string"),
        lit("|"), expr("nh div 6").cast("string")).as("sig"))
    sig.groupBy(col("sig")).agg(count(lit(1)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_signatures"))
      .select(col("k"), col("n_signatures"),
        (col("k") * col("n_signatures")).as("n_users"),
        (col("k") < 5).as("at_risk"))
      .orderBy(col("k"))
  }

  /** Hop-window (sliding) event rates — the window-TVF shape q19's
    * tumble and q26's session don't cover: 2-hour windows hopping every
    * hour, so each event lands in exactly two windows. Batch semantics
    * identical to Structured Streaming's `window(ts, '2 hours',
    * '1 hour')`: the window explode is a constant ×(size/hop) blow-up
    * keyed by window start, then one map-side-combined aggregate —
    * window keys are epoch-hour integers, so both engines bucket
    * identically with zero timezone/format ambiguity.
    *
    * Scale shape: explode factor is size/hop (2 here) — a constant
    * row multiplier before a key aggregate, the same cost model the
    * streaming engine pays; no windows ever materialize per-user
    * state. */
  private val q54 = QDef(
    "q54_hop_window_rates",
    s"""WITH e AS (
       |  SELECT event_type, value, epoch_us(ts) // 3600000000 AS hr FROM events),
       |x AS (
       |  SELECT event_type, value, hr - f.i AS win_start_hr
       |  FROM e, unnest(range(0, 2)) AS f(i) WHERE hr - f.i >= 0),
       |a AS (
       |  SELECT win_start_hr, event_type, COUNT(*) AS n,
       |    ${sqlDsum("value")} AS total_value
       |  FROM x GROUP BY win_start_hr, event_type)
       |SELECT CAST(win_start_hr AS BIGINT) AS win_start_hr, event_type, n,
       |  total_value, CAST(n AS DOUBLE) / 2.0 AS per_hour_rate
       |FROM a ORDER BY win_start_hr, event_type""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_type"), col("value"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
    e.select(col("event_type"), col("value"), col("hr"),
        explode(sequence(lit(0), lit(1))).as("i"))
      .withColumn("win_start_hr", col("hr") - col("i"))
      .filter(col("win_start_hr") >= 0)
      .groupBy(col("win_start_hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("win_start_hr"), col("event_type"), col("n"),
        col("total_value"),
        (col("n").cast("double") / lit(2.0)).as("per_hour_rate"))
      .orderBy(col("win_start_hr"), col("event_type"))
  }

  /** A/B experiment readout — the two-proportion z-test every growth
    * team runs: users are assigned to arms by the first hex digit of
    * md5(user_id) (deterministic, reproducible, balanced — the
    * hash-based traffic split production experiment systems use),
    * conversion = the user has at least one purchase event; the card
    * reports per-arm sizes/conversions/rates, absolute lift, and the
    * pooled-variance z statistic. Every input is an integer count; the
    * float chain is a fixed sequence of IEEE divisions and one sqrt,
    * identical in both engines.
    *
    * Scale shape: events collapse to ONE map-side-combined user
    * aggregate, then a 2-row arm aggregate, then single-row arithmetic —
    * nothing downstream of the first aggregate depends on event volume. */
  private val q55 = QDef(
    "q55_ab_test_card",
    """WITH u AS (
      |  SELECT user_id,
      |    substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
      |      IN ('0','1','2','3','4','5','6','7') AS arm_a,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT
      |    SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS n_a,
      |    SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS n_b,
      |    SUM(CASE WHEN arm_a THEN conv ELSE 0 END) AS conv_a,
      |    SUM(CASE WHEN arm_a THEN 0 ELSE conv END) AS conv_b
      |  FROM u)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
      |  CAST(conv_a AS DOUBLE) / NULLIF(n_a, 0) AS rate_a,
      |  CAST(conv_b AS DOUBLE) / NULLIF(n_b, 0) AS rate_b,
      |  (CAST(conv_a AS DOUBLE) / NULLIF(n_a, 0)) -
      |    (CAST(conv_b AS DOUBLE) / NULLIF(n_b, 0)) AS lift,
      |  ((CAST(conv_a AS DOUBLE) / NULLIF(n_a, 0)) -
      |   (CAST(conv_b AS DOUBLE) / NULLIF(n_b, 0))) /
      |    NULLIF(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
      |         (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
      |         (1.0 / NULLIF(n_a, 0) + 1.0 / NULLIF(n_b, 0))), 0.0) AS z_score
      |FROM a""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      .withColumn("arm_a",
        substring(md5(col("user_id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"))
    val a = u.agg(
      sum(when(col("arm_a"), 1).otherwise(0)).as("n_a"),
      sum(when(col("arm_a"), 0).otherwise(1)).as("n_b"),
      sum(when(col("arm_a"), col("conv")).otherwise(0)).as("conv_a"),
      sum(when(col("arm_a"), 0).otherwise(col("conv"))).as("conv_b"))
    // NULLIF guards: a degenerate corpus (empty arm, all-or-none
    // conversion → zero pooled variance) yields NULL, never an ANSI
    // divide-by-zero — mirrored exactly in the oracle SQL
    val rateA = col("conv_a").cast("double") / nullif(col("n_a"), lit(0))
    val rateB = col("conv_b").cast("double") / nullif(col("n_b"), lit(0))
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / nullif(col("n_a"), lit(0)) +
        lit(1.0) / nullif(col("n_b"), lit(0))))
    a.select(
      col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
      col("conv_a").cast("long").as("conv_a"),
      col("conv_b").cast("long").as("conv_b"),
      rateA.as("rate_a"), rateB.as("rate_b"),
      (rateA - rateB).as("lift"),
      ((rateA - rateB) / nullif(se, lit(0.0))).as("z_score"))
  }

  /** DAU / WAU stickiness — the daily-engagement ratio every product
    * dashboard leads with: per epoch-day, distinct daily actives, the
    * trailing-7-day distinct actives, and DAU/WAU. The trailing
    * distinct is NOT a per-day window scan: each (day, user) pair
    * explodes into the ≤7 future days whose week it belongs to (q54's
    * constant-factor hop trick), and WAU is then one plain distinct
    * aggregate — the streaming-compatible shape, no distinct-in-window.
    *
    * Scale shape: events collapse to distinct (day, user) pairs first
    * (map-side combined), the explode is a constant ×7 on that already
    * tiny table, and every aggregate is keyed by day — nothing is
    * user×user or day×day. Integer counts, ONE IEEE division. */
  private val q57 = QDef(
    "q57_dau_wau_stickiness",
    """WITH du AS (
      |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_num, user_id
      |  FROM events),
      |dau AS (SELECT day_num, COUNT(*) AS dau FROM du GROUP BY day_num),
      |wx AS (
      |  SELECT DISTINCT du.day_num + f.i AS day_num, du.user_id
      |  FROM du, unnest(range(0, 7)) AS f(i)),
      |wau AS (SELECT day_num, COUNT(*) AS wau FROM wx GROUP BY day_num)
      |SELECT d.day_num AS day_num, d.dau AS dau, w.wau AS wau,
      |  CAST(d.dau AS DOUBLE) / w.wau AS stickiness
      |FROM dau d JOIN wau w ON d.day_num = w.day_num
      |ORDER BY day_num""".stripMargin) { (s, d) =>
    val du = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day_num"),
        col("user_id"))
      .distinct()
    val dau = du.groupBy(col("day_num")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("i"), col("day_num"))
      .select((col("day_num") + col("i")).as("day_num"), col("user_id"))
      .distinct()
      .groupBy(col("day_num")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day_num"))
      .select(col("day_num"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau")).as("stickiness"))
      .orderBy(col("day_num"))
  }

  /** SCD Type-2 history materialization — q41's latest-wins upsert kept
    * the CURRENT row per key; this builds the full slowly-changing-
    * dimension table warehouses keep instead: every version of each
    * (user, event_type) key becomes a row with its validity interval
    * [valid_from, valid_to) (half-open, `valid_to` = next version's
    * start, NULL while current), a per-key version ordinal, and the
    * is_current flag — the standard "as of any past instant" dimension
    * without a mutable store. Tie order inside a key is pinned by
    * (ts, event_id) in both engines.
    *
    * Scale shape: ONE key-partitioned window pass (lead + row_number
    * over the same ordering share a single sort), partition width = a
    * key's version count — the q20/q37/q41 posture; no joins, no
    * driver state. */
  private val q59 = QDef(
    "q59_scd2_history",
    """SELECT user_id, event_type, value,
      |  epoch_us(ts) AS valid_from_us,
      |  LEAD(epoch_us(ts)) OVER w AS valid_to_us,
      |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
      |  (LEAD(epoch_us(ts)) OVER w IS NULL) AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id, event_type
      |             ORDER BY ts, event_id)
      |ORDER BY user_id, event_type, version""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("valid_from_us"),
        lead(unix_micros(col("ts")), 1).over(w).as("valid_to_us"),
        row_number().over(w).as("version"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .orderBy(col("user_id"), col("event_type"), col("version"))
  }

  /** Weekday × hour traffic heatmap — the 7×24 seasonality profile
    * behind q42's hour-only baseline (staffing, maintenance-window
    * placement, and the prior for weekday-aware anomaly gates). Day of
    * week comes from EPOCH-DAY ARITHMETIC ((day+3) mod 7, 0 = Monday —
    * 1970-01-01 was a Thursday), NOT from the engines' dayofweek()
    * functions, whose numbering conventions differ; hours are epoch-
    * hour mod 24. Every cell carries its exact count, decimal-exact
    * value sum, share of total (one division), and an is_peak flag
    * from a window over the ≤168 grouped cells.
    *
    * Scale shape: one map-side-combined (dow, hour) aggregate; the
    * only window scans the 168-row cell table. */
  private val q61 = QDef(
    "q61_weekday_hour_heatmap",
    s"""WITH e AS (
       |  SELECT (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
       |    (epoch_us(ts) // 3600000000) % 24 AS hod, value
       |  FROM events),
       |c AS (
       |  SELECT dow, hod, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |  FROM e GROUP BY dow, hod),
       |t AS (SELECT SUM(n) AS nt, MAX(n) AS mx FROM c)
       |SELECT CAST(c.dow AS BIGINT) AS dow, CAST(c.hod AS BIGINT) AS hod,
       |  c.n, c.total_value,
       |  CAST(c.n AS DOUBLE) / t.nt AS share,
       |  c.n = t.mx AS is_peak
       |FROM c CROSS JOIN t ORDER BY dow, hod""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(expr("(unix_micros(ts) div 86400000000 + 3) % 7").as("dow"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hod"),
        col("value"))
    val c = e.groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    val t = c.agg(sum(col("n")).as("nt"), max(col("n")).as("mx"))
    c.crossJoin(broadcast(t))
      .select(col("dow"), col("hod"), col("n"), col("total_value"),
        (col("n").cast("double") / col("nt")).as("share"),
        (col("n") === col("mx")).as("is_peak"))
      .orderBy(col("dow"), col("hod"))
  }

  /** User-concentration card — Gini coefficient and top-share of the
    * per-user event-count distribution (the "how heavy-tailed is our
    * traffic" readout behind rate limiting and whale analysis). The
    * Gini over sorted counts ((2·Σ rᵢxᵢ − (U+1)·ΣX) / (U·ΣX)) is
    * computed WITHOUT ranking individual users: within a tie group of
    * equal count n (cnt users, `off` users below), Σ rᵢxᵢ collapses to
    * n·(off·cnt + cnt·(cnt+1)/2) in closed form — so the only window
    * runs over DISTINCT count values. Top-k shares slice the same tiny
    * table by cumulative count, taking tie-group fractions exactly.
    * Everything is BIGINT until the three final divisions.
    *
    * Scale shape: one map-side-combined user aggregate, one count-value
    * aggregate, one window over distinct count values (bounded by the
    * count distribution's support, not by users) — the t19/t17 "windows
    * over grouped rows only" discipline. */
  private val q56 = QDef(
    "q56_user_concentration",
    """WITH u AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
      |g AS (SELECT n, COUNT(*) AS cnt FROM u GROUP BY n),
      |w AS (
      |  SELECT n, cnt,
      |    COALESCE(SUM(cnt) OVER (ORDER BY n
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
      |    COALESCE(SUM(cnt) OVER (ORDER BY n DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
      |  FROM g),
      |t AS (
      |  SELECT
      |    SUM(cnt) AS n_users, SUM(n * cnt) AS n_events,
      |    SUM(n * (off * cnt + cnt * (cnt + 1) // 2)) AS srx
      |  FROM w),
      |tk AS (
      |  SELECT
      |    SUM(n * LEAST(cnt, GREATEST((SELECT SUM(cnt) FROM w) // 10 - above, 0)))
      |      AS top10_events,
      |    SUM(n * LEAST(cnt, GREATEST((SELECT SUM(cnt) FROM w) // 100 - above, 0)))
      |      AS top1_events
      |  FROM w)
      |SELECT CAST(n_users AS BIGINT) AS n_users,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  CAST(2 * srx - (n_users + 1) * n_events AS DOUBLE) /
      |    CAST(n_users * n_events AS DOUBLE) AS gini,
      |  CAST(top10_events AS DOUBLE) / n_events AS top10_share,
      |  CAST(top1_events AS DOUBLE) / n_events AS top1_share
      |FROM t CROSS JOIN tk""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    val g = u.groupBy(col("n")).agg(count(lit(1)).as("cnt"))
    val asc = Window.orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.orderBy(col("n").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val w = g.select(col("n"), col("cnt"),
      coalesce(sum(col("cnt")).over(asc), lit(0L)).as("off"),
      coalesce(sum(col("cnt")).over(desc), lit(0L)).as("above"))
    val t = w.agg(
      sum(col("cnt")).as("n_users"),
      sum(col("n") * col("cnt")).as("n_events"),
      sum(col("n") * (col("off") * col("cnt") +
        expr("cnt * (cnt + 1) div 2"))).as("srx"))
    // tie-group fractional take for the top-k cut: k = U div 10 (div 100)
    val tk = w.crossJoin(broadcast(t.select(col("n_users"))))
      .agg(
        sum(col("n") * least(col("cnt"),
          greatest(expr("n_users div 10") - col("above"), lit(0L)))).as("top10_events"),
        sum(col("n") * least(col("cnt"),
          greatest(expr("n_users div 100") - col("above"), lit(0L)))).as("top1_events"))
    t.crossJoin(broadcast(tk)).select(
      col("n_users").cast("long").as("n_users"),
      col("n_events").cast("long").as("n_events"),
      ((lit(2) * col("srx") - (col("n_users") + 1) * col("n_events")).cast("double") /
        (col("n_users") * col("n_events")).cast("double")).as("gini"),
      (col("top10_events").cast("double") / col("n_events")).as("top10_share"),
      (col("top1_events").cast("double") / col("n_events")).as("top1_share"))
  }

  /** Linear multi-touch attribution — q49's equal-credit counterpart:
    * every non-purchase touch strictly preceding a purchase (by the
    * (us, event_id) row order) within the 7-day lookback shares the
    * purchase value equally; untouched purchases fall in the 'none'
    * bucket at full value. The touch-to-purchase pairing runs through
    * [[RangeJoin.pointInInterval]] on a composite (user, second) axis
    * — user_id * 4e9 + seconds stays under 2^53 so the double bin
    * arithmetic is exact, the 7-day lookback never crosses a user
    * boundary, and the bin prefilter is conservative (second-floored)
    * with the exact microsecond refine applied after — one bin-key
    * shuffle, never a per-user cross product. */
  private val q71 = QDef(
    "q71_linear_attribution",
    s"""WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
       |p AS (SELECT user_id, event_id AS p_id, us AS p_us, value FROM e WHERE event_type = 'purchase'),
       |t AS (SELECT user_id, event_id AS t_id, us AS t_us, event_type AS t_type
       |      FROM e WHERE event_type <> 'purchase'),
       |pairs AS (
       |  SELECT p.p_id, p.value, t.t_type
       |  FROM p JOIN t ON p.user_id = t.user_id
       |   AND (t.t_us < p.p_us OR (t.t_us = p.p_us AND t.t_id < p.p_id))
       |   AND p.p_us - t.t_us <= 604800000000),
       |cnt AS (SELECT p_id, COUNT(*) AS n FROM pairs GROUP BY p_id),
       |credit AS (
       |  SELECT pairs.t_type AS touch_type, pairs.value / cnt.n AS credit
       |  FROM pairs JOIN cnt USING (p_id)
       |  UNION ALL
       |  SELECT 'none', p.value FROM p
       |  WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.p_id = p.p_id))
       |SELECT touch_type, COUNT(*) AS n_credits,
       |  ${sqlDsum("credit")} AS attributed_value
       |FROM credit GROUP BY touch_type ORDER BY touch_type""".stripMargin) { (s, d) =>
    val OffSec = 4000000000L // per-user offset on the seconds axis; composite stays < 2^53
    val Look = 604800000000L
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("us").as("p_us"), col("value"))
      .withColumn("lo", col("p_user") * OffSec + ((col("p_us") - Look).cast("long") / 1000000L).cast("long"))
      .withColumn("hi", col("p_user") * OffSec + (col("p_us") / 1000000L).cast("long"))
    val t = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
        col("us").as("t_us"), col("event_type").as("t_type"))
      .withColumn("x", col("t_user") * OffSec + (col("t_us") / 1000000L).cast("long"))
    val pairs = RangeJoin.pointInInterval(
        t, p.drop("p_user"), "x", "lo", "hi", binWidth = 604800.0)
      .where((col("t_us") < col("p_us") ||
          (col("t_us") === col("p_us") && col("t_id") < col("p_id"))) &&
        col("p_us") - col("t_us") <= Look)
      .select(col("p_id"), col("value"), col("t_type"))
      .persistTracked()
    val cnt = pairs.groupBy(col("p_id")).agg(count(lit(1)).as("n"))
    val credit = pairs.join(cnt, "p_id")
      .select(col("t_type").as("touch_type"), (col("value") / col("n")).as("credit"))
      .unionAll(
        p.join(pairs.select("p_id").distinct(), Seq("p_id"), "left_anti")
          .select(lit("none").as("touch_type"), col("value").as("credit")))
    credit.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_credits"), dsum(col("credit")).as("attributed_value"))
      .orderBy(col("touch_type"))
  }

  /** Cross-engine datetime battery — the calendar functions a PG user
    * expects, restricted to the forms whose semantics actually agree
    * across engines (EXTRACT fields, ISO week, month/week truncation,
    * last-day-of-month; day-of-week stays EPOCH-DAY ARITHMETIC because
    * the engines' dayofweek() numbering conventions differ — the q61
    * rule). Truncated instants are compared as epoch microseconds, not
    * rendered strings. Pure per-row expression work. */
  private val q74 = QDef(
    "q74_datetime_suite",
    """SELECT event_id,
      |  CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS y,
      |  CAST(EXTRACT(QUARTER FROM ts) AS BIGINT) AS qtr,
      |  CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS mth,
      |  CAST(EXTRACT(DAY FROM ts) AS BIGINT) AS dom,
      |  CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr,
      |  CAST(EXTRACT(WEEK FROM ts) AS BIGINT) AS iso_week,
      |  CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS BIGINT) AS dow_monday0,
      |  epoch_us(date_trunc('month', ts)) AS month_start_us,
      |  epoch_us(date_trunc('week', ts)) AS week_start_us,
      |  epoch_us(CAST(last_day(CAST(ts AS DATE)) AS TIMESTAMP)) AS month_end_us
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(col("event_id"),
      year(col("ts")).cast("long").as("y"),
      quarter(col("ts")).cast("long").as("qtr"),
      month(col("ts")).cast("long").as("mth"),
      dayofmonth(col("ts")).cast("long").as("dom"),
      hour(col("ts")).cast("long").as("hr"),
      weekofyear(col("ts")).cast("long").as("iso_week"),
      ((unix_micros(col("ts").cast("timestamp")) / 86400000000L).cast("long") + 3)
        .mod(7).as("dow_monday0"),
      unix_micros(date_trunc("month", col("ts")).cast("timestamp")).as("month_start_us"),
      unix_micros(date_trunc("week", col("ts")).cast("timestamp")).as("week_start_us"),
      unix_micros(last_day(col("ts").cast("date")).cast("timestamp")).as("month_end_us"))
      .orderBy(col("event_id"))
  }

  /** RFM customer segmentation with a SCALE-SAFE NTILE: per purchasing
    * user, recency (days since last purchase, integer), frequency
    * (purchase count) and monetary (decimal-exact value sum), each cut
    * into quintiles. The canonical SQL is `NTILE(5) OVER (ORDER BY
    * metric)` — ONE window partition holding every user, the classic
    * scale killer. Here all three quintiles come from ONE
    * [[graft.util.Rank]] pass over the three orderings stacked under a
    * metric id (r14; the only unpartitioned window reads the P-row
    * partition-count table) pushed through the closed-form NTILE
    * bucket arithmetic; the oracle keeps native NTILE, proving the
    * distributed form bucket-for-bucket identical.
    * Ordering keys are total (metric, user_id), so ranks — and
    * therefore buckets — are reshuffle-invariant. */
  private val q79 = QDef(
    "q79_rfm_segments",
    s"""WITH p AS (
       |  SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS freq,
       |    ${sqlDsum("value")} AS mon
       |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
       |ref AS (SELECT MAX(last_us) AS ref_us FROM p),
       |m AS (
       |  SELECT user_id, mon,
       |    NTILE(5) OVER (ORDER BY (ref_us - last_us) // 86400000000, user_id) AS r_q,
       |    NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_q,
       |    NTILE(5) OVER (ORDER BY mon DESC, user_id) AS m_q
       |  FROM p CROSS JOIN ref)
       |SELECT r_q, f_q, m_q, COUNT(*) AS n_users,
       |  ${sqlDsum("mon")} AS seg_monetary
       |FROM m GROUP BY r_q, f_q, m_q
       |ORDER BY r_q, f_q, m_q""".stripMargin) { (s, d) =>
    import graft.util.Rank
    val p = graft.util.Persist.persistTracked(
      Tables.events(s, d).where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("freq"), dsum(col("value")).as("mon")))
    val ref = p.agg(max(col("last_us")).as("ref_us"))
    val nf = p.agg(count(lit(1)).as("n"))
    val base = p.crossJoin(broadcast(ref))
      .withColumn("rec_days", expr("(ref_us - last_us) div 86400000000"))
    // ONE stacked global row-number instead of three (guide §2.4):
    // r13 left this as three independent Rank.globalRowNumber passes —
    // three range shuffles, three eager checkpoints, three user_id
    // joins. All three quintiles rank the SAME n rows, so stacking the
    // three orderings under a leading metric id (mid) turns them into
    // one total order: (mid, key_l, key_d, user_id). Each metric keeps
    // its native key type (descending metrics negate — exact for longs
    // and sign-flip-exact for doubles; ±0.0 ties break on user_id in
    // both forms), so within a mid block the stacked rank minus the
    // block offset (mid-1)·n IS that metric's original global rank, and
    // the quintile arithmetic is unchanged. Same 3n rows shuffled as
    // before, but 1 range partition + 1 checkpoint + 1 pivot aggregate
    // replace 3 of each plus the triple join — at 100 TB that is two
    // fewer full-table stage barriers and two fewer materializations.
    // mon rides along as -key_d on the mid=3 rows (double negation is
    // bit-exact), so the final aggregate needs no join back to p.
    val stacked = base.select(col("user_id"), lit(1).as("mid"),
        col("rec_days").as("key_l"), lit(0.0).as("key_d"))
      .unionAll(p.select(col("user_id"), lit(2).as("mid"),
        (-col("freq")).as("key_l"), lit(0.0).as("key_d")))
      .unionAll(p.select(col("user_id"), lit(3).as("mid"),
        lit(0L).as("key_l"), (-col("mon")).as("key_d")))
    val ranked = Rank.globalRowNumber(stacked,
      Seq(col("mid"), col("key_l"), col("key_d"), col("user_id")))
    val quint = ranked.crossJoin(broadcast(nf))
      .select(col("user_id"), col("mid"), col("key_d"),
        Rank.ntileOf(
          col("rk") - (col("mid") - 1).cast("long") * col("n"),
          col("n"), 5).as("q"))
    quint.groupBy(col("user_id"))
      .agg(max(when(col("mid") === 1, col("q"))).as("r_q"),
        max(when(col("mid") === 2, col("q"))).as("f_q"),
        max(when(col("mid") === 3, col("q"))).as("m_q"),
        max(when(col("mid") === 3, -col("key_d"))).as("mon"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), dsum(col("mon")).as("seg_monetary"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  /** Weekly retention cohort matrix — the activation/stickiness table
    * every growth pipeline materializes: users cohort at their first
    * active epoch-week (integer week index — no calendar/timezone
    * dependence), each later active week contributes to
    * (cohort, offset), and retention divides active users by cohort
    * size. Integer counts throughout; the ONE double division is
    * exactly rounded identically in both engines. Scale: one
    * user-keyed aggregate (first week), one distinct over (user, week)
    * — both map-side combined — and a broadcast of the per-cohort size
    * table; nothing global. */
  private val q80 = QDef(
    "q80_retention_cohorts",
    """WITH w AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |c AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY user_id),
      |sz AS (SELECT cohort, COUNT(*) AS cohort_users FROM c GROUP BY cohort)
      |SELECT c.cohort AS cohort_week, w.wk - c.cohort AS week_offset,
      |  COUNT(*) AS active_users, sz.cohort_users,
      |  CAST(COUNT(*) AS DOUBLE) / sz.cohort_users AS retention
      |FROM w JOIN c ON w.user_id = c.user_id
      |JOIN sz ON c.cohort = sz.cohort
      |GROUP BY c.cohort, w.wk - c.cohort, sz.cohort_users
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    val w = graft.util.Persist.persistTracked(
      Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
        .distinct())
    val c = w.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    val sz = c.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_users"))
    w.join(c, "user_id")
      .join(broadcast(sz), "cohort")
      .groupBy(col("cohort").as("cohort_week"),
        (col("wk") - col("cohort")).as("week_offset"), col("cohort_users"))
      .agg(count(lit(1)).as("active_users"))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_users"),
        (col("active_users").cast("double") / col("cohort_users")).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
