package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
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

  def defs: Seq[QDef] = Seq(q19, q20, q21, q22, q26)

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
}
