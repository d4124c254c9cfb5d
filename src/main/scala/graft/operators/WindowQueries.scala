package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventWindows

/** Batch projections of the event-time windowing transforms
  * ([[graft.streaming.EventWindows]]) — same code, oracle-checked.
  * Window starts surface as epoch seconds (BIGINT) so nano- vs
  * micro-timestamp representations can't skew the comparison. */
object WindowQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sw1_tumbling_1h" -> { (s, d) =>
      EventWindows.tumbling(Tables.events(s, d))
        .orderBy("window_start", "event_type")
    },
    "sw2_sliding_1h_30m" -> { (s, d) =>
      EventWindows.sliding(Tables.events(s, d))
        .orderBy("window_start")
    },
    "sw3_session_30m" -> { (s, d) =>
      EventWindows.sessions(Tables.events(s, d))
        .orderBy("user_id")
    },

    // ── w10: explicit-frame window — 7-row moving sum + row delta per
    // supplier over ship order. ROWS frames are computed in one sort
    // per partition key (no self-join); l_quantity is integer-valued,
    // so the running double sum is exact and casts cleanly. lag uses
    // a frameless spec: Spark rejects an explicit frame on offset
    // functions.
    "w10_moving_sum" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val wFrame = Window.partitionBy("l_suppkey").orderBy(order: _*).rowsBetween(-6, 0)
      val wOrder = Window.partitionBy("l_suppkey").orderBy(order: _*)
      Tables.load(s, d, "lineitem")
        .filter(col("l_suppkey") <= 50)
        .withColumn("mv7_qty", sum(col("l_quantity")).over(wFrame).cast("long"))
        .withColumn("qty_delta",
          (col("l_quantity") - coalesce(lag(col("l_quantity"), 1).over(wOrder), lit(0.0)))
            .cast("long"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "mv7_qty", "qty_delta")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // ── w11: value-RANGE frame — trailing 7-day totals per supplier
    // over a day ordinal. RANGE includes all peers of the current
    // value, so the result is deterministic without a tiebreak even
    // when many rows ship the same day (ROWS frames are not).
    "w11_range_frame" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_suppkey").orderBy("day_ord").rangeBetween(-7, 0)
      Tables.load(s, d, "lineitem")
        .filter(col("l_suppkey") <= 30)
        .withColumn("day_ord",
          datediff(col("l_shipdate"), lit("2020-01-01").cast("date")))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(w).cast("long").as("qty_7d"),
          count(lit(1)).over(w).as("n_7d"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // ── w13: IGNORE NULLS navigation over a sparse series — the gauge
    // reading every telemetry pipeline does: previous / next / first
    // KNOWN observation around each row, nulls skipped by the window
    // function itself (no self-join, no gaps-and-islands detour; one
    // window sort serves all three). Complements ts4's LOCF (which
    // fills); this NAVIGATES while keeping rows.
    "w13_ignore_nulls" -> { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("events_v")
      s.sql("""WITH sparse AS (
                 SELECT user_id, event_id, ts_ns,
                   CASE WHEN event_id % 5 = 0 THEN value END AS obs
                 FROM events_v WHERE user_id <= 20)
               SELECT user_id, event_id,
                 ROUND(LAG(obs) IGNORE NULLS OVER w, 4) AS prev_obs,
                 ROUND(LEAD(obs) IGNORE NULLS OVER w, 4) AS next_obs,
                 ROUND(FIRST_VALUE(obs) IGNORE NULLS OVER w, 4) AS first_obs
               FROM sparse
               WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
               ORDER BY user_id, event_id""")
    }
  )

  def oracles: Map[String, String] = Map(
    "sw1_tumbling_1h" ->
      """SELECT epoch_ns(time_bucket(INTERVAL '1 hour', ts)) // 1000000000 AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "sw2_sliding_1h_30m" ->
      """WITH phases AS (
           SELECT epoch_ns(time_bucket(INTERVAL '1 hour', ts)) // 1000000000 AS window_start, value
           FROM events
           UNION ALL
           SELECT epoch_ns(time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes')) // 1000000000
                    AS window_start, value
           FROM events)
         SELECT window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM phases GROUP BY 1 ORDER BY window_start""",
    "sw3_session_30m" ->
      """WITH ordered AS (
           SELECT user_id, ts,
             -- >= : Spark session windows are [t, t+gap), so an event
             -- at exactly t+gap starts a NEW session
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    >= INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
           FROM events),
         sess AS (
           SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM ordered),
         per_session AS (
           SELECT user_id, session_id, COUNT(*) AS n_events
           FROM sess GROUP BY 1, 2)
         SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
           MAX(n_events) AS max_session_events
         FROM per_session GROUP BY 1 ORDER BY user_id""",
    "w10_moving_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(l_quantity) OVER wf AS BIGINT) AS mv7_qty,
           CAST(l_quantity - COALESCE(LAG(l_quantity) OVER wo, 0) AS BIGINT) AS qty_delta
         FROM lineitem WHERE l_suppkey <= 50
         WINDOW
           wf AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
           wo AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "w11_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(l_quantity) OVER w AS BIGINT) AS qty_7d,
           COUNT(*) OVER w AS n_7d
         FROM (SELECT *, date_diff('day', DATE '2020-01-01', CAST(l_shipdate AS DATE)) AS day_ord
               FROM lineitem WHERE l_suppkey <= 30)
         WINDOW w AS (PARTITION BY l_suppkey ORDER BY day_ord
                      RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "w13_ignore_nulls" ->
      """WITH sparse AS (
           SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
             CASE WHEN event_id % 5 = 0 THEN value END AS obs
           FROM events WHERE user_id <= 20)
         SELECT user_id, event_id,
           ROUND(LAG(obs IGNORE NULLS) OVER w, 4) AS prev_obs,
           ROUND(LEAD(obs IGNORE NULLS) OVER w, 4) AS next_obs,
           ROUND(FIRST_VALUE(obs IGNORE NULLS) OVER w, 4) AS first_obs
         FROM sparse
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
         ORDER BY user_id, event_id"""
  )
}
