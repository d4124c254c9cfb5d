package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-series shaping over the event stream: calendar gap-filling
  * (dense daily series from a sparse fact table) and weekly cohort
  * retention — the two reshapes every analytics pipeline needs
  * before charting or training on event data. The reference's
  * trend/monitoring suite (reference monitoring.ps1:1068–1144)
  * computes the same first/last-third style rollups client-side; a
  * calendar-complete series is the general form.
  *
  * Scale notes: the calendar spine (days × event types) is tiny and
  * derived from a single min/max aggregate — it broadcasts to the
  * pre-aggregated fact side, so the gap-fill costs one scan + one
  * broadcast join at any corpus size. Retention shuffles events once
  * on `user_id`; the per-user cohort aggregate reuses the same
  * partitioning (no second exchange of the big side).
  */
object TimeSeriesQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── ts1: zero-filled daily spike counts per event type. Spikes
    // (value > 480) are sparse (~2% of events), so most (type, day)
    // cells are empty — the calendar × type spine reinstates them
    // with an explicit 0 instead of a silent hole.
    "ts1_gap_fill" -> { (s, d) =>
      val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
      val spikes = ev.filter(col("value") > 480.0)
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      val cal = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val types = ev.select("event_type").distinct()
      cal.crossJoin(types)
        .join(spikes, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "day")
    },

    // ── ts2: weekly cohort retention — users grouped by first-seen
    // week (Monday-truncated), distinct active users per week offset.
    "ts2_retention" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
      val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
      ev.join(cohort, "user_id")
        .withColumn("week_offset",
          expr("CAST(datediff(week, cohort_week) DIV 7 AS INT)"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }
  )

  def oracles: Map[String, String] = Map(
    "ts1_gap_fill" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events),
         cal AS (
           SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
           FROM (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev)),
         types AS (SELECT DISTINCT event_type FROM ev),
         spikes AS (
           SELECT event_type, day, COUNT(*) AS n FROM ev
           WHERE value > 480.0 GROUP BY 1, 2)
         SELECT t.event_type, c.day, COALESCE(s.n, 0) AS n
         FROM cal c CROSS JOIN types t
         LEFT JOIN spikes s ON s.event_type = t.event_type AND s.day = c.day
         ORDER BY t.event_type, c.day""",
    "ts2_retention" ->
      """WITH ev AS (
           SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
         cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1)
         SELECT cohort_week,
           CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
         FROM ev e JOIN cohort c USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""
  )
}
