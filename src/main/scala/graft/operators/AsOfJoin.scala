package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of join — an operator Spark lacks natively (builder-prompt
  * custom-operator list). For each left row, attach the latest right
  * row with `right.ts <= left.ts` within the same key.
  *
  * Implementation is composition (preference (a) of the custom-
  * operator ladder): tag both sides, union, one running
  * `last(_, ignoreNulls)` window over (key, ts, side) — a single
  * shuffle+sort on the key, NO per-row point lookups and no range
  * join explosion. Cost is that of one sort-merge pass, which is the
  * optimal shape for this operator at 100 TB; a custom SparkPlan
  * could only shave constants off the same plan.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its latest row at-or-before the
    *                  left row's time is attached)
    * @param key       equi-join key column name (both sides)
    * @param ts        event-time column name (both sides; any ordered
    *                  numeric/timestamp type)
    * @return left rows (original columns) + `asof` struct of the
    *         matched right row (null if no right row precedes)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val rStruct = struct(right.columns.map(col).toSeq: _*)
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rTagged = right.select(
      col(key).as("_k"), col(ts).as("_t"),
      lit(0).as("_side"),
      rStruct.as("_r"))
    val rType = rTagged.schema("_r").dataType
    val lTagged = left.select(
      col(key).as("_k"), col(ts).as("_t"),
      lit(1).as("_side"),
      lit(null).cast(rType).as("_r"),
      lStruct.as("_l"))
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row —
    // matching ASOF JOIN's `left.ts >= right.ts` semantics
    val w = Window.partitionBy("_k").orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lType = lTagged.schema("_l").dataType
    rTagged.withColumn("_l", lit(null).cast(lType))
      .unionByName(lTagged)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_l").isNotNull)
      .select(col("_l.*"), col("_asof").as("asof"))
  }

  /** Oracle-backed query: attribute each purchase event to the user's
    * latest click at-or-before it (inner semantics — unattributed
    * purchases dropped, like ASOF JOIN). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ao1_asof_attribution" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_ns"), col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ns"), col("event_id").as("purchase_id"))
      asOf(purchases, clicks, "user_id", "ts_ns")
        .filter(col("asof").isNotNull)
        .select(
          col("purchase_id"),
          col("asof.click_id").as("click_id"),
          expr("(ts_ns - asof.ts_ns) div 1000000000").as("gap_s"))
        .orderBy("purchase_id")
    },

    // ── j7: NEAREST-event join — as-of's bidirectional sibling (the
    // "closest sensor reading" / session-attribution shape): each
    // purchase matches the click of the same user with the smallest
    // |Δt|, whichever side of it that click falls on. Same union +
    // one-sort composition as [[asOf]] — a backward `last(ignoreNulls)`
    // and a forward `first(ignoreNulls)` share ONE per-user sort (one
    // shuffle, no range-join explosion, optimal at any scale). Every
    // tie is total-ordered: sort is (t, side, event_id) so a click at
    // the exact purchase time lands in the BACKWARD frame (gap 0,
    // dir 'before'); equal-|Δt| prev/next resolves to prev; duplicate-
    // ts clicks resolve to the highest id backward / lowest forward —
    // both engines replay the identical rule.
    "j7_nearest_click" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts_ns").as("t"),
          when(col("event_type") === "click", 0).otherwise(1).as("side"))
      val ord = Window.partitionBy("user_id")
        .orderBy(col("t").asc, col("side").asc, col("event_id").asc)
      val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      // (t, id) travel as ONE struct per direction → two Window
      // operators instead of four, still a single per-user sort
      val click = when(col("side") === 0, struct(col("t"), col("event_id").as("id")))
      val pickPrev = col("prev").isNotNull &&
        (col("next").isNull || (col("t") - col("prev.t")) <= (col("next.t") - col("t")))
      ev
        .withColumn("prev", last(click, ignoreNulls = true).over(wPrev))
        .withColumn("next", first(click, ignoreNulls = true).over(wNext))
        .filter(col("side") === 1 && (col("prev").isNotNull || col("next").isNotNull))
        .select(
          col("event_id").as("purchase_id"),
          when(pickPrev, col("prev.id")).otherwise(col("next.id")).as("click_id"),
          when(pickPrev, lit("before")).otherwise(lit("after")).as("dir"),
          when(pickPrev, col("t") - col("prev.t"))
            .otherwise(col("next.t") - col("t")).as("gap_ns"))
        .selectExpr("purchase_id", "click_id", "dir", "gap_ns div 1000000000 AS gap_s")
        .orderBy("purchase_id")
    }
  )

  def oracles: Map[String, String] = Map(
    "ao1_asof_attribution" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           (epoch_ns(p.ts) - epoch_ns(c.ts)) // 1000000000 AS gap_s
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY purchase_id""",
    // j7 — the identical union-window replay (DuckDB's ASOF JOIN is
    // one-directional, so the oracle spells the same two frames over
    // the same (t, side, event_id) total order).
    "j7_nearest_click" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_ns(ts) AS t,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
           FROM events WHERE event_type IN ('click', 'purchase')),
         w AS (
           SELECT *,
             LAST_VALUE(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, side, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
             LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, side, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
             FIRST_VALUE(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, side, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t,
             FIRST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY t, side, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id
           FROM e),
         p AS (
           SELECT *,
             (prev_t IS NOT NULL AND (next_t IS NULL OR (t - prev_t) <= (next_t - t)))
               AS pick_prev
           FROM w
           WHERE side = 1 AND (prev_t IS NOT NULL OR next_t IS NOT NULL))
         SELECT event_id AS purchase_id,
           CASE WHEN pick_prev THEN prev_id ELSE next_id END AS click_id,
           CASE WHEN pick_prev THEN 'before' ELSE 'after' END AS dir,
           (CASE WHEN pick_prev THEN t - prev_t ELSE next_t - t END) // 1000000000 AS gap_s
         FROM p ORDER BY purchase_id"""
  )
}
