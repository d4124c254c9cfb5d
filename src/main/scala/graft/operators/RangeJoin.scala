package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range join — the second operator on the brief's Spark-lacks list.
  * A naive time-range join with no equi key plans as a nested loop
  * (O(n·m)); the scale shape is BUCKETIZATION: both sides land in
  * fixed-width time buckets, the probe side explodes to its bucket
  * ±1, the join becomes an equi-join on the bucket id, and the exact
  * range predicate filters the small bucket-local candidate set.
  * Cost drops to O(n + m + matches), shuffle keys are uniform, and
  * the same plan holds at 100 TB (bucket width trades fan-out vs
  * candidate density).
  */
object RangeJoin {

  /** Count `near` rows within ±`toleranceNs` of each `probe` row,
    * joining purely on time (no equi key).
    *
    * @param probe (id, t) rows to annotate
    * @param near  (t) rows to count around each probe row
    */
  def countWithin(probe: DataFrame, near: DataFrame, toleranceNs: Long): DataFrame = {
    // integer div: double division of ns-scale longs loses low bits
    // and could bucket boundary rows inconsistently
    val nearB = near.select(col("t").as("nt"))
      .withColumn("b", expr(s"nt div ${toleranceNs}L"))
    val probeB = probe
      .withColumn("b0", expr(s"t div ${toleranceNs}L"))
      .withColumn("b", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
      .drop("b0")
    probeB.join(nearB, Seq("b"))
      .filter(abs(col("nt") - col("t")) <= toleranceNs)
      .groupBy("id", "t")
      .agg(count(lit(1)).as("n_near"))
  }

  /** Oracle-backed query: for each error event, how many click events
    * happened corpus-wide within ±60 s (burst correlation). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rj1_range_join_bucketed" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("id"), col("ts_ns").as("t"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("ts_ns").as("t"))
      countWithin(errors, clicks, 60L * 1000000000L)
        .select(col("id").as("error_id"), col("n_near").as("n_clicks_60s"))
        .orderBy("error_id")
    }
  )

  def oracles: Map[String, String] = Map(
    "rj1_range_join_bucketed" ->
      """SELECT e.event_id AS error_id, COUNT(*) AS n_clicks_60s
         FROM (SELECT event_id, epoch_ns(ts) AS t FROM events WHERE event_type = 'error') e
         JOIN (SELECT epoch_ns(ts) AS t FROM events WHERE event_type = 'click') c
           ON ABS(c.t - e.t) <= 60000000000
         GROUP BY 1 ORDER BY error_id"""
  )
}
