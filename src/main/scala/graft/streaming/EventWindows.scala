package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations over the event stream (north-star
  * extension ops — the reference's CDC path is processing-time only,
  * SURVEY.md §2.8; watermarks/windows are required for the 100 TB
  * streaming-analytics surface).
  *
  * Each transform is defined on a plain DataFrame so the SAME code
  * runs in batch (oracle-checked via SparkEntry) and streaming
  * (spec-checked via MemoryStream): Structured Streaming's
  * batch/stream unification.
  *
  * Exactness: value sums go through DECIMAL(18,2) — identical results
  * at any parallelism and in the DuckDB oracle.
  */
object EventWindows {

  /** Tumbling 1-hour windows per event_type. Streaming use: watermark
    * bounds state; late events beyond 10 min are dropped. */
  def tumbling(events: DataFrame, withWatermarkCol: Boolean = false): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(
        expr("unix_timestamp(w.start)").as("window_start"),
        col("event_type"), col("n"), col("total"))
  }

  /** Sliding 1-hour windows every 30 minutes (each event lands in 2
    * windows). */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(expr("unix_timestamp(w.start)").as("window_start"), col("n"), col("total"))

  /** Session windows per user with a 30-minute inactivity gap —
    * Spark's native session_window (gaps-and-islands in the oracle). */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"))

  /** Windowed approximate distinct users via the HLL sketch aggregate.
    *
    * The streaming shape this exists for: per-window state in the
    * state store is the 4 KiB register file, NOT the user-id set —
    * bounded regardless of cardinality — and each micro-batch folds
    * into it by register-max merge (associative + idempotent, so
    * retried batches can't inflate the estimate the way a count-based
    * approximation would). The same transform runs in batch; the
    * streaming spec asserts batch/stream agreement across multi-batch
    * arrival. */
  def distinctUsersHll(events: DataFrame, withWatermarkCol: Boolean = false): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.HllSketch.hll_distinct(col("user_id")).as("approx_users"))
      .select(expr("unix_timestamp(w.start)").as("window_start"), col("approx_users"))
  }

  /** Windowed value quantiles from the log-bucket histogram sketch
    * ([[graft.functions.LogHist]]): per-window state is the sparse
    * bucket-count map (≤ 16384 longs) — bounded whatever the value
    * cardinality — and micro-batches fold in by key-wise count
    * addition (associative + commutative), so arrival order and batch
    * boundaries can't change any window's quantile read. The read is
    * the rank-⌈p·W⌉ bucket's lower bound: within 1/64 relative of the
    * exact order statistic, exact below 128. Same transform runs in
    * batch; the streaming spec asserts batch/stream agreement. */
  def valueQuantilesLbHist(events: DataFrame, withWatermarkCol: Boolean = false): DataFrame = {
    import graft.functions.LogHist.{lb_hist, lb_quantile}
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(lb_hist(expr("CAST(round(value * 1000) AS BIGINT)")).as("h"))
      .select(expr("unix_timestamp(w.start)").as("window_start"),
        lb_quantile(col("h"), 1, 2).as("p50_milli"),
        lb_quantile(col("h"), 15, 16).as("p9375_milli"))
  }

  /** Windowed frequent-item candidates over the stream: the
    * Misra–Gries summary lives in the streaming aggregation state and
    * merges each micro-batch's partial summary (the mergeable-summary
    * form, so cross-batch arrival order can't lose a heavy item).
    * State is O(k) per window regardless of user cardinality, and the
    * state store commits per batch — exactly-once w.r.t. the summary.
    * Downstream, the candidate array feeds the exact second pass the
    * same way as the batch pipeline (e2). */
  def frequentUsersPerWindow(
      events: DataFrame, k: Int = 20, withWatermarkCol: Boolean = false): DataFrame = {
    val src = if (withWatermarkCol) events.withWatermark("ts", "10 minutes") else events
    src
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.FreqSketch.freq_candidates(
        col("user_id").cast("string"), k).as("candidates"))
      .select(expr("unix_timestamp(w.start)").as("window_start"), col("candidates"))
  }
}
