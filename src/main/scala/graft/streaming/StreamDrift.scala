package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online CUSUM drift monitor — the streaming half of the ts10 batch
  * control chart (`TimeSeriesQueries`): per event type, the standard
  * one-sided CUSUM recursions over the hourly rate
  *
  *   S⁺ ← max(0, S⁺ + (x − target) − slack)   (rate ran high)
  *   S⁻ ← max(0, S⁻ + (target − x) − slack)   (rate ran low)
  *
  * with an alert emitted when either statistic crosses the decision
  * threshold `h`, after which that statistic resets (the classic
  * "signal and restart" form). All arithmetic is integer — counts per
  * hour vs an integer target — so stream and batch replications are
  * bit-identical.
  *
  * Scale/robustness shape:
  *  - input is the FINALIZED hourly aggregate (watermarked tumbling
  *    window, append mode): each (type, hour) reaches the monitor
  *    exactly once per run, already reduced — the state op never sees
  *    raw-event volume;
  *  - keyed state is four longs per event type (O(#types), bounded
  *    forever);
  *  - a bucket at or below the last folded hour is IGNORED, so
  *    upstream replays (checkpoint recovery re-delivering a finalized
  *    window) cannot double-fold — the recursion is idempotent per
  *    hour;
  *  - buckets within a micro-batch are folded in hour order (sorted
  *    in the group iterator — micro-batches deliver per-key rows
  *    unordered).
  */
object StreamDrift {

  case class HourBucket(event_type: String, hr: Long, n: Long)

  case class DriftState(lastHr: Long, sPlus: Long, sMinus: Long)

  case class DriftAlert(
      event_type: String, hr: Long, n: Long,
      s_plus: Long, s_minus: Long, direction: String)

  /** Watermarked hourly counts per type: (event_type, hr, n) with
    * hr = epoch-hours. Append mode ⇒ a window is emitted once, after
    * the watermark passes its end. */
  def hourly(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("unix_timestamp(w.start) div 3600").as("hr"), col("n"))

  /** CUSUM over finalized hour buckets. Works identically on a batch
    * Dataset (one pass, empty initial state) and a stream (state
    * carried across micro-batches via the checkpoint). */
  def monitor(
      buckets: Dataset[HourBucket],
      target: Long, slack: Long, h: Long): Dataset[DriftAlert] = {
    import buckets.sparkSession.implicits._
    buckets
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftState, DriftAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[HourBucket], state: GroupState[DriftState]) =>
          var st = state.getOption.getOrElse(DriftState(Long.MinValue, 0L, 0L))
          val alerts = scala.collection.mutable.ArrayBuffer.empty[DriftAlert]
          it.toSeq.sortBy(_.hr).foreach { b =>
            if (b.hr > st.lastHr) {
              var sp = math.max(0L, st.sPlus + (b.n - target) - slack)
              var sm = math.max(0L, st.sMinus + (target - b.n) - slack)
              if (sp > h || sm > h) {
                alerts += DriftAlert(key, b.hr, b.n, sp, sm,
                  if (sp > h) "up" else "down")
                if (sp > h) sp = 0L
                if (sm > h) sm = 0L
              }
              st = DriftState(b.hr, sp, sm)
            } // else: replayed finalized window — already folded, skip
          }
          state.update(st)
          alerts.iterator
      }
  }
}
