package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming throughput/latency metrics via StreamingQueryListener —
  * the engine-native replacement for the reference's log-scraping
  * metrics path (insert.ps1:288–330 accumulates per-batch counts and
  * latencies into a log that monitoring.ps1 §10 re-parses; Spark
  * exposes the same numbers as structured query progress).
  */
class StreamMetrics extends StreamingQueryListener {
  import StreamMetrics.Progress

  private val buf = ArrayBuffer.empty[Progress]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    buf.synchronized {
      // bound driver-side memory on long-running mirrors: keep the
      // most recent window of progress rows
      if (buf.length >= StreamMetrics.maxEntries)
        buf.remove(0, buf.length - StreamMetrics.maxEntries + 1)
      val p = e.progress
      def phase(k: String): Long =
        Option(p.durationMs.get(k)).map(_.longValue()).getOrElse(0L)
      // per-batch wall time = triggerExecution, which SPANS the other
      // durationMs entries (addBatch, walCommit, ...). Summing the map
      // double-counts — that inflation is exactly the r10 "streaming
      // is 2.3× batch apply" artifact (1,662 ms reported, ~900 ms
      // real); fall back to the sum only when the span entry is absent
      val wall = {
        val t = phase("triggerExecution")
        if (t > 0) t
        else p.durationMs.values().stream().mapToLong(_.longValue()).sum()
      }
      buf += Progress(
        Option(p.name).getOrElse(""),
        p.batchId,
        p.numInputRows,
        Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
        Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
        wall,
        // the per-phase breakdown Spark reports for each micro-batch —
        // the attribution evidence for WHERE a trigger's time goes
        // (addBatch = the sink's actual work; latestOffset/getBatch =
        // source listing/planning; walCommit/commitOffsets = the
        // offset+commit log fsyncs)
        phase("addBatch"), phase("getBatch"), phase("latestOffset"),
        phase("queryPlanning"), phase("walCommit"), phase("commitOffsets"))
    }

  /** Raw progress rows captured so far. */
  def progressDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buf.synchronized { buf.toSeq }
      .toDF("query_name", "batch_id", "num_input_rows",
        "input_rows_per_s", "processed_rows_per_s", "duration_ms",
        "add_batch_ms", "get_batch_ms", "latest_offset_ms",
        "query_planning_ms", "wal_commit_ms", "commit_offsets_ms")
  }

  /** Per-query rollup — throughput + batch latency min/avg/max (the
    * insert.ps1:361–363 summary, from progress instead of logs). */
  def summary(spark: SparkSession): DataFrame =
    progressDf(spark)
      .filter(col("num_input_rows") > 0)
      .groupBy("query_name")
      .agg(
        count(lit(1)).as("n_batches"),
        sum("num_input_rows").as("total_rows"),
        min("duration_ms").as("min_batch_ms"),
        round(avg("duration_ms"), 1).as("avg_batch_ms"),
        max("duration_ms").as("max_batch_ms"),
        round(avg("processed_rows_per_s"), 1).as("avg_rows_per_s"))
}

object StreamMetrics {

  /** Retained progress rows per collector (ring-buffer bound). */
  val maxEntries: Int = 10000

  case class Progress(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      durationMs: Long,
      addBatchMs: Long,
      getBatchMs: Long,
      latestOffsetMs: Long,
      queryPlanningMs: Long,
      walCommitMs: Long,
      commitOffsetsMs: Long)

  /** Attach a fresh collector to the session. Caller removes it with
    * `spark.streams.removeListener`. */
  def attach(spark: SparkSession): StreamMetrics = {
    val m = new StreamMetrics
    spark.streams.addListener(m)
    m
  }
}
