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
      buf += Progress(
        Option(p.name).getOrElse(""),
        p.batchId,
        p.numInputRows,
        Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
        Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
        p.durationMs.values().stream().mapToLong(_.longValue()).sum())
    }

  /** Raw progress rows captured so far. */
  def progressDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buf.synchronized { buf.toSeq }
      .toDF("query_name", "batch_id", "num_input_rows",
        "input_rows_per_s", "processed_rows_per_s", "duration_ms")
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
      durationMs: Long)

  /** Attach a fresh collector to the session. Caller removes it with
    * `spark.streams.removeListener`. */
  def attach(spark: SparkSession): StreamMetrics = {
    val m = new StreamMetrics
    spark.streams.addListener(m)
    m
  }
}
