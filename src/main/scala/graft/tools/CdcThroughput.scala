package graft.tools

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.Workload
import graft.streaming.{CdcPipeline, ChangeFeed, KeyedParquetStore, StreamMetrics}

/** CDC insert-throughput benchmark — the measured counterpart of the
  * reference's ONE published performance number (1.04 ops/s insert
  * throughput, README.md:131–137, which BASELINE.md identifies as
  * sleep-dominated pipeline latency, not an engine ceiling).
  *
  * Two surfaces, both ending in the same idempotent bucketed merge:
  *
  *  1. `batch_apply` — the insert.ps1 batch loop (250–334) spelled as
  *     direct [[CdcPipeline.applyBatch]] calls:
  *     [[Workload.runBatchedInsert]] with per-batch latency accounting
  *     and the reference's count reconciliation (insert.ps1:426–431).
  *  2. `streaming` — the end-to-end path: change events landed on a
  *     file [[ChangeFeed]], tailed by a checkpointed
  *     [[CdcPipeline.start]] mirror with `maxFilesPerTrigger`
  *     backpressure, measured via [[StreamMetrics]] (the engine-native
  *     replacement for the reference's log-scraped metrics).
  *
  * Run standalone (`runMain graft.tools.CdcThroughput`) or embedded —
  * [[graft.Bench]] calls [[measure]] once per bench run and carries
  * the numbers in its JSON artifact, so every BENCH_r{N}.json has a
  * reproducible streaming figure beside the query timings.
  */
object CdcThroughput {

  /** One measured run; returns flat metric → value pairs. */
  def measure(spark: SparkSession, rows: Long = 20000L,
      batchSize: Int = 1000): Seq[(String, Double)] = {
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_bench").toString

    // dimensions + deterministic order workload (seeded, FK-valid)
    val customers = spark.range(1, 501).toDF("id")
    val products = spark.range(1, 101).toDF("id")
    val orders = Workload.generateOrders(customers, products, rows,
      startId = 1L, seed = 42L, asOf = Date.valueOf("2026-01-01"))
      .localCheckpoint(true) // one materialization; batches filter it

    // ── surface 1: the insert.ps1 batch-apply loop
    val storeA = new KeyedParquetStore(s"$work/store_batch")
    val m = Workload.runBatchedInsert(spark, storeA, "orders", orders, batchSize)
    // count reconciliation — the reference's success criterion
    val applied = storeA.read(spark, "orders").count()
    require(applied == rows, s"reconciliation failed: $applied != $rows")

    // ── surface 2: end-to-end streaming mirror over a file feed
    val schema = orders.schema
    val changes = orders.select(
      col("id").as("lsn"),
      lit(new Timestamp(0)).as("commitTs"),
      lit("I").as("op"),
      lit("orders").as("table"),
      col("id").cast("long").as("key"),
      to_json(struct(schema.fieldNames.map(col).toSeq: _*)).as("after"))
    // one feed file per insert batch; maxFilesPerTrigger=1 makes each
    // micro-batch process exactly one landed batch (the reference's
    // batch pacing), so per-batch latency is comparable to surface 1
    val nFiles = math.ceil(rows.toDouble / batchSize).toInt
    ChangeFeed.publish(changes.repartition(nFiles), s"$work/feed")

    val storeB = new KeyedParquetStore(s"$work/store_stream")
    val metrics = StreamMetrics.attach(spark)
    val t0 = System.nanoTime()
    val q = CdcPipeline.start(
      ChangeFeed.stream(spark, s"$work/feed", maxFilesPerTrigger = 1),
      storeB,
      Map("orders" -> schema),
      Map("orders" -> "id"),
      mirrorName = "cdc_bench_mirror",
      checkpointDir = s"$work/ckpt")
    q.processAllAvailable()
    q.stop()
    val streamWallS = (System.nanoTime() - t0) / 1e9
    val streamed = storeB.read(spark, "orders").count()
    require(streamed == rows, s"stream reconciliation failed: $streamed != $rows")
    val prog = metrics.progressDf(spark)
      .filter(col("num_input_rows") > 0)
      .agg(count(lit(1)), min("duration_ms"), avg("duration_ms"), max("duration_ms"))
      .collect().head
    spark.streams.removeListener(metrics)

    Seq(
      "rows" -> rows.toDouble,
      "batch_apply_rows_per_sec" -> m.throughputRowsPerSec,
      "batch_apply_n_batches" -> m.nBatches.toDouble,
      "batch_apply_avg_batch_ms" -> m.avgBatchMs,
      "batch_apply_min_batch_ms" -> m.minBatchMs.toDouble,
      "batch_apply_max_batch_ms" -> m.maxBatchMs.toDouble,
      "streaming_rows_per_sec" -> rows / streamWallS,
      "streaming_n_batches" -> prog.getLong(0).toDouble,
      "streaming_min_batch_ms" -> prog.getLong(1).toDouble,
      "streaming_avg_batch_ms" -> prog.getDouble(2),
      "streaming_max_batch_ms" -> prog.getLong(3).toDouble,
      "reference_ops_per_sec" -> 1.04)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val kv = measure(spark)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", v)
    val line = kv.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{\"metric\":\"cdc_insert_throughput\",", ",", "}")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("CDC_BENCH.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
