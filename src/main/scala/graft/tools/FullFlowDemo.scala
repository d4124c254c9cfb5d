package graft.tools

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.SparkSession

import graft.analytics.{LogAnalytics, Monitor}
import graft.gen.Workload
import graft.streaming.{CdcPipeline, KeyedParquetStore}

/** End-to-end replica of the reference's full workflow
  * (README.md:99–137): seed the source, snapshot-mirror it, run the
  * batched insert stress test as a CDC change stream, then print the
  * monitoring suite's reports (lag/sync, table stats, log analytics).
  */
object FullFlowDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. seed source tables (quickstart_prepare_peers.sh)
    val customers = Seq(1001, 1002, 1003, 1004).toDF("id")
    val products = (101 to 109).toDF("id")
    val seedOrders = Seq(
      (10001L, Date.valueOf("2024-01-16"), 1001, 1, 102),
      (10002L, Date.valueOf("2024-01-17"), 1002, 2, 105),
      (10003L, Date.valueOf("2024-02-19"), 1002, 2, 106),
      (10004L, Date.valueOf("2024-02-21"), 1003, 1, 107),
      (10005L, Date.valueOf("2024-02-22"), 1004, 1, 108)
    ).toDF("id", "order_date", "purchaser", "quantity", "product_id")

    // 2. snapshot mirror
    val store = new KeyedParquetStore(
      Files.createTempDirectory("fullflow_store").toString, nBuckets = 8)
    CdcPipeline.snapshot(spark, store, Map("orders" -> seedOrders), Map("orders" -> "id"))

    // 3. stress workload: 2000 rows in batches of 500 (insert.ps1 defaults scaled)
    val gen = Workload.generateOrders(customers, products,
      n = 2000, startId = 10006, seed = 42, asOf = Date.valueOf("2026-08-12"))
    val metrics = Workload.runBatchedInsert(spark, store, "orders", gen, batchSize = 500)
    println(s"[flow] ${metrics.totalRows} rows in ${metrics.nBatches} batches, " +
      f"${metrics.throughputRowsPerSec}%.1f rows/s, " +
      s"batch ms min/avg/max = ${metrics.minBatchMs}/${metrics.avgBatchMs}/${metrics.maxBatchMs}")

    // 4. monitoring reports
    val source = seedOrders.unionByName(gen)
    val reports = Monitor.report(spark, store, Map("orders" -> source))
    println("[flow] lag report:")
    reports("lag").show(false)
    println("[flow] sync summary:")
    reports("sync_summary").show(false)
    println("[flow] table stats:")
    reports("table_stats").show(false)

    // 5. log analytics over the run's stress log
    val dir = Files.createTempDirectory("fullflow_log")
    Files.write(dir.resolve("stress.log"), String.join("\n", metrics.logLines: _*).getBytes)
    val log = LogAnalytics.readLog(spark, dir.toString + "/*.log")
    println("[flow] latency stats:")
    LogAnalytics.latencyStats(LogAnalytics.parseBatches(log)).show(false)
    println("[flow] summary:")
    LogAnalytics.summary(log).show(false)
    spark.stop()
  }
}
