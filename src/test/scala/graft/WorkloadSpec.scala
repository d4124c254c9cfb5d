package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.LogAnalytics
import graft.gen.Workload
import graft.streaming.KeyedParquetStore

class WorkloadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val asOf = Date.valueOf("2026-08-12")

  private def dims() = {
    import spark.implicits._
    val customers = Seq(1001, 1002, 1003, 1004).toDF("id")
    val products = (101 to 109).toDF("id")
    (customers, products)
  }

  test("generator: FK closure, value bounds, reproducibility (insert.ps1:271–277)") {
    val (customers, products) = dims()
    for (seed <- Seq(1L, 42L, 99L)) {
      val orders = Workload.generateOrders(customers, products, 500, 10006, seed, asOf)
      assert(orders.count() == 500)
      // FK closure: every purchaser/product_id exists in its dimension
      assert(orders.join(customers, orders("purchaser") === customers("id"), "left_anti").count() == 0)
      assert(orders.join(products, orders("product_id") === products("id"), "left_anti").count() == 0)
      // bounds: qty ∈ [1,99], date ∈ [asOf-29, asOf], ids dense from startId
      assert(orders.filter(col("quantity") < 1 || col("quantity") > 99).count() == 0)
      assert(orders.filter(col("order_date") < date_sub(lit(asOf), 29) ||
        col("order_date") > lit(asOf)).count() == 0)
      assert(orders.agg(min("id"), max("id")).collect().head.toSeq == Seq(10006L, 10505L))
    }
    // determinism: same seed → identical rows; different seed → different
    val a = Workload.generateOrders(customers, products, 200, 1, 7, asOf).collect().map(_.toString).sorted
    val b = Workload.generateOrders(customers, products, 200, 1, 7, asOf).collect().map(_.toString).sorted
    val c = Workload.generateOrders(customers, products, 200, 1, 8, asOf).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("batched insert run: store converges, metrics + log analytics round-trip") {
    import spark.implicits._
    val (customers, products) = dims()
    val root = Files.createTempDirectory("wl_store").toString
    val store = new KeyedParquetStore(root, nBuckets = 8)
    // seed rows (quickstart_prepare_peers.sh:72–77)
    val seedOrders = Seq(
      (10001L, Date.valueOf("2024-01-16"), 1001, 1, 102),
      (10002L, Date.valueOf("2024-01-17"), 1002, 2, 105),
      (10003L, Date.valueOf("2024-02-19"), 1002, 2, 106),
      (10004L, Date.valueOf("2024-02-21"), 1003, 1, 107),
      (10005L, Date.valueOf("2024-02-22"), 1004, 1, 108)
    ).toDF("id", "order_date", "purchaser", "quantity", "product_id")
    store.snapshot(spark, "orders", seedOrders, "id")

    val orders = Workload.generateOrders(customers, products, 300, 10006, 42, asOf)
      .withColumn("id", col("id"))
    val m = Workload.runBatchedInsert(spark, store, "orders", orders, batchSize = 100)
    assert(m.totalRows == 300 && m.nBatches == 3)
    assert(store.read(spark, "orders").count() == 305)
    assert(m.minBatchMs <= m.avgBatchMs && m.avgBatchMs <= m.maxBatchMs)

    // log round-trip through LogAnalytics (monitoring.ps1 §10)
    val dir = Files.createTempDirectory("wl_log")
    Files.write(dir.resolve("stress.log"), String.join("\n", m.logLines: _*).getBytes)
    val log = LogAnalytics.readLog(spark, dir.toString + "/*.log")
    val batches = LogAnalytics.parseBatches(log)
    assert(batches.count() == 3)
    val stats = LogAnalytics.latencyStats(batches).collect().head
    assert(stats.getAs[Long]("total_rows") == 300)
    assert(stats.getAs[Long]("n_batches") == 3)
    val sm = LogAnalytics.summary(log).collect().head
    assert(sm.getAs[Long]("successful_ops") == 300)
    assert(sm.getAs[Double]("throughput_ops_s") > 0)
    assert(LogAnalytics.topBatches(batches, "latency_ms").count() == 1)
    val tr = LogAnalytics.trend(batches, "latency_ms").collect().head
    assert(tr.schema.fieldNames.contains("delta"))
  }

  test("resource log parsing: unit ladder normalises to MiB (monitoring.ps1:1093–1097)") {
    import spark.implicits._
    val lines = Seq(
      "catalog 12.50% 512.00MiB / 3.726GiB",
      "flow-worker 3.25% 1.50GiB / 3.726GiB",
      "minio 0.10% 256.00KiB / 3.726GiB",
      "bigdb 1.00% 1.50TiB / 4.00TiB",
      "not a stats line").toDF("value")
    val res = LogAnalytics.parseResources(lines).orderBy("container").collect()
    assert(res.length == 4)
    val byName = res.map(r => r.getString(0) -> r.getAs[Double]("mem_mib")).toMap
    assert(byName("catalog") == 512.0)
    assert(byName("flow-worker") == 1536.0)
    assert(byName("minio") == 0.25)
    assert(byName("bigdb") == 1.5 * 1024 * 1024)
    val roll = LogAnalytics.resourceRollup(LogAnalytics.parseResources(lines))
    assert(roll.count() == 4)
  }
}
