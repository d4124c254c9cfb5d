package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Namespaces
import graft.streaming._

class StreamMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("listener captures per-batch progress; rollup matches run totals") {
    import spark.implicits._
    val metrics = StreamMetrics.attach(spark)
    try {
      val store = new KeyedParquetStore(
        Files.createTempDirectory("sm_store").toString, 4)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      val stream = MemoryStream[ChangeEvent](spark)
      val q = CdcPipeline.start(stream.toDF(), store,
        Map("t" -> schema), Map("t" -> "id"), "metered_mirror",
        Files.createTempDirectory("sm_ckpt").toString)
      stream.addData(ChangeEvent(1, ts(1), "I", "t", 1, """{"id":1,"v":"a"}"""))
      q.processAllAvailable()
      stream.addData(ChangeEvent(2, ts(2), "I", "t", 2, """{"id":2,"v":"b"}"""))
      q.processAllAvailable()
      q.stop()

      val all = metrics.progressDf(spark).collect().mkString("\n")
      val rows = metrics.summary(spark)
        .filter(org.apache.spark.sql.functions.col("query_name") === "metered_mirror")
        .collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("total_rows") == 2L, s"\nprogress:\n$all")
      assert(rows.head.getAs[Long]("n_batches") == 2L)
      assert(rows.head.getAs[Long]("max_batch_ms") >= rows.head.getAs[Long]("min_batch_ms"))
    } finally spark.streams.removeListener(metrics)
  }

  test("namespaces: cross-store SQL lag query (source/target views)") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("ns_store").toString, 2)
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    store.snapshot(spark, "orders", src.limit(2), "id")
    Namespaces.registerSource(spark, "source", Map("orders" -> src))
    Namespaces.registerTarget(spark, "target", store, Seq("orders"))
    val r = Namespaces.lagSql(spark, "source", "target", "orders").collect().head
    assert(r.getAs[Long]("src_rows") == 3L)
    assert(r.getAs[Long]("tgt_rows") == 2L)
    assert(r.getAs[String]("sync_status") == "NEAR_SYNC")
  }
}
