package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ChangeEvent, StatefulCounters}

class StatefulCountersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("keyed state accumulates op counts across micro-batches") {
    import spark.implicits._
    val stream = MemoryStream[ChangeEvent](spark)
    val q = StatefulCounters.runningOpCounts(stream.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sc_ckpt").toString)
      .format("memory").queryName("counters_out").start()

    stream.addData(
      ChangeEvent(1, ts(1), "I", "orders", 1, "{}"),
      ChangeEvent(2, ts(2), "I", "orders", 2, "{}"),
      ChangeEvent(3, ts(3), "I", "customers", 1, "{}"))
    q.processAllAvailable()
    stream.addData(
      ChangeEvent(4, ts(4), "U", "orders", 1, "{}"),
      ChangeEvent(5, ts(5), "D", "orders", 2, "{}"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("counters_out")
    // latest state per table = row with max(maxLsn)
    val latest = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("table").orderBy(col("maxLsn").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => r.getAs[String]("table") ->
        (r.getAs[Long]("inserts"), r.getAs[Long]("updates"),
          r.getAs[Long]("deletes"), r.getAs[Long]("netRows"))).toMap
    assert(latest("orders") == ((2L, 1L, 1L, 1L)))
    assert(latest("customers") == ((1L, 0L, 0L, 1L)))
  }
}
