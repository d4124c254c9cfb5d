package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CdcPipeline, ChangeEvent, ChangeFeed, KeyedParquetStore}

/** File-based CDC end-to-end: change batches landed as JSON files are
  * tailed by a readStream and merged into the target store, with
  * maxFilesPerTrigger bounding each micro-batch. */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("file feed → stream → store converges; trigger bound respected") {
    import spark.implicits._
    val feed = Files.createTempDirectory("feed").toString
    val root = Files.createTempDirectory("feed_store").toString
    val ckpt = Files.createTempDirectory("feed_ckpt").toString
    val store = new KeyedParquetStore(root, nBuckets = 4)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))

    store.snapshot(spark, "t",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")

    // land two change files (two capture batches)
    ChangeFeed.publish(Seq(
      ChangeEvent(1, ts(1), "I", "t", 3, """{"id":3,"v":"c"}"""),
      ChangeEvent(2, ts(2), "U", "t", 1, """{"id":1,"v":"a2"}""")).toDF(), feed)
    ChangeFeed.publish(Seq(
      ChangeEvent(3, ts(3), "D", "t", 2, null),
      ChangeEvent(4, ts(4), "I", "t", 4, """{"id":4,"v":"d"}""")).toDF(), feed)

    var batches = 0
    val q = ChangeFeed.stream(spark, feed, maxFilesPerTrigger = 1)
      .writeStream
      .queryName("feed_mirror")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        CdcPipeline.applyBatch(b, store, Map("t" -> schema), Map("t" -> "id"))
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val state = store.read(spark, "t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state == Seq((1L, "a2"), (3L, "c"), (4L, "d")))
    assert(batches >= 2, s"maxFilesPerTrigger=1 should split the feed, got $batches batch(es)")

    // late replay of the same feed is idempotent
    CdcPipeline.applyBatch(ChangeFeed.readAll(spark, feed), store,
      Map("t" -> schema), Map("t" -> "id"))
    val again = store.read(spark, "t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(again == state)
  }

  test("checkpoint recovery: restart consumes only unseen files (C5 durability)") {
    import spark.implicits._
    val feed = Files.createTempDirectory("feed2").toString
    val root = Files.createTempDirectory("feed2_store").toString
    val ckpt = Files.createTempDirectory("feed2_ckpt").toString
    val store = new KeyedParquetStore(root, nBuckets = 4)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))

    def run(collector: scala.collection.mutable.Set[Long]): Unit = {
      val q = ChangeFeed.stream(spark, feed)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          collector ++= b.select("lsn").collect().map(_.getLong(0))
          CdcPipeline.applyBatch(b, store, Map("t" -> schema), Map("t" -> "id"))
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    ChangeFeed.publish(Seq(
      ChangeEvent(1, ts(1), "I", "t", 1, """{"id":1,"v":"a"}"""),
      ChangeEvent(2, ts(2), "I", "t", 2, """{"id":2,"v":"b"}""")).toDF(), feed)
    val firstRun = scala.collection.mutable.Set.empty[Long]
    run(firstRun)
    assert(firstRun == Set(1L, 2L))

    // new capture batch lands while the mirror is down
    ChangeFeed.publish(Seq(
      ChangeEvent(3, ts(3), "U", "t", 1, """{"id":1,"v":"a2"}""")).toDF(), feed)
    val secondRun = scala.collection.mutable.Set.empty[Long]
    run(secondRun)
    assert(secondRun == Set(3L), s"restart reprocessed old offsets: $secondRun")

    val state = store.read(spark, "t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state == Seq((1L, "a2"), (2L, "b")))
  }
}
