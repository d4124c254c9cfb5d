package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline
import graft.streaming.StreamingPacker

/** Streaming sequence packing: the stateful bin-carryover half of
  * c10_pack_sequences. Pins the core contract — the stream's manifest
  * over any micro-batch split equals the batch operator's on the same
  * corpus — plus replay idempotency, O(1) state, and the loud
  * out-of-order guard. */
class StreamingPackerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def manifestTuples(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("bin_id").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("stream over 3 micro-batches == batch c10 on the same corpus; replay is a no-op") {
    val work = Files.createTempDirectory("packer").toString
    val packer = new StreamingPacker(budget = 4096L,
      manifestDir = s"$work/manifest", stateDir = s"$work/state")
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text")

    // ascending-doc_id split — the shape an append-only ingest feed has
    packer.applyBatch(docs.filter(col("doc_id") < 150), 0L)
    packer.applyBatch(docs.filter(col("doc_id") >= 150 && col("doc_id") < 320), 1L)
    // an empty micro-batch mid-stream advances the gate, changes nothing
    packer.applyBatch(docs.filter(col("doc_id") < 0), 2L)
    packer.applyBatch(docs.filter(col("doc_id") >= 320), 3L)

    val streamed = manifestTuples(packer.manifest(spark))
    val batch = manifestTuples(
      CorpusPipeline.queries("c10_pack_sequences")(spark, sf))
    assert(streamed == batch,
      s"stream/batch manifests diverge:\n$streamed\nvs\n$batch")

    // at-least-once replay of an old batch: skipped, manifest unchanged
    packer.applyBatch(docs.filter(col("doc_id") >= 150 && col("doc_id") < 320), 1L)
    assert(manifestTuples(packer.manifest(spark)) == batch)

    // O(1) state: one line, scalar triple + at most one open-bin row
    val stateFile = new java.io.File(s"$work/state/_graft_pack_state")
    assert(stateFile.exists && stateFile.length < 256,
      s"state must be O(1), got ${stateFile.length} bytes")
  }

  test("as a real foreachBatch sink: file-source ingest + checkpoint restarts == batch c10") {
    import org.apache.spark.sql.types._
    val work = Files.createTempDirectory("packer_stream").toString
    val ckpt = s"$work/ckpt"
    val ingest = s"$work/ingest"
    val packer = new StreamingPacker(budget = 4096L,
      manifestDir = s"$work/manifest", stateDir = s"$work/state")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
    def land(pred: org.apache.spark.sql.Column): Unit =
      docs.filter(pred).repartition(1).write.mode("append").json(ingest)
    def run(): Unit = {
      val q = spark.readStream.schema(schema).json(ingest)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          packer.applyBatch(b, id)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // three ingest arrivals with a query RESTART between each — the
    // packer's batchId replay gate must agree with Spark's committed
    // offsets (restart consumes only unseen files, batch ids continue)
    land(col("doc_id") < 150); run()
    land(col("doc_id") >= 150 && col("doc_id") < 320); run()
    land(col("doc_id") >= 320); run()

    val streamed = manifestTuples(packer.manifest(spark))
    val batch = manifestTuples(
      CorpusPipeline.queries("c10_pack_sequences")(spark, sf))
    assert(streamed == batch,
      s"stream-sink manifest diverges from batch c10:\n$streamed\nvs\n$batch")
  }

  test("out-of-order batches fail loudly (a re-sorted corpus is a different packing)") {
    import spark.implicits._
    val work = Files.createTempDirectory("packer_ooo").toString
    val packer = new StreamingPacker(budget = 64L,
      manifestDir = s"$work/manifest", stateDir = s"$work/state")
    packer.applyBatch(
      Seq((10L, "a b c"), (11L, "d e")).toDF("doc_id", "text"), 0L)
    val e = intercept[IllegalArgumentException] {
      packer.applyBatch(Seq((5L, "x y")).toDF("doc_id", "text"), 1L)
    }
    assert(e.getMessage.contains("ascending doc_id"), e.getMessage)
  }

  test("bins straddle micro-batch boundaries: the open bin carries and closes later") {
    import spark.implicits._
    val work = Files.createTempDirectory("packer_carry").toString
    val packer = new StreamingPacker(budget = 10L,
      manifestDir = s"$work/manifest", stateDir = s"$work/state")
    // doc tokens: 4, 4 (batch 0) then 4, 4 (batch 1): offsets 0,4,8,12 →
    // bins 0,0,0,1 — bin 0 spans both batches (docs 1,2,3), closes in
    // batch 1, and reads fill 12/10 = 120% (the straddle policy)
    packer.applyBatch(
      Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text"), 0L)
    // nothing closed yet — bin 0 is still open
    assert(manifestTuples(packer.manifest(spark)) ==
      Seq((0L, 2L, 8L, 1L, 2L, 8000L)))
    packer.applyBatch(
      Seq((3L, "i j k l"), (4L, "m n o p")).toDF("doc_id", "text"), 1L)
    assert(manifestTuples(packer.manifest(spark)) == Seq(
      (0L, 3L, 12L, 1L, 3L, 12000L), // closed: straddles, fill > 100%
      (1L, 1L, 4L, 4L, 4L, 4000L)))  // open: doc 4 started at offset 12
  }
}
