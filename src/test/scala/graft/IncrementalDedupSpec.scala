package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IncrementalDedup, KeyedParquetStore}

/** Online near-dup admission across micro-batches: later batches must
  * be deduped against everything already admitted, within-batch dups
  * resolve to the smaller id, and replaying a batch is idempotent. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val baseA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val baseD = "red orange yellow green blue indigo violet ultra infra deep"

  test("admits novel docs, drops near-dups of admitted corpus and within-batch") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("inc_dedup").toString, nBuckets = 4)
    val dedup = new IncrementalDedup(store, "docs", threshold = 0.8)

    val b1 = Seq((1L, baseA), (2L, baseD)).toDF("doc_id", "text")
    val a1 = dedup.admit(spark, b1).collect().map(_.getLong(0)).sorted
    assert(a1.toSeq == Seq(1L, 2L))

    val b2 = Seq(
      (3L, baseA + " lambda"), // near-dup of admitted doc 1 → dropped
      (4L, "one two three four five six seven eight nine ten"), // novel
      (5L, "one two three four five six seven eight nine ten eleven") // within-batch dup of 4
    ).toDF("doc_id", "text")
    val a2 = dedup.admit(spark, b2).collect().map(_.getLong(0)).sorted
    assert(a2.toSeq == Seq(4L))

    // replay of batch 2 (foreachBatch at-least-once): nothing new
    // admitted (3 and 5 still dup; 4 now dups ITSELF in the corpus)
    val a2again = dedup.admit(spark, b2).collect().map(_.getLong(0))
    assert(a2again.isEmpty)

    // index state: shingles only for admitted docs 1, 2, 4
    val indexed = store.read(spark, "docs_shingles")
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(indexed.toSeq == Seq(1L, 2L, 4L))
    val sizes = store.read(spark, "docs_sizes")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    assert(sizes.keySet == Set(1L, 2L, 4L))
    assert(sizes(1L) == 8L) // 10 tokens → 8 distinct 3-shingles
  }

  test("a batch is never deduped against its own shingles (probe before admit)") {
    import spark.implicits._
    val store = new KeyedParquetStore(
      Files.createTempDirectory("inc_dedup2").toString, nBuckets = 4)
    val dedup = new IncrementalDedup(store, "docs", threshold = 0.8)
    // a single novel doc must always be admitted, even on re-run with
    // an empty store state for it
    val b = Seq((7L, baseA)).toDF("doc_id", "text")
    assert(dedup.admit(spark, b).count() == 1)
  }

  test("exactDedupStream drops redeliveries within the watermark horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    def t(min: Long) = new java.sql.Timestamp(1700002800000L + min * 60000)
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)](spark)
    val q = IncrementalDedup.exactDedupStream(
        stream.toDF().toDF("ts", "doc_id", "text"), horizon = "30 minutes")
      .select("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("exact_dedup_out").start()
    // batch 1: doc A twice (retry), doc B once
    stream.addData((t(0), 1L, "alpha beta"), (t(1), 2L, "alpha beta"), (t(2), 3L, "gamma"))
    q.processAllAvailable()
    // batch 2: doc A again within horizon → dropped; novel doc → kept
    stream.addData((t(5), 4L, "alpha beta"), (t(6), 5L, "delta"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("exact_dedup_out").collect().map(_.getLong(0)).sorted.toSeq
    // one survivor per distinct content: docs 1 (alpha beta), 3, 5
    assert(kept == Seq(1L, 3L, 5L))
  }
}
