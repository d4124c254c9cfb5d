package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamGuards

/** The stateless decontamination guard must (a) agree exactly with the
  * relational c2 sweep on a batch frame and (b) run unchanged inside a
  * structured stream (no state, no stream-static join). */
class StreamGuardsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("batch parity: guard survivors = corpus minus c2 hits") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val bench = StreamGuards.benchmarkShingles(docs.filter(col("doc_id") < 10))
    assert(bench.nonEmpty && bench.length == bench.distinct.length)
    val survivors = StreamGuards
      .decontaminated(docs.filter(col("doc_id") >= 10), bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c2hits = SparkEntry.queries("c2_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.filter(col("doc_id") >= 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c2hits.nonEmpty, "the corpus plants contaminated docs at sf0.001")
    assert(survivors == all -- c2hits)
  }

  test("the guard runs stateless inside a structured stream") {
    import spark.implicits._
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((0L, benchText)).toDF("doc_id", "text")
    val shingles = StreamGuards.benchmarkShingles(bench)

    val in = MemoryStream[(Long, String)](spark)
    val guarded = StreamGuards.decontaminated(
      in.toDF.toDF("doc_id", "text"), shingles, minHits = 3)
    val q = guarded.writeStream.outputMode("append")
      .format("memory").queryName("guarded_docs").start()
    try {
      in.addData(
        (10L, benchText + " iota kappa"),          // ≥3 bench shingles → dropped
        (11L, "one two three four five six seven"), // clean → kept
        (12L, "alpha beta gamma nine ten"))         // 1 bench shingle → kept
      q.processAllAvailable()
      val kept = spark.table("guarded_docs")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(11L, 12L))
    } finally q.stop()
  }
}
