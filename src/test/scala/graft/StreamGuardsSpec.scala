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

  test("streaming HTML gate: stream survivors+clean text == batch t29 labels") {
    import spark.implicits._
    val docs = Seq(
      1L -> ("<p>A proper article with plenty of prose around one " +
        "<a href=\"/r\">link</a> and enough text to clear every gate.</p>"),
      2L -> ("<ul><li><a href=\"/a\">Home page link</a></li>" +
        "<li><a href=\"/b\">Products and services</a></li>" +
        "<li><a href=\"/c\">About the whole company</a></li></ul>"), // link-dense
      3L -> "<p>tiny</p>",                                           // short
      4L -> "plain text with no markup, long enough to stay content here")
    // batch truth: the t29 labels + extracted text over the same rows
    val batch = graft.operators.CorpusPipeline
      .htmlGate(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val in = MemoryStream[(Long, String)](spark)
    val gated = StreamGuards.htmlGated(in.toDF.toDF("doc_id", "text"))
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("html_gated_docs").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("html_gated_docs")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch)
      assert(streamed.keySet == Set(1L, 4L), streamed.toString)
      assert(!streamed(1L).contains("<"), streamed(1L))
    } finally q.stop()
  }

  test("streaming URL gate: canonical columns attached, blocked domains dropped, stream==batch") {
    import spark.implicits._
    val blocklist = Seq("spam.example.com")
    val docs = Seq(
      (1L, "https://www.Good.EXAMPLE.com:443/a/?utm_source=x&id=1"),
      (2L, "http://spam.example.com:80/landing"),   // blocked
      (3L, "https://good.example.com/a?id=1"))      // 1's redirect twin
    val batch = graft.streaming.StreamGuards
      .urlGated(docs.toDF("doc_id", "url"), blocklist)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet

    val in = MemoryStream[(Long, String)](spark)
    val gated = StreamGuards.urlGated(in.toDF.toDF("doc_id", "url"), blocklist)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("url_gated_docs").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("url_gated_docs")
        .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set(1L, 3L), streamed.toString)
      // redirect-pair twins converge to ONE canonical form — the key a
      // downstream dropDuplicates("url_canon") dedups on
      assert(streamed.map(_._2) == Set("https://good.example.com/a?id=1"))
      assert(streamed.map(_._3) == Set("good.example.com"))
    } finally q.stop()
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
