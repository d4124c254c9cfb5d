package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPipeline, TextQueries}

/** The t29 gate wired into the corpus funnel (r16 missing #2): on a
  * crawl-shaped fixture the funnel's stage 1 is the markup gate, every
  * later stage runs over EXTRACTED text, survivor counts are monotone,
  * and the gate row agrees with `t29_html_extract`'s labels row for
  * row. The ungated funnel (the c5 oracle's shape) is untouched. */
class HtmlFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 30 distinct words: quality-passing prose after extraction
  private val prose = ("alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliett kilo lima mike november oscar papa quebec romeo sierra " +
    "tango uniform victor whiskey xray yankee zulu ocean river stone cloud")
  // near-dup of prose: only the LAST word differs → 27 of 29 union
  // shingles shared, Jaccard ≈ 0.93 ≥ 0.8
  private val proseNear = prose.split(" ").init.mkString(" ") + " meadow"

  private def fixture(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("crawl_funnel").toString
    val docs = Seq(
      // two MARKUP VARIANTS of one article — exact-dup only after the
      // gate extracts them to identical text
      (1L, s"<html><body><p>$prose</p></body></html>"),
      (2L, s"<div>$prose</div>"),
      // near-dup of the article (post-extraction Jaccard ≥ 0.8)
      (3L, s"<p>$proseNear</p>"),
      // link-dense nav page → boilerplate
      (4L, """<ul><li><a href="/a">Home page link</a></li>
             |<li><a href="/b">Products and services</a></li>
             |<li><a href="/c">About the whole company</a></li>
             |<li><a href="/d">Contact and directions</a></li></ul>""".stripMargin),
      // stub → boilerplate (short after stripping)
      (5L, "<p>tiny</p>"),
      // low-diversity content → survives the gate, fails quality
      (6L, "<p>" + Seq.fill(12)("spam").mkString(" ") + "</p>"),
      // markup-free content doc → identity through the gate
      (7L, "plain prose with distinct tokens enough to pass every " +
        "quality gate here today"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("crawl funnel: html gate first, monotone counts, gate row = t29 labels") {
    val dir = fixture()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val rows = CorpusPipeline.filterFunnel(docs,
      minTokens = 10, minDiversity = 0.3, jaccardThreshold = 0.8,
      withHtmlGate = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map(
      "0_total" -> 7L,
      "1_html_gate" -> 5L,   // nav + stub gated out
      "2_exact_dedup" -> 4L, // markup variants 1/2 collapse POST-extraction
      "3_quality" -> 3L,     // the spam doc fails diversity
      "4_near_dup" -> 2L),   // doc 3 is doc 1's near-dup
      rows.toString)
    // monotonicity by construction — every stage filters the previous
    val ordered = rows.toSeq.sortBy(_._1).map(_._2)
    assert(ordered.sliding(2).forall { case Seq(a, b) => b <= a; case _ => true })
    // the gate row must agree with the t29 report's labels on the
    // same fixture — one definition, so this can never drift
    val contentDocs = TextQueries.queries("t29_html_extract")(spark, dir)
      .filter("label = 'content'").count()
    assert(rows("1_html_gate") == contentDocs)
  }

  test("cleanCrawl = clean over gated+extracted text; card reflects the gated corpus") {
    val dir = fixture()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val survivors = CorpusPipeline.cleanCrawl(docs,
      minTokens = 10, minDiversity = 0.3, jaccardThreshold = 0.8)
      .collect().map(_.getLong(0)).toSeq
    assert(survivors == Seq(1L, 7L), survivors.toString)

    // the dataset card over the GATED corpus documents what ships:
    // n_docs counts gate survivors, tokens count extracted prose
    val gatedDir = Files.createTempDirectory("gated_docs").toString
    CorpusPipeline.htmlGate(docs).write.mode("overwrite")
      .parquet(s"$gatedDir/documents.parquet")
    val card = CorpusPipeline.queries("c7_dataset_card")(spark, gatedDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("n_docs") == 5L)
    assert(card("n_exact_dups") == 1L) // the collapsed markup variant
  }

  test("ungated funnel shape is byte-identical to the c5 oracle contract") {
    val dir = fixture()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val stages = CorpusPipeline.filterFunnel(docs,
      minTokens = 10, minDiversity = 0.3, jaccardThreshold = 0.8,
      withHtmlGate = false)
      .collect().map(_.getString(0)).toSeq
    assert(stages == Seq("0_total", "1_exact_dedup", "2_quality", "3_near_dup"))
  }
}
