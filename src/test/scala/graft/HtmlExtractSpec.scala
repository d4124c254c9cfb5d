package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** t29 HTML/boilerplate extraction on PLANTED markup (the shipped
  * documents table is plain text, so the oracle run exercises mostly
  * the identity path — this spec drives the actual stripping, entity
  * decoding, link-density gate, and the downstream-tokenizer
  * integration on real HTML shapes). */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def runT29(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("t29").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    TextQueries.queries("t29_html_extract")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("strips tags/script/style/comments, decodes entities, gates on link density") {
    val article =
      """<html><head><style>body { color: red }</style>
        |<script type="text/javascript">var x = "<a href='no'>not text</a>";</script>
        |</head><body><!-- header boilerplate -->
        |<h1>Fish &amp; Chips</h1>
        |<p>A proper article about cooking, with one
        |<a href="/ref">citation link</a> and enough prose around it to
        |stay under the link-density gate. Tom &quot;the cook&quot; says
        |3 &lt; 5.</p></body></html>""".stripMargin
    val navPage =
      """<div class="nav"><ul>
        |<li><a href="/a">Home page</a></li>
        |<li><a href="/b">Products and services</a></li>
        |<li><a href="/c">About the company</a></li>
        |<li><a href="/d">Contact and directions</a></li>
        |</ul></div>""".stripMargin
    val stub = "<p>tiny</p>"
    val plain = "plain text with no markup at all, fifty chars of it"

    val out = runT29(Seq(1L -> article, 2L -> navPage, 3L -> stub, 4L -> plain))

    // article: script/style/comment payloads GONE (the js string
    // contains a fake <a> that must not count), entities decoded,
    // modest link density → content
    val a = out(1L)
    assert(a.getAs[String]("label") == "content", a.toString)
    assert(a.getAs[Long]("link_chars") == "citation link".length.toLong)
    assert(a.getAs[Long]("link_density_bp") < 3000L)
    assert(a.getAs[Long]("tag_overhead_bp") > 0L)

    // nav page: almost every clean char sits inside an anchor → gated
    val n = out(2L)
    assert(n.getAs[String]("label") == "boilerplate", n.toString)
    assert(n.getAs[Long]("link_density_bp") >= 3000L)

    // stub: too short after stripping
    assert(out(3L).getAs[String]("label") == "boilerplate")
    assert(out(3L).getAs[Long]("n_clean") < 40L)

    // plain text: identity — no overhead, no links, content
    val p = out(4L)
    assert(p.getAs[Long]("n_raw") == p.getAs[Long]("n_clean"))
    assert(p.getAs[Long]("tag_overhead_bp") == 0L)
    assert(p.getAs[String]("label") == "content")
  }

  test("&amp;lt; single-decodes to the literal '&lt;' (never double-decodes to '<')") {
    import spark.implicits._
    val dir = Files.createTempDirectory("t29e").toString
    Seq((1L, "<p>write &amp;lt; to show a literal less-than entity, " +
      "padded to clear the length gate</p>"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    // re-derive the clean text the query computes: decode &amp; LAST
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val cleaned = TextQueries.queries("t29_html_extract")(spark, dir)
      .collect().head
    // "&amp;lt;" is 8 raw chars → "&lt;" is 4 clean; if it double-
    // decoded to "<" the clean length would drop by 3 more
    val expectedClean = ("write &lt; to show a literal less-than entity, " +
      "padded to clear the length gate").length.toLong
    assert(cleaned.getAs[Long]("n_clean") == expectedClean, cleaned.toString)
  }

  test("clean output feeds the existing text pipeline (t1-style tokenization)") {
    import spark.implicits._
    // the t29 gate composes with the quality stages: tokenizing the
    // STRIPPED text of a markup-heavy doc counts words, not tags
    val html = "<div><p>seven words of actual article text here</p></div>"
    val dir = Files.createTempDirectory("t29i").toString
    Seq((1L, html)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val clean = regexp_replace(regexp_replace(col("text"),
      "<[^>]*>", " "), "\\s+", " ")
    val nToks = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(graft.functions.HashExprs.tokenize(trim(clean))).as("n"))
      .collect().head.getInt(0)
    assert(nToks == 7, s"expected the 7 prose words, got $nToks")
  }
}
