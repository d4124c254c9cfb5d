package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** t34 C4 filter suite (Raffel et al. §2.2) on planted pages: each
  * line rule (terminal punctuation, word floor, javascript) drops its
  * line alone, each page rule (lorem ipsum, curly brace, bad word,
  * too-few-sentences) flags its page alone, and the rebuilt text is
  * exactly the kept lines in order. Doc ids are chosen against the
  * c4 page's branch mods (%4/%13/%17/%19/%21/%23 plus the crawl page's
  * %5/%7/%9/%10) so exactly the intended paragraph appears. */
class C4FilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("t34").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    TextQueries.queries("t34_c4_filters")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
          r.getString(8))))
      .toMap // doc -> (lines, kept, sentences, lorem, brace, bad, flagged, kept_text)
  }

  test("each C4 rule fires alone on its planted page") {
    val prose = "this body line carries a full prose sentence."
    val out = run(Seq(
      // 3: only the prose paragraph (4 sentences) — punctuated body
      // kept, nav/footer dropped by the punctuation rule
      3L -> prose,
      // 11: body ends '?' — the other terminal marks count too
      11L -> "is this body a proper question line?",
      // 26 (%13): code paragraph — brace flags the page, the
      // javascript line is dropped by the line rule despite ending '.'
      26L -> "no punct here",
      // 34 (%17): blocklisted sentence — kept as a line, flags the page
      34L -> "no punct here",
      // 38 (%19): lorem ipsum sentence — kept as a line, flags the page
      38L -> "no punct here",
      // 42 (%21, %7): 'too short.' punctuated but under the word floor
      42L -> "no punct here",
      // 46 (%23): no prose paragraph — zero sentences survive, the
      // too-few-sentences rule flags with every other flag quiet
      46L -> "no punct here",
      // 25 (%4=1, %5): the per-source editorial paragraph is kept whole
      25L -> "no punct here"))

    val d3 = out(3L) // nav, body, 4 prose lines, footer
    assert(d3 == ((7L, 5L, 5L, false, false, false, false,
      prose + "\n" +
        (22L to 25L).map(k => "the nightly pipeline publishes dataset " +
          s"number $k after careful review.").mkString("\n"))),
      d3.toString)

    val d11 = out(11L)
    assert(d11._2 == 3L && !d11._7, d11.toString) // '?' body + 2 prose
    assert(d11._8.startsWith("is this body a proper question line?"),
      d11.toString)

    val d26 = out(26L)
    assert(d26._5 && !d26._4 && !d26._6 && d26._7, d26.toString)
    assert(!d26._8.contains("javascript") && !d26._8.contains("{"),
      d26.toString)
    assert(d26._2 == 2L && d26._3 == 2L, d26.toString) // 2 prose lines

    val d34 = out(34L)
    assert(d34._6 && !d34._4 && !d34._5 && d34._7, d34.toString)
    assert(d34._8.contains("casino tonight."), d34.toString) // line kept

    val d38 = out(38L)
    assert(d38._4 && !d38._5 && !d38._6 && d38._7, d38.toString)
    assert(d38._8.contains("lorem ipsum dolor"), d38.toString)

    val d42 = out(42L)
    assert(!d42._7 && d42._2 == 3L, d42.toString) // 3 prose sentences
    assert(!d42._8.contains("too short."), d42.toString) // word floor
    assert(!d42._8.contains("- bullet"), d42.toString)

    val d46 = out(46L)
    assert(d46._2 == 0L && d46._3 == 0L && d46._7, d46.toString)
    assert(!d46._4 && !d46._5 && !d46._6 && d46._8 == "", d46.toString)

    val d25 = out(25L) // 1 prose + 3 editorial sentences
    assert(d25._2 == 4L && !d25._7, d25.toString)
    assert(d25._8.contains("we publish fresh data stories every day.") &&
      d25._8.endsWith("follow web for the best daily insights."),
      d25.toString)
  }

  test("c4 funnel: stage 1 agrees with the t34 verdicts; monotone") {
    val sf = "/root/testdata/sf0.001"
    val funnel = graft.operators.CorpusPipeline.queries("c14_c4_funnel")(
        spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val unflagged = TextQueries.queries("t34_c4_filters")(spark, sf)
      .filter("NOT flagged").count()
    assert(funnel("1_c4_gate")._1 == unflagged, funnel.toString)
    val (k0, k1, k2) = (funnel("0_total"), funnel("1_c4_gate"),
      funnel("2_span_dedup"))
    assert(k0._1 >= k1._1 && k1._1 >= k2._1, funnel.toString)
    assert(k0._2 >= k1._2 && k1._2 >= k2._2, funnel.toString)
    assert(k2._1 > 0 && k1._1 < k0._1 && k2._2 < k1._2,
      s"every stage must bite: $funnel")
  }
}
