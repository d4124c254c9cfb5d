package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** t31 Gopher top-n-gram repetition on planted docs: the character-
  * share formula, the strict-> threshold boundary, the deterministic
  * tie-break, and the contrast with t16 (distinct bigrams, dominant
  * phrase) that motivates a separate signal. */
class GopherRepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("t31").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    TextQueries.queries("t31_gopher_repetition")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
  }

  test("character share, thresholds, boundary, and tie-break") {
    val spamRun = "spam spam spam spam spam" // 24 chars, 5 tokens
    // exactly-at-threshold doc: "spam spam" twice over exactly 90
    // chars -> 10000*2*9 DIV 90 = 2000 bp = the 2-gram threshold,
    // strict > means NOT flagged
    val boundary = "spam spam x spam spam" +
      " aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt uu vv ww"
    assert(boundary.length == 90, boundary.length.toString)
    val clean = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu")
    val ties = "b b a a b b a a"

    val out = run(Seq(1L -> spamRun, 2L -> boundary, 3L -> clean, 4L -> ties))

    // doc 1: "spam spam" x4, 9 chars each over 24 -> 15000 bp, flagged
    assert(out((1L, 2)) == (("spam spam", 4L, 15000L, true)), out((1L, 2)).toString)
    // overlapping occurrences legitimately exceed 10000 bp (uncapped,
    // as the published filter computes it)
    assert(out((1L, 3)) == (("spam spam spam", 3L, 17500L, true)))
    assert(out((1L, 4)) == (("spam spam spam spam", 2L, 15833L, true)))

    // doc 2: exactly AT the 2000 bp threshold -> strict > leaves it clean
    assert(out((2L, 2)) == (("spam spam", 2L, 2000L, false)), out((2L, 2)).toString)

    // doc 3: long diverse prose -> far under every threshold
    val (g3, c3, s3, f3) = out((3L, 2))
    assert(c3 == 1L && s3 < 2000L && !f3, out((3L, 2)).toString)
    assert(g3.nonEmpty)

    // doc 4: three bigrams tie at count 2 -> deterministic winner is
    // the LARGEST gram string ("b b" > "b a" > "a a")
    assert(out((4L, 2))._1 == "b b", out((4L, 2)).toString)
  }

  test("distinct signal from t16: a dominant phrase among distinct bigrams") {
    import spark.implicits._
    // every bigram DISTINCT except the dominant phrase: t16's
    // dup-ratio stays under its 0.2 flag while t31's 2-gram character
    // share flags the doc — the two signals are not redundant
    val phrase = "click here"
    val doc = (1 to 12).map(i => s"w$i x$i y$i z$i $phrase").mkString(" ")
    val dir = Files.createTempDirectory("t31c").toString
    Seq((1L, doc)).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val t31 = TextQueries.queries("t31_gopher_repetition")(spark, dir)
      .filter("n = 2").collect().head
    assert(t31.getString(2) == phrase && t31.getLong(3) == 12L &&
      t31.getBoolean(5), t31.toString)
    val t16 = TextQueries.queries("t16_repetition")(spark, dir)
      .collect().head
    assert(!t16.getAs[Boolean]("flagged"),
      s"t16 should stay clean on distinct-bigram text: $t16")
  }
}
