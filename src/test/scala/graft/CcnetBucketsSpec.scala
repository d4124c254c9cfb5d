package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** t35 CCNet LM bucketing on planted docs: exact add-1 smoothed
  * probabilities, unseen-bigram backoff, and the LANGUAGE-matched
  * model (a document scored against another language's reference gains
  * nothing from that language's statistics). */
class CcnetBucketsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("exact smoothed scores; the model is language-matched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("t35").toString
    Seq(
      // reference slice (doc_id < 50)
      (1L, "en", "a b a b a b"), // c(a b)=3, c(b a)=2; u(a)=u(b)=3; v=2
      (2L, "fr", "c d c d"),     // fr vocabulary disjoint from en's
      // scored docs
      (60L, "en", "a b a"), // p = (3+1)/(3+2), (2+1)/(3+2) -> mean 0.7
      (61L, "en", "x y"),   // unseen everywhere: p = 1/v = 0.5
      (62L, "fr", "a b a")  // en-familiar bigrams, FRENCH model: 1/2
    ).toDF("doc_id", "lang", "text")
      .selectExpr("doc_id", "text", "lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextQueries.queries("t35_ccnet_buckets")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(out.keySet == Set(60L, 61L, 62L), out.toString)
    assert(out(60L) == (("en", 2L, 700000.0, "head")), out(60L).toString)
    assert(out(61L) == (("en", 1L, 500000.0, "head")), out(61L).toString)
    // the same text as doc 60 scores as UNSEEN under the French model —
    // familiarity in another language's reference must not leak
    assert(out(62L)._3 == 500000.0 && out(62L)._3 < out(60L)._3,
      out(62L).toString)
  }
}
