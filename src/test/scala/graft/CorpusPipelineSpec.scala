package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

/** Each cleaning stage must fire on a planted example: exact dup,
  * low-quality doc, near-dup, and PII scrub. */
class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("clean drops exact dups, low-quality docs, and near-dups; scrubs PII") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),                         // keeper
      (2L, base),                         // exact dup of 1 → dropped
      (3L, base + " lambda"),             // near-dup of 1 (jaccard >= 0.8) → dropped (larger id)
      (4L, "short text"),                 // below minTokens → dropped
      (5L, "spam spam spam spam spam spam spam spam spam spam"), // low diversity → dropped
      (6L, "contact me at alice@example.com about item 123456 thanks a lot friend")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, minTokens = 5, minDiversity = 0.3,
      jaccardThreshold = 0.8).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 6L))
    // doc 6's fingerprint equals the fold of the manually scrubbed text
    val scrubbedText = "contact me at <EMAIL> about item <NUM> thanks a lot friend"
    val expectedFp = scrubbedText.foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val row6 = out.find(_.getLong(0) == 6L).get
    assert(row6.getAs[Long]("scrubbed_fp") == expectedFp)
    assert(row6.getAs[Int]("n_tokens") == 11)
  }

  test("near-dup stage only compares quality survivors") {
    import spark.implicits._
    // doc 1 fails the length gate but shares shingles with doc 2. If
    // pairs were computed over ALL docs, (da=1, db=2) would drop doc 2;
    // gating first means doc 1 never reaches the pair stage.
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, minTokens = 5, minDiversity = 0.3,
      jaccardThreshold = 0.1).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
  }
}
