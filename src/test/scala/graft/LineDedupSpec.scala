package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

/** Cross-document line-level dedup (c11 / lineDedupRebuild): the
  * support threshold, order preservation, the all-boilerplate →
  * empty-string contract, and the funnel stage's monotone wiring. */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("lines at >= k cross-doc support are stripped; rarer lines and " +
    "line order survive; an all-boilerplate doc rebuilds to ''") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter"
    val docs = ((1 to 5).map(i => (i.toLong, s"unique body $i\n$boiler\ntail $i")) ++
      Seq((6L, "rare line\nonly here"), (7L, boiler))).toDF("doc_id", "text")
    val out = CorpusPipeline.lineDedupRebuild(docs, "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1 to 5).foreach { i =>
      assert(out(i.toLong) == s"unique body $i\ntail $i", out(i.toLong))
    }
    // below-threshold lines are identity (doc 6 shares nothing)
    assert(out(6L) == "rare line\nonly here")
    // a doc that was ONLY boilerplate rebuilds to the empty string —
    // dropping it is the caller's policy, not the transform's
    assert(out(7L) == "")
  }

  test("empty lines never count toward support and are dropped by the rebuild") {
    import spark.implicits._
    // the blank lines here would cross k=2 support if counted
    val docs = Seq((1L, "a\n\nb"), (2L, "c\n\n\nd")).toDF("doc_id", "text")
    val out = CorpusPipeline.lineDedupRebuild(docs, "text", k = 2)
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("a\nb", "c\nd"), out.toString)
  }

  test("funnel line-dedup stage: monotone counts, docs emptied by the " +
    "strip drop out, downstream stages run over the REBUILT text") {
    import spark.implicits._
    val docs = Seq(
      // "keep me" sits in 2 docs — BELOW the k=3 support, survives
      (1L, "keep me\nshared boilerplate"),
      (2L, "keep me\nshared boilerplate"), // exact dup AFTER the strip
      (3L, "shared boilerplate"),          // emptied -> dropped
      (4L, "shared boilerplate"))          // emptied -> dropped
      .toDF("doc_id", "text")
    val stages = CorpusPipeline.filterFunnel(docs,
      minTokens = 1, minDiversity = 0.0, jaccardThreshold = 0.99,
      withHtmlGate = false, lineDedupK = Some(3))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(stages == Seq(
      "0_total" -> 4L, "1_line_dedup" -> 2L, "2_exact_dedup" -> 1L,
      "3_quality" -> 1L, "4_near_dup" -> 1L), stages.toString)
    // every stage count is <= the previous one (monotone funnel)
    assert(stages.map(_._2).sliding(2).forall(w => w(1) <= w(0)))
  }
}
