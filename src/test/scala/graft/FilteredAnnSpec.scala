package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the two round-11 frontier queries:
  *
  *  - s18 filtered ANN: the metadata predicate must hold on every
  *    returned neighbor (pre-filtering cannot leak filtered-out
  *    vectors back in), ranks must be contiguous per query, and the
  *    engine-sized probe widening (autoProbeCells) must deliver a
  *    non-empty top-k at the shipped selectivity.
  *  - c9 DSIR: on a corpus with PLANTED domains (target speaks
  *    vocabulary A, pool speaks B) a held-out vocabulary-A probe must
  *    outscore a vocabulary-B probe, and weights must be finite for
  *    every scored doc (smoothing covers empty buckets). Note the
  *    invariant is deliberately planted: on the synthetic tables the
  *    source domains are i.i.d., so the SIGN of the aggregate tilt is
  *    noise — only a real distributional difference is a theorem.
  */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("s18: every neighbor satisfies the predicate; ranks contiguous from 1") {
    val rows = SparkEntry.queries("s18_filtered_ann")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("label") <= 3), "post-filter leak")
    assert(rows.forall(_.getAs[Long]("vid") >= 5), "a query returned as its own neighbor")
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"qid=$qid ranks=$ranks")
      // ranking is by cosine desc — the materialized order must agree
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"qid=$qid not sorted")
    }
  }

  test("s18: engine-sized probe widening fills every query's top-k") {
    // the probe depth comes from autoProbeCells (ceil of inverse
    // selectivity) — at the shipped selectivity every query must fill
    // a non-empty top-k from its widened probe set
    val out = SparkEntry.queries("s18_filtered_ann")(spark, sf).collect()
    val hitsPerQ = out.groupBy(_.getAs[Long]("qid")).view.mapValues(_.length).toMap
    assert(hitsPerQ.values.forall(n => n >= 1 && n <= 3))
  }

  test("c9: planted domains — a target-vocabulary probe outscores a " +
    "pool-vocabulary probe; every scored doc is present and finite") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target domain speaks vocabulary A, the rest of the pool speaks
    // B; two probe docs from a NON-target source let the test check
    // the tilt unconfounded by the target flag itself
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "zulu yankee xray whiskey victor uniform tango sierra"
    val docs = (
      (1L to 5L).map(i => (i, "tgt", a)) ++
        (11L to 30L).map(i => (i, "pool", b)) ++
        Seq((100L, "pool", a), (101L, "pool", b))
      ).toDF("doc_id", "source", "text")
    val out = graft.operators.CorpusPipeline
      .dsirWeights(docs, col("source") === "tgt", 4096)
      .collect()
    assert(out.length == docs.count())
    def w(id: Long): Long =
      out.find(_.getAs[Long]("doc_id") == id).get.getAs[Long]("dsir_logw_micro")
    assert(w(100L) > w(101L),
      s"DSIR tilt inverted: target-vocab probe ${w(100L)} <= pool-vocab probe ${w(101L)}")
    // and the table-backed query runs end-to-end with finite weights
    // integer micro-unit weights (r11 advice): exact, order-independent
    val table = SparkEntry.queries("c9_dsir_weights")(spark, sf).collect()
    assert(table.nonEmpty &&
      table.forall(r => math.abs(r.getAs[Long]("dsir_logw_micro")) < 1e15.toLong))
  }
}
