package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism under parallelism: a distributed engine's results must
  * not depend on how the work is split. Every query here is re-run in
  * a session pinned to a much smaller shuffle-partition count (3 vs
  * the suite's 8) and must produce byte-identical ordered results. This is the property that makes task retries, AQE
  * re-planning, and cluster resizing safe — and it is exactly what
  * rand()/arrival-order aggregates (avg-of-double chains, engine mode()
  * tie-breaks) silently break. The sample crosses every operator
  * family that has an order-sensitive failure mode: floating-point
  * aggregation, window ties, top-k, sketches, sampling, packing. */
class ParallelismInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val picks = Seq(
    "j4_revenue_per_nation", // decimal-exact join-agg
    "x5_pricing_summary",    // TPC-H-Q1 multi-aggregate
    "w1_top1_per_group",     // window rank ties
    "t9_salient_terms",      // tf-idf rank with tie-break chain
    "d3_minhash_lsh",        // sketch-derived candidates
    "sp4_weighted_sample",   // hash-derived sampling
    "t15_sequence_packing",  // running-sum binning
    "a13_mode_median",       // mode/median tie handling
    "e2_heavy_tokens",       // Misra–Gries candidates → exact pass
    "ts7_ohlc_bars",         // min_by/max_by open/close
    "sp6_corpus_shuffle",    // bucketed global rank (offset cumsum)
    "d10_repeated_spans",    // hash-first top-k cut + text recovery
    "d9_dup_weights",        // iterative CC labels + broadcast joins
    "t19_bpe_merge_candidates", // vocab rollup + weighted pair top-k
    // late-r8 order-sensitive additions
    "c8_curriculum",         // bucketed global rank → stage cut
    "ts11_theilsen",         // two-pass median over banded pair slopes
    "s15_matryoshka_recall", // double-cosine window ranks with vid ties
    "s14_pca_power",         // 64-key integer sums (assoc-exact adds)
    "dq5_skew_advisor",      // TakeOrdered top-5 with cnt ties
    "e9_join_size",          // CMS counter sums + inner product
    // r17 URL family: canonical-form groupBys (min-keeper, two-level
    // countDistinct) must not depend on which partition sees a
    // variant first
    "d14_url_dedup", "d15_domain_gate")

  // core-count invariance is NOT claimed here: newSession() shares the
  // JVM's SparkContext, so only the shuffle-partition conf actually
  // varies between the two runs
  test("query results are invariant to shuffle partitioning") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "3")
    for (name <- picks) {
      val base = SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
      val re = SparkEntry.queries(name)(alt, sf).collect().map(_.toString).toSeq
      assert(base == re, s"$name result depends on partitioning")
      assert(base.nonEmpty, s"$name returned no rows at $sf")
    }
  }
}
