package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExprs.char_fold
import graft.sources.Tables

/** Sampling and distribution-profiling operators for assembling
  * training mixes at corpus scale.
  *
  * Sampling here is *deterministic*: membership is a pure function of
  * the row key (polynomial char-fold hash mod 100), never `rand()`.
  * That buys three properties a 100 TB pipeline needs and random
  * sampling does not give:
  *   - reproducible — re-running the job (or re-reading a lost
  *     partition!) selects the identical sample; `rand()` under task
  *     retry silently changes the output;
  *   - embarrassingly parallel — a pure per-row filter, no shuffle, no
  *     state, pushes down next to the scan;
  *   - consistent across engines — the DuckDB oracle replays the same
  *     hash arithmetic bit-for-bit.
  */
object SamplingQueries {

  /** Per-language sampling rates (percent kept) for the stratified
    * sample: downsample the dominant language, keep minority languages
    * at higher rates — the standard training-mix rebalance. */
  val StratumRates: Map[String, Int] =
    Map("en" -> 10, "de" -> 50, "fr" -> 50, "es" -> 50, "zh" -> 100)

  /** Deterministic per-row draw in [0, 100): char-fold hash of the
    * doc_id rendered as a string (a key-derived uniform-ish value both
    * engines compute identically). */
  private def draw = pmod(char_fold(col("doc_id").cast("string")), lit(100))

  /** Finer-grained draw in [0, 10000) for weighted rates (sp4). */
  private def draw1e4 = pmod(char_fold(col("doc_id").cast("string")), lit(10000))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // stratified sampling by language: keep row iff its deterministic
    // draw falls under the stratum's rate. Pure filter — no shuffle, no
    // aggregation; at 100 TB this runs entirely map-side at scan speed.
    "sp1_stratified_sample" -> { (s, d) =>
      val rates = StratumRates.toSeq
        .foldLeft(lit(0)) { case (acc, (l, r)) =>
          when(col("lang") === l, lit(r)).otherwise(acc)
        }
      Tables.load(s, d, "documents")
        .filter(draw < rates)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    },

    // fixed-quota sample: exactly min(k, |stratum|) docs per language,
    // ranked by the deterministic draw (hash, then doc_id as the
    // tiebreak) — a reservoir sample whose "random" order is replayable.
    // The rank window partitions by stratum; strata are few by
    // construction (languages), so the sort is per-stratum-local. For
    // quotas over huge strata, pre-filter with a rate just above
    // k/|stratum| (sp1 spelling) before ranking so the sort input is
    // O(k), not O(|stratum|).
    "sp2_quota_sample" -> { (s, d) =>
      Tables.load(s, d, "documents")
        .withColumn("h", char_fold(col("doc_id").cast("string")))
        .withColumn("rk",
          row_number().over(Window.partitionBy("lang").orderBy("h", "doc_id")))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    },

    // exact grouped quantiles: the distribution profile that decides
    // cut-offs (length filters, outlier caps) before a training run.
    // Exact percentiles need a per-group sort *of distinct values only*
    // in Spark's percentile agg; at extreme cardinality swap in
    // percentile_approx (t-digest, single pass, mergeable) — same
    // query shape, bounded error.
    "q1_group_quantiles" -> { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"))
        .orderBy("flag")
    },

    // ── q3: CONTINUOUS quartiles at scale — q1's percentile_cont
    // semantics WITHOUT the ordered-set aggregate's per-group value
    // buffer (q1's own scaladoc concedes that swap-to-approx at
    // extreme cardinality; this is the exact alternative). The two
    // bracketing order statistics per quartile come from the same
    // two-pass log-bucket histogram machinery as a15/a16/a19
    // (Ranks.groupQuartilesCont), and the interpolation is EXACT
    // integer arithmetic: the value is returned ×4 = v_lo·4 +
    // r·(v_hi−v_lo) with r the fraction's numerator mod 4 — no IEEE
    // division or rounding on either engine's path, so the oracle
    // hash pins percentile_cont itself, not a float coincidence.
    // Every window is bucket-bounded; no group ever sorts in one task.
    "q3_quartiles_cont" -> { (s, d) =>
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      Ranks.groupQuartilesCont(li, Seq("flag"), "cents")
        .groupBy("flag")
        .agg(
          max(when(col("_p_idx") === 0, col("cents_x4"))).as("q1_x4"),
          max(when(col("_p_idx") === 1, col("cents_x4"))).as("q2_x4"),
          max(when(col("_p_idx") === 2, col("cents_x4"))).as("q3_x4"),
          max("_w_total").as("n"))
        .orderBy("flag")
    },

    // ── sp3: deterministic train/valid/test split (80/10/10 by the
    // same key-derived draw) with per-(lang, split) counts — the
    // assignment every training pipeline needs, reproducible under
    // retries and identical across engines. The split label is a pure
    // per-row function; the rollup is one partial-agg groupBy.
    "sp3_train_split" -> { (s, d) =>
      Tables.load(s, d, "documents")
        .withColumn("split",
          when(draw < 80, "train").when(draw < 90, "valid").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")
    },

    // ── sp4: deterministic weighted (probability-proportional-to-size)
    // sampling — longer documents are kept with probability
    // n_chars / max(n_chars), the PPS mix that over-samples
    // information-dense documents without ever calling rand(). The
    // per-row draw is the same replayable hash as sp1; the weight
    // threshold is EXACT integer arithmetic (`div`), so Spark and the
    // oracle agree bit-for-bit. Cost shape at 100 TB: one tiny
    // scalar aggregate (max weight) broadcast to every task, then a
    // pure map-side filter at scan speed — no shuffle of the corpus.
    "sp4_weighted_sample" -> { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      docs
        .crossJoin(broadcast(docs.agg(max(col("n_chars")).as("max_chars"))))
        .filter(draw1e4 < expr("(n_chars * 10000) div max_chars"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },

    // approximate grouped quantiles with a DRIVER-VERIFIABLE contract:
    // the production spelling at 100 TB is the GK sketch aggregate
    // alone (single-pass, mergeable, O(1/ε) state — no per-group
    // sort). Verification checks the sketch's ACTUAL guarantee — GK
    // bounds RANK error (|rank(e_p)/n − p| ≤ ε, ε = 1/accuracy =
    // 1/1000; 3× margin for interpolation slack) — by counting rows
    // strictly-below / at-or-below each estimate in ONE codegen'd
    // conditional-count pass and testing that the estimate's rank
    // interval [lo+1, hi] meets [(p−3ε)n, (p+3ε)n]. That replaces the
    // r7 spelling's exact-percentile ordered-set aggregate (which
    // buffered every group's 600 k raw values in an imperative value
    // map — 1.8 s at sf0.1; this is ~0.8 s) with two whole-stage-
    // codegen scans, and it is the more principled check: rank error
    // IS the GK contract. All comparisons in pinned integer
    // ten-thousandths — bit-stable booleans the DuckDB oracle
    // hash-checks (a broken sketch emits `false` and fails the gate).
    // Raw estimate accuracy is also pinned by ApproxQuantileSpec.
    "q2_approx_quantiles" -> { (s, d) =>
      // p ± 3ε in integer ten-thousandths (ε = 0.001)
      val ps = Seq((0, 4970, 5030), (1, 9470, 9530), (2, 9870, 9930))
      val li = Tables.load(s, d, "lineitem")
      val ap = li
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          count(lit(1)).as("n"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 1000)").as("ap"))
      val rankAggs = first("ap").as("ap") +:
        ps.flatMap { case (i, _, _) => Seq(
          sum(when(col("l_extendedprice") < col("ap")(i), 1L).otherwise(0L))
            .as(s"lo$i"),
          sum(when(col("l_extendedprice") <= col("ap")(i), 1L).otherwise(0L))
            .as(s"hi$i"))
        }
      val ranked = li
        .join(broadcast(ap), col("l_returnflag") === col("flag"))
        .groupBy("flag")
        .agg(first("n").as("n"), rankAggs: _*)
      def ok(i: Int, pLo: Int, pHi: Int): Column =
        (col(s"hi$i") * 10000L >= lit(pLo.toLong) * col("n")) &&
          ((col(s"lo$i") + 1L) * 10000L <= lit(pHi.toLong) * col("n"))
      ranked
        .select(col("flag"), col("n"),
          ok(0, 4970, 5030).as("ok50"),
          ok(1, 9470, 9530).as("ok95"),
          ok(2, 9870, 9930).as("ok99"))
        .orderBy("flag")
    },

    // ── sp6: deterministic corpus shuffle — the global training-data
    // order. A training run must consume the corpus in a "random"
    // order that is reproducible (elastic re-runs, resume-from-step,
    // identical across engines), so the permutation is a pure function
    // of the key: h = (doc_id · 654435747) mod 1e9+7 — a Knuth-style
    // multiplicative hash by a unit of the prime field, i.e. a TRUE
    // permutation of Z_p with strong mixing of consecutive ids. (The
    // char_fold of the DECIMAL STRING is deliberately not used here:
    // a polynomial fold of decimal digits is order-preserving within a
    // digit count — it would "shuffle" the corpus into its original
    // order.) The global position comes from [[Ranks.globalRank]] over
    // the composite key h·2³³ + doc_id — unique (h < 2³⁰,
    // doc_id < 2³³), ordered exactly like (h, doc_id) — so the plan is
    // the bucketed two-pass rank: NO single-partition sort of the
    // corpus anywhere, the same scale spelling as w3/w4's ntile, and
    // the hash keys are uniform so globalRank's equal-width buckets
    // stay balanced.
    "sp6_corpus_shuffle" -> { (s, d) =>
      val h = pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(654435747L),
        lit(1000000007L))
      val keyed = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"))
        .withColumn("skey", h * lit(8589934592L) + col("doc_id"))
      Ranks.globalRank(keyed, "skey", "pos")
        .select(col("pos"), col("doc_id"), col("lang"))
        .orderBy("pos")
    },

    // ── sp9: shard-export manifest — the terminal step of the
    // training-data pipeline: the shuffled corpus (sp6's deterministic
    // hash permutation) cut into fixed-size numbered shards, with the
    // per-shard stats an export job writes beside the data (doc count,
    // character mass, position range, first doc). Shard assignment is
    // `(pos − 1) div docsPerShard` over the bucketed global rank — no
    // single-partition sort anywhere, and the manifest is a tiny
    // per-shard rollup, so the plan is corpus-scale ready: the same
    // query IS the writer's partition key at 100 TB
    // (`.write.partitionBy("shard")` on the ranked frame). Every
    // number is a pure function of doc ids — re-running a failed
    // export reproduces identical shards (elastic retry safety).
    "sp9_shard_manifest" -> { (s, d) =>
      val docsPerShard = 256L
      val h = pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(654435747L),
        lit(1000000007L))
      val keyed = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .withColumn("skey", h * lit(8589934592L) + col("doc_id"))
      Ranks.globalRank(keyed, "skey", "pos")
        .withColumn("shard", expr(s"CAST((pos - 1) div $docsPerShard AS INT)"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          min("pos").as("pos_lo"), max("pos").as("pos_hi"),
          min_by(col("doc_id"), col("pos")).as("first_doc_id"))
        .orderBy("shard")
    },

    // ── sp10: Poisson bootstrap — confidence intervals for a corpus
    // statistic WITHOUT resampling passes (the web-scale bootstrap:
    // each replicate re-weights every row by an independent
    // Poisson(1) draw, so all R replicates come from ONE scan).
    // The draw is a deterministic multiplicative hash of
    // (event_id, replicate) inverted through the pinned Poisson(1)
    // CDF in 2²⁰-unit integer thresholds — replayable in any engine,
    // stable under retries (no rand()). Shape: rows × R stay
    // map-side (the 8-row broadcast spine multiplies no shuffle);
    // the aggregate is R groups with map-side partials. Bound:
    // event_id·2654435761 < 2⁶³ holds to event_id ≈ 3.4e9.
    "sp10_bootstrap" -> { (s, d) =>
      import s.implicits._
      val reps = (0 until 8).toDF("rep")
      Tables.events(s, d)
        .select(col("event_id"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v_milli"))
        .crossJoin(broadcast(reps))
        .withColumn("h",
          expr("(event_id * 2654435761L + rep * 97561L) % 1048576"))
        .withColumn("w", expr(
          """CASE WHEN h < 385750 THEN 0L WHEN h < 771499 THEN 1L
                  WHEN h < 964374 THEN 2L WHEN h < 1028665 THEN 3L
                  WHEN h < 1044738 THEN 4L WHEN h < 1047953 THEN 5L
                  ELSE 6L END"""))
        .groupBy("rep")
        .agg(sum("w").as("n_eff"), sum(expr("w * v_milli")).as("wsum"))
        .withColumn("mean_milli", expr("wsum DIV n_eff"))
        .orderBy("rep")
    },

    // ── sp7: mixture plan — the arithmetic every training run does
    // before sampling: given target shares per language and a total
    // character budget, compare each stratum's AVAILABLE mass against
    // its TARGET and emit the sampling rate (capped at 1) plus the
    // uncapped oversample factor (how many epochs of the stratum the
    // target implies when the source is too small). All EXACT integer
    // arithmetic (basis points, `div`) so the plan is bit-identical in
    // both engines. Cost: one partial-agg groupBy over ≤|langs| keys —
    // scan speed at any corpus size.
    "sp7_mix_plan" -> { (s, d) =>
      val budget = 2000000L // target corpus size, chars
      val shares = MixShares.toSeq
        .foldLeft(lit(0L)) { case (acc, (l, bp)) =>
          when(col("lang") === l, lit(bp)).otherwise(acc)
        }
      Tables.load(s, d, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("avail_chars"))
        .withColumn("share_bp", shares)
        .withColumn("target_chars", expr(s"share_bp * $budget div 10000"))
        .withColumn("epochs_bp",
          expr("target_chars * 10000 div avail_chars"))
        .withColumn("rate_bp", least(lit(10000L), col("epochs_bp")))
        .select("lang", "n_docs", "avail_chars", "target_chars", "rate_bp", "epochs_bp")
        .orderBy("lang")
    },

    // ── sp8: temperature-scaled source rebalancing (α = 0.5) — the
    // multilingual-training trick of sampling sources ∝ n^α so small
    // sources are up-weighted without drowning large ones. α = 0.5 is
    // deliberate: √n is the ONE non-integer op, and IEEE-754 requires
    // sqrt to be exactly rounded, so `floor(sqrt(n)·10⁶)` is
    // bit-identical in every engine — from there shares, boosts and
    // doc targets stay in exact integer basis points. Shape: one
    // hash aggregate over the corpus; the windowed share normalization
    // runs over the HANDFUL of post-aggregation source rows (the
    // unpartitioned window is over |sources| rows, not the corpus —
    // deliberately after the agg, never before).
    "sp8_temperature_mix" -> { (s, d) =>
      val agg = Tables.load(s, d, "documents")
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("sq_micro",
          expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)"))
        .withColumn("tot_sq", sum("sq_micro").over())
        .withColumn("tot_n", sum("n_docs").over())
      agg.select(col("source"), col("n_docs"),
          expr("sq_micro * 10000 div tot_sq").as("share_bp"),
          expr("n_docs * 10000 div tot_n").as("natural_bp"))
        .withColumn("boost_bp",
          expr("CASE WHEN natural_bp = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE share_bp * 10000 div natural_bp END"))
        .withColumn("target_docs", expr("share_bp * 500000 div 10000"))
        .orderBy("source")
    }
  )

  /** Target mixture shares in basis points (sums to 10000): the
    * training-mix recipe sp7 plans against. */
  val MixShares: Map[String, Long] =
    Map("en" -> 4000L, "de" -> 1500L, "fr" -> 1500L, "es" -> 1500L, "zh" -> 1500L)

  private def foldDoc: String = DedupQueries.charFoldSqlOf("CAST(doc_id AS VARCHAR)")

  def oracles: Map[String, String] = Map(
    "sp1_stratified_sample" -> {
      val cases = StratumRates.toSeq.sortBy(_._1)
        .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
      s"""SELECT doc_id, lang, source FROM documents
          WHERE $foldDoc % 100 < CASE $cases ELSE 0 END
          ORDER BY doc_id"""
    },
    "sp2_quota_sample" ->
      s"""SELECT lang, rk, doc_id FROM (
            SELECT lang, doc_id,
              ROW_NUMBER() OVER (PARTITION BY lang ORDER BY $foldDoc, doc_id) AS rk
            FROM documents)
          WHERE rk <= 20 ORDER BY lang, rk""",
    "sp3_train_split" ->
      s"""SELECT lang,
            CASE WHEN $foldDoc % 100 < 80 THEN 'train'
                 WHEN $foldDoc % 100 < 90 THEN 'valid'
                 ELSE 'test' END AS split,
            COUNT(*) AS n
          FROM documents GROUP BY 1, 2 ORDER BY lang, split""",
    "sp4_weighted_sample" ->
      s"""WITH m AS (SELECT MAX(n_chars) AS max_chars FROM documents)
          SELECT doc_id, lang, n_chars FROM documents, m
          WHERE $foldDoc % 10000 < (n_chars * 10000) // max_chars
          ORDER BY doc_id""",
    // the oracle checks the GK bracket booleans (and the group keys +
    // counts); `true` literals are the CONTRACT — a sketch whose
    // estimate leaves the exact p±3ε bracket hashes as `false` and
    // fails the gate
    "q2_approx_quantiles" ->
      """SELECT l_returnflag AS flag, COUNT(*) AS n,
           true AS ok50, true AS ok95, true AS ok99
         FROM lineitem GROUP BY 1 ORDER BY flag""",
    "sp7_mix_plan" -> {
      val cases = MixShares.toSeq.sortBy(_._1)
        .map { case (l, bp) => s"WHEN lang = '$l' THEN $bp" }.mkString(" ")
      s"""WITH agg AS (
            SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS avail_chars,
              CAST(CASE $cases ELSE 0 END AS BIGINT) AS share_bp
            FROM documents GROUP BY lang),
          t AS (
            SELECT lang, n_docs, avail_chars, share_bp,
              share_bp * 2000000 // 10000 AS target_chars
            FROM agg)
          SELECT lang, n_docs, avail_chars, target_chars,
            LEAST(10000, target_chars * 10000 // avail_chars) AS rate_bp,
            target_chars * 10000 // avail_chars AS epochs_bp
          FROM t ORDER BY lang"""
    },
    "sp8_temperature_mix" ->
      """WITH a AS (
           SELECT source, COUNT(*) AS n_docs,
             CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
               AS sq_micro
           FROM documents GROUP BY 1),
         t AS (
           SELECT source, n_docs, sq_micro,
             CAST(SUM(sq_micro) OVER () AS BIGINT) AS tot_sq,
             CAST(SUM(n_docs) OVER () AS BIGINT) AS tot_n
           FROM a)
         SELECT source, n_docs,
           sq_micro * 10000 // tot_sq AS share_bp,
           n_docs * 10000 // tot_n AS natural_bp,
           CASE WHEN n_docs * 10000 // tot_n = 0 THEN CAST(0 AS BIGINT)
             ELSE (sq_micro * 10000 // tot_sq) * 10000 // (n_docs * 10000 // tot_n)
             END AS boost_bp,
           (sq_micro * 10000 // tot_sq) * 500000 // 10000 AS target_docs
         FROM t ORDER BY source""",
    "sp6_corpus_shuffle" ->
      """SELECT ROW_NUMBER() OVER
            (ORDER BY (doc_id % 1000000007) * 654435747 % 1000000007, doc_id)
            AS pos, doc_id, lang
          FROM documents ORDER BY pos""",
    // textbook window spelling of the shard cut; the impl's bucketed
    // rank + rollup is the physical optimization, not a semantic one
    "sp9_shard_manifest" ->
      """WITH ranked AS (
           SELECT doc_id, n_chars,
             ROW_NUMBER() OVER
               (ORDER BY (doc_id % 1000000007) * 654435747 % 1000000007, doc_id)
               AS pos
           FROM documents)
         SELECT CAST((pos - 1) // 256 AS INT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(pos) AS pos_lo, MAX(pos) AS pos_hi,
           MIN_BY(doc_id, pos) AS first_doc_id
         FROM ranked GROUP BY 1 ORDER BY shard""",

    "sp10_bootstrap" ->
      """WITH reps AS (SELECT CAST(unnest(range(8)) AS INT) AS rep),
         draws AS (
           SELECT rep,
             (event_id * 2654435761 + rep * 97561) % 1048576 AS h,
             CAST(round(value * 1000) AS BIGINT) AS v_milli
           FROM events CROSS JOIN reps),
         wt AS (
           SELECT rep, v_milli,
             CASE WHEN h < 385750 THEN 0 WHEN h < 771499 THEN 1
                  WHEN h < 964374 THEN 2 WHEN h < 1028665 THEN 3
                  WHEN h < 1044738 THEN 4 WHEN h < 1047953 THEN 5
                  ELSE 6 END AS w
           FROM draws)
         SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * v_milli) AS BIGINT) AS wsum,
           CAST(SUM(w * v_milli) AS BIGINT) // CAST(SUM(w) AS BIGINT)
             AS mean_milli
         FROM wt GROUP BY rep ORDER BY rep""",
    "q1_group_quantiles" ->
      """SELECT l_returnflag AS flag,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS p25,
           ROUND(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity), 4) AS p50,
           ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 4) AS p75,
           ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_quantity), 4) AS p95
         FROM lineitem GROUP BY 1 ORDER BY flag""",
    // ×4 keeps quarter-fractions integral: quantile_cont's double path
    // is exact here (dyadic fraction × integer cents, inside the
    // mantissa), so round(·×4) is the same integer the engine computes
    // without ever leaving int64
    "q3_quartiles_cont" ->
      """WITH c AS (
           SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem)
         SELECT flag,
           CAST(round(quantile_cont(cents, 0.25) * 4) AS BIGINT) AS q1_x4,
           CAST(round(quantile_cont(cents, 0.50) * 4) AS BIGINT) AS q2_x4,
           CAST(round(quantile_cont(cents, 0.75) * 4) AS BIGINT) AS q3_x4,
           COUNT(*) AS n
         FROM c GROUP BY 1 ORDER BY flag"""
  )
}
