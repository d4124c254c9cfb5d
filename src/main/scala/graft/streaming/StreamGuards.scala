package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExprs.{alpha_token_count, char_fold_array, dup_elem_stats, dup_gram_chars, line_shape_stats, shingle_hashes, token_ngrams, tokenize, top_grams}
import graft.operators.TextQueries

/** Stateless per-document guards for a streaming ingest pipeline —
  * the map-side filters that must run BEFORE any stateful stage
  * (dedup, windowing) because they are pure row functions: admitting
  * then retracting a contaminated document would poison downstream
  * state.
  *
  * Benchmark decontamination (the streaming face of c2): a document is
  * dropped when it shares ≥ `minHits` distinct n-token shingles with
  * the held-out benchmark set. The benchmark's shingle hashes are a
  * BOUNDED static set by definition, so they ride inside the plan and
  * the whole guard is one in-row expression — no shuffle, no state, no
  * stream-static join to re-plan per micro-batch; throughput is scan
  * speed. At benchmark sizes where the literal array gets unwieldy
  * (≳10⁶ shingles), the same shape swaps the exact set for
  * `bloom_build`/`bloom_probe` (functions/BloomFilter): zero false
  * negatives means no contamination slips through; false positives
  * drop a few clean docs — the safe direction.
  */
object StreamGuards {

  /** Distinct shingle hashes of a static benchmark corpus, collected
    * to ride in-plan. Driver-side collect is intentional and bounded:
    * this runs ONCE at stream start over the (small) benchmark set,
    * never per batch and never over the corpus. */
  def benchmarkShingles(bench: DataFrame, n: Int = 3): Array[Long] =
    bench
      .select(explode(shingle_hashes(char_fold_array(tokenize(col("text"))), n))
        .as("shash"))
      .distinct()
      .collect().map(_.getLong(0)).sorted

  /** Number of distinct shingles of `text` present in the benchmark
    * set — the same count c2 computes relationally, as one compiled
    * in-row expression. */
  def benchHits(text: Column, benchShingles: Array[Long], n: Int = 3): Column =
    size(array_intersect(
      array_distinct(shingle_hashes(char_fold_array(tokenize(text)), n)),
      typedlit(benchShingles.toSeq)))

  /** Streaming-safe decontamination filter: keep documents with fewer
    * than `minHits` benchmark shingle hits. Works identically on batch
    * and streaming frames (stateless projection + filter). */
  def decontaminated(
      docs: DataFrame,
      benchShingles: Array[Long],
      minHits: Int = 3,
      n: Int = 3): DataFrame =
    docs.filter(benchHits(col("text"), benchShingles, n) < minHits)

  /** Streaming HTML gate — the ingest face of t29/`CorpusPipeline.
    * htmlGate`: drop boilerplate documents and replace `text` with the
    * extracted clean form BEFORE any stateful stage (packing, dedup,
    * windowed aggregation), so markup never enters downstream state.
    * The whole gate is a stateless compiled-regex projection + filter
    * (the same one definition the batch funnel runs —
    * [[graft.operators.TextQueries.htmlLabel]]/[[graft.operators.TextQueries.htmlClean]]),
    * so stream and batch labels agree row for row and throughput is
    * scan speed: no shuffle, no state, nothing to re-plan per
    * micro-batch. */
  def htmlGated(docs: DataFrame): DataFrame =
    graft.operators.CorpusPipeline.htmlGate(docs)

  /** Streaming URL gate — crawl stage 0 on the INGEST path, before
    * even the HTML gate: canonicalize the raw URL column
    * ([[graft.operators.TextQueries.urlCanonical]] — the t30/d14
    * normalize), attach `url_canon` + `domain`, and drop blocklisted
    * domains so their bytes never enter downstream state. Stateless
    * projection + filter, batch/stream identical. URL-EXACT dedup is
    * stateful by nature: on a stream spell it
    * `gated.withWatermark(...).dropDuplicates("url_canon")` (Spark's
    * own keyed-state dedup, state bounded by the watermark); the
    * batch/cadence spelling is d14's hash-groupBy. */
  def urlGated(
      docs: DataFrame,
      blocklist: Seq[String],
      urlCol: String = "url"): DataFrame =
    docs
      .withColumn("url_canon",
        graft.operators.TextQueries.urlCanonical(col(urlCol)))
      .withColumn("domain",
        graft.operators.TextQueries.urlDomain(col(urlCol)))
      // unparseable URLs carry NULL canon/domain: they PASS the gate
      // (they can't match a blocklist and must not pool together) and
      // a downstream dropDuplicates("url_canon") must exclude null —
      // null-keyed state would dedup all malformed docs as one
      .filter(col("domain").isNull || !col("domain").isin(blocklist: _*))

  /** Streaming quality gate — the t2/t16/t31 quality-and-repetition
    * class as ONE stateless projection + filter, the last guard of the
    * composed ingest order (urlGated → htmlGated → decontaminated →
    * qualityGated → stateful stages). A document is kept when ALL of:
    *
    *  - t2's floor rules: ≥ `minTokens` whitespace tokens and lexical
    *    diversity (distinct/total) ≥ `minDiversityBp` basis points;
    *  - t16's repetition rule: duplicate-bigram occurrence ratio at or
    *    under the 20% flag line (spelled multiplication-only — exact
    *    integers, no double rounding);
    *  - t31's Gopher rule: no top n-gram (n = 2/3/4) whose character
    *    coverage exceeds [[TextQueries.GopherTopGramBp]] — the
    *    compiled `top_grams` reducer makes this an in-row probe
    *    (`10000·cnt·len ≥ chars·(bp+1)` ⇔ the query's floor-div
    *    `> bp`, so gate and t31 report can never disagree); before
    *    the reducer respell this signal cost two global shuffles and
    *    could not ride an ingest stream at all.
    *
    * Pure row functions over each document: no shuffle, no state,
    * nothing to re-plan per micro-batch — batch and stream agree row
    * for row, and throughput is scan speed. */
  def qualityGated(
      docs: DataFrame,
      minTokens: Int = 10,
      minDiversityBp: Long = 3000L): DataFrame = {
    val toks = tokenize(col("text"))
    val nToks = size(toks).cast("long")
    val nDist = size(array_distinct(toks)).cast("long")
    val bgs = token_ngrams(toks, 2)
    val nBg = size(bgs).cast("long")
    val nBgDist = size(array_distinct(bgs)).cast("long")
    val nChars = length(col("text")).cast("long")
    val topGramFlag = exists(top_grams(toks), g =>
      lit(10000L) * g("cnt") * length(g("gram")).cast("long") >=
        nChars * (when(g("n") === 2, lit(TextQueries.GopherTopGramBp(2) + 1))
          .when(g("n") === 3, lit(TextQueries.GopherTopGramBp(3) + 1))
          .otherwise(lit(TextQueries.GopherTopGramBp(4) + 1))))
    docs.filter(
      nToks >= minTokens &&
        nDist * lit(10000L) >= nToks * lit(minDiversityBp) &&
        !((nBg - nBgDist) * lit(10000L) > nBg * lit(2000L)) &&
        !topGramFlag)
  }

  /** Full-Gopher streaming gate — the t32 duplicate-fraction rules and
    * t33 quality rules over each document's OWN text, as one stateless
    * projection + filter (compose after [[qualityGated]] for the
    * complete Rae et al. Table A1). Every comparison is the
    * multiplication-only spelling of the queries' floor-div basis
    * points (`x DIV c > t ⇔ x ≥ c·(t+1)`), so the gate can never
    * disagree with the t32/t33 reports on the same text. All per-doc
    * compiled reducers — no shuffle, no state, batch == stream. Docs
    * with no usable denominator (no tokens / no non-empty lines) are
    * DROPPED: an empty document is not trainable text. */
  def gopherGated(docs: DataFrame): DataFrame = {
    val toks = tokenize(col("text"))
    val nChars = length(col("text")).cast("long")
    val dg = dup_gram_chars(toks)
    val ls = dup_elem_stats(split(col("text"), "\n"))
    val ps = dup_elem_stats(split(col("text"), "\n\n"))
    val lsh = line_shape_stats(split(col("text"), "\n"))
    val nWords = size(toks).cast("long")
    val nLines = ls(0)
    val tokChars = aggregate(toks, lit(0L), (a, x) => a + length(x).cast("long"))
    val nHash = (length(col("text")) -
      length(expr("replace(text, '#', '')"))).cast("long")
    val nEllSym = expr(
      "CAST((length(text) - length(replace(text, '...', ''))) DIV 3 AS BIGINT)")
    def over(x: Column, c: Column, bp: Long): Column =
      x * lit(10000L) >= c * lit(bp + 1L)
    val t32Flag =
      over(ls(1), ls(0), TextQueries.GopherDupLineBp) ||
        over(ps(1), ps(0), TextQueries.GopherDupParaBp) ||
        over(ls(2), nChars, TextQueries.GopherDupLineCharBp) ||
        over(ps(2), nChars, TextQueries.GopherDupParaCharBp) ||
        (5 to 10).map(n =>
          over(dg(n - 5), nChars, TextQueries.GopherDupGramBp(n)))
          .reduce(_ || _)
    val t33Flag =
      nWords < TextQueries.GopherMinWords ||
        nWords > TextQueries.GopherMaxWords ||
        tokChars * lit(100L) < nWords * lit(TextQueries.GopherMinMeanWlenC100) ||
        tokChars * lit(100L) >=
          nWords * lit(TextQueries.GopherMaxMeanWlenC100 + 1L) ||
        over(nHash + nEllSym, nWords, TextQueries.GopherSymbolBp) ||
        over(lsh(1), nLines, TextQueries.GopherBulletLineBp) ||
        over(lsh(2), nLines, TextQueries.GopherEllipsisLineBp) ||
        alpha_token_count(toks) * lit(10000L) <
          nWords * lit(TextQueries.GopherAlphaWordBp) ||
        size(array_intersect(array_distinct(toks),
          typedLit(TextQueries.GopherStopWords))).cast("long") <
          lit(TextQueries.GopherMinStopHits)
    docs.filter(nWords > 0L && nLines > 0L && !t32Flag && !t33Flag)
  }

  /** Streaming temperature-mix gate — applies a PRECOMPUTED rate
    * table ([[graft.operators.CorpusPipeline.mixRates]], refreshed by
    * a batch cadence the way the IVF/BM25 sidecars are) to an ingest
    * stream: a stream-static broadcast equi-join on the stratum column
    * attaches `rate_ppm`, and the keep decision is the same salted
    * squared-fold residue as the batch sampler, so a document's fate
    * is identical whether it arrives by batch or by stream. Stateless
    * beyond the static side: no watermark, no state store. Rates
    * derived from a PAST corpus snapshot applied to future arrivals is
    * exactly CCNet/XLM-R practice — mixing ratios are a training-run
    * constant, not a per-batch estimate. */
  def mixSampled(docs: DataFrame, rates: DataFrame, strataCol: String): DataFrame = {
    val f = graft.functions.HashExprs.char_fold(
      concat(lit(graft.operators.CorpusPipeline.MixSalt),
        col("doc_id").cast("string")))
    docs.join(broadcast(rates.select(col(strataCol), col("rate_ppm"))),
        Seq(strataCol))
      .filter(f * f % 1000000007L % 1000000L < col("rate_ppm"))
      .drop("rate_ppm")
  }

  /** Streaming CCNet quality gate — scores each arriving document
    * with the PRECOMPUTED reference LM
    * ([[graft.operators.TextQueries.ccnetModel]], map form, broadcast
    * via a stream-static equi-join on `lang`) and drops the `tail`
    * bucket. The score is a pure in-row lookup chain over the
    * document's own bigrams plus the same sorted-fold sum as the t35
    * report, so gate scores equal report scores bit for bit and the
    * stream needs NO per-doc aggregation state — the shuffle-free
    * spelling the relational t35 plan can't use (its probabilities
    * come from joins). Documents with no bigram (< 2 tokens) drop:
    * unscorable is untrainable. Output gains `lm_ppm` + `bucket`. */
  def ccnetBucketed(docs: DataFrame, model: DataFrame): DataFrame = {
    val bgs = token_ngrams(tokenize(col("text")), 2)
    docs.join(broadcast(model), Seq("lang"))
      .withColumn("__ps", sort_array(transform(bgs, b =>
        coalesce(element_at(col("bigram_p"), b),
          element_at(col("w1_p"), substring_index(b, " ", 1)),
          col("p_default")))))
      .withColumn("__n", size(col("__ps")).cast("long"))
      .withColumn("lm_ppm", round(lit(1000000.0) *
        aggregate(col("__ps"), lit(0.0), (a, x) => a + x) /
        col("__n").cast("double"), 4))
      .withColumn("bucket",
        when(col("lm_ppm") >= TextQueries.CcnetHeadPpm, "head")
          .when(col("lm_ppm") >= TextQueries.CcnetMiddlePpm, "middle")
          .otherwise("tail"))
      .filter(col("__n") > 0 && col("bucket") =!= "tail")
      .drop("bigram_p", "w1_p", "p_default", "__ps", "__n")
  }

  /** C4 streaming gate (Raffel et al. §2.2 — t34's rules as a
    * stateless ingest TRANSFORM that rebuilds `text` from the kept
    * lines and drops flagged pages). One definition for batch and
    * stream ([[graft.operators.CorpusPipeline.c4Gate]] — the same
    * compiled reducer and sentence-count regex as the t34 report, so
    * gate and report can never disagree). Pure row functions: no
    * shuffle, no state, batch == stream, throughput is scan speed.
    * The natural slot is an ALTERNATIVE to the Gopher pair
    * ([[qualityGated]] → [[gopherGated]]) — C4 and Gopher are the two
    * published cleaning recipes, not stages of one. */
  def c4Gated(docs: DataFrame): DataFrame =
    graft.operators.CorpusPipeline.c4Gate(docs)
}
