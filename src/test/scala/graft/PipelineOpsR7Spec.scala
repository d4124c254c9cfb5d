package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the round-7 pipeline operators — each
  * pinned by something other than the DuckDB oracle it also has:
  *
  *  - d9  duplicate down-weighting: cluster weight-mass ≈ 1
  *  - c3  leakage-safe split: no near-dup cluster straddles splits
  *  - sp6 corpus shuffle: exact permutation, replay-stable
  *  - t18 BPE pre-tokens: agrees with a driver-side Java-regex count
  *  - s9  ANN recall: bounded, consistent with its own counters
  */
class PipelineOpsR7Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("d9: every cluster carries one document-equivalent of weight") {
    val rows = SparkEntry.queries("d9_dup_weights")(spark, sf).collect()
    val docs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.length == docs, "one weight row per document")
    // group by cluster: n_members consistent, weight = round(1/n, 4)
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      val n = members.head.getLong(2)
      assert(members.forall(_.getLong(2) == n), s"cluster $cid sizes agree")
      assert(members.length == n, s"cluster $cid membership count = n_members")
      val w = math.rint(10000.0 / n) / 10000.0
      assert(members.forall(_.getDouble(3) == w), s"cluster $cid weight 1/$n")
    }
    val unclustered = rows.filter(r => r.getLong(0) == r.getLong(1) && r.getLong(2) == 1)
    assert(unclustered.forall(_.getDouble(3) == 1.0))
  }

  test("c3: split is constant within every near-dup cluster") {
    val assigned = graft.operators.CorpusPipeline.leakageSafeSplit(spark, sf).collect()
    val docs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(assigned.length == docs)
    // the leakage invariant: one split per split_key
    assigned.groupBy(_.getLong(2)).foreach { case (key, members) =>
      assert(members.map(_.getString(3)).distinct.length == 1,
        s"cluster $key must not straddle splits")
    }
    // clustered docs exist at this SF (planted near-dups) and share keys
    assert(assigned.groupBy(_.getLong(2)).exists(_._2.length > 1),
      "at least one multi-doc cluster shares a split key")
    assert(assigned.map(_.getString(3)).toSet.subsetOf(Set("train", "valid", "test")))
  }

  test("sp6: a replay-stable exact permutation of the corpus") {
    val a = SparkEntry.queries("sp6_corpus_shuffle")(spark, sf).collect()
    val n = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(a.length == n)
    assert(a.map(_.getLong(0)).toSeq == (1L to n).toSeq, "pos is 1..N in order")
    assert(a.map(_.getLong(1)).distinct.length == n, "every doc exactly once")
    // replay: identical output on a second run (pure function of keys)
    val b = SparkEntry.queries("sp6_corpus_shuffle")(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // and the permutation actually shuffles: not the identity order
    assert(a.take(100).map(_.getLong(1)).toSeq != a.take(100).map(_.getLong(1)).sorted.toSeq)
  }

  test("t18: matches a driver-side Java-regex recount") {
    val re = graft.operators.TextQueries.BpePretokenRe.r
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("lang", "text").collect()
    val expected = docs.groupBy(_.getString(0)).map { case (lang, g) =>
      val counts = g.map(r => re.findAllIn(r.getString(1)).size.toLong)
      (lang, g.length.toLong, counts.sum,
        math.rint(counts.sum.toDouble / g.length * 10000) / 10000)
    }
    val got = SparkEntry.queries("t18_bpe_pretokens")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == expected.toSet)
  }

  test("c4: contamination expands through near-dup clusters") {
    import spark.implicits._
    val tail = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (0L, "q1 q2 q3 q4 q5 q6"),          // benchmark doc
      (20L, s"q1 q2 q3 q4 q5 q6 $tail"),  // direct hit: shares 4 bench shingles
      (21L, s"x1 x2 $tail"),              // near-dup of 20 (shared tail), 0 bench shingles
      (22L, (1 to 20).map(i => s"z$i").mkString(" ")) // clean
    ).toDF("doc_id", "text")
    val got = graft.operators.CorpusPipeline.contaminationClusters(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(20L -> "direct", 21L -> "cluster"),
      s"doc 21 must be dropped via its cluster, doc 22 kept: $got")
  }

  test("c5: funnel counts are monotone non-increasing") {
    val stages = SparkEntry.queries("c5_filter_funnel")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(stages.map(_._1).toSeq ==
      Seq("0_total", "1_exact_dedup", "2_quality", "3_near_dup"))
    val ns = stages.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"funnel must only shrink: ${ns.mkString(",")}")
    // final stage must agree with c1's surviving row count
    val c1 = SparkEntry.queries("c1_corpus_clean")(spark, sf).count()
    assert(ns.last == c1, "funnel tail = c1 survivors")
  }

  test("sp7: plan arithmetic is exact and covers every stratum") {
    val rows = SparkEntry.queries("sp7_mix_plan")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet ==
      graft.operators.SamplingQueries.MixShares.keySet)
    rows.foreach { r =>
      val (lang, avail, target) = (r.getString(0), r.getLong(2), r.getLong(3))
      val (rate, epochs) = (r.getLong(4), r.getLong(5))
      assert(target == graft.operators.SamplingQueries.MixShares(lang) * 2000000L / 10000L)
      assert(epochs == target * 10000L / avail, s"$lang epochs")
      assert(rate == math.min(10000L, epochs), s"$lang rate cap")
    }
  }

  test("d10: every reported span truly recurs, verbatim, in ≥2 docs") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq)
    // driver-side ground truth: distinct (doc, 5-token span)
    val byDocSpans = docs.map { case (id, ts) =>
      id -> ts.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }
    val df = collection.mutable.Map.empty[String, (Long, Long)] // span -> (count, firstDoc)
    byDocSpans.foreach { case (id, spans) =>
      spans.foreach { sp =>
        val (c, f) = df.getOrElse(sp, (0L, Long.MaxValue))
        df(sp) = (c + 1, math.min(f, id))
      }
    }
    val got = SparkEntry.queries("d10_repeated_spans")(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { r =>
      val (span, n, first) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (c, f) = df(span)
      assert(c == n, s"span '$span' claimed in $n docs, truly $c")
      assert(f == first, s"span '$span' first doc")
      assert(n >= 2)
    }
    // the cut keeps the max-df spans: no excluded span may beat the
    // included minimum
    val minKept = got.map(_.getLong(1)).min
    val excludedMax = df.filterNot { case (sp, _) => got.exists(_.getString(0) == sp) }
      .values.map(_._1).maxOption.getOrElse(0L)
    assert(excludedMax <= minKept || got.length < 50,
      "an excluded span out-ranks a kept one")
  }

  test("t19: matches a driver-side vocabulary recount") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val vocab = collection.mutable.Map.empty[String, Long]
    docs.foreach(_.split("\\s+").filter(_.nonEmpty)
      .foreach(w => vocab(w) = vocab.getOrElse(w, 0L) + 1))
    val pairFreq = collection.mutable.Map.empty[String, Long]
    // driver recount slices by CODEPOINTS to match both engines
    vocab.foreach { case (w, wf) =>
      val cps = w.codePoints().toArray
      if (cps.length >= 2)
        cps.sliding(2).foreach { p =>
          val pair = new String(p, 0, 2)
          pairFreq(pair) = pairFreq.getOrElse(pair, 0L) + wf
        }
    }
    val expected = pairFreq.toSeq.sortBy { case (p, f) => (-f, p) }.take(20)
    val got = SparkEntry.queries("t19_bpe_merge_candidates")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("s10: codebook vectors quantize to themselves with zero error") {
    val rows = SparkEntry.queries("s10_pq_codes")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(rows.length == n, "one code per vector")
    // each code digit ∈ [0,4): code < 4^8; errors non-negative
    assert(rows.forall { case (_, code, err) => code >= 0 && code < 65536 && err >= 0 })
    // a centroid-source vector's every sub-vector is its own centroid:
    // digit = k in all 8 subspaces (code = k·Σ4^m = k·21845), err = 0
    (0L until 4L).foreach { k =>
      val (_, code, err) = rows(k.toInt)
      assert(err == 0, s"centroid vector $k reconstruction error")
      assert(code == k * 21845L, s"centroid vector $k code")
    }
    // compression is non-trivial: codes are not all identical
    assert(rows.map(_._2).distinct.length > 1)
  }

  test("s11: ADC serves 5 ranked candidates per query, distances monotone") {
    val rows = SparkEntry.queries("s11_pq_adc_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 5).toSeq, "dense ranks")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        "adist non-decreasing in rank")
      assert(sorted.forall(_._3 >= 5L), "targets only")
    }
  }

  test("s9: recall counters are self-consistent; multi-probe dominates") {
    val r = SparkEntry.queries("s9_ann_recall")(spark, sf).collect()
    assert(r.length == 1)
    val nq = r(0).getLong(0)
    val (h1, rec1) = (r(0).getLong(1), r(0).getDouble(2))
    val (hm, recm) = (r(0).getLong(3), r(0).getDouble(4))
    assert(nq == 50, "one ground-truth row per sampled query")
    assert(h1 >= 0 && h1 <= nq && hm >= 0 && hm <= nq)
    assert(rec1 == math.rint(h1.toDouble / nq * 10000) / 10000)
    assert(recm == math.rint(hm.toDouble / nq * 10000) / 10000)
    // the 1-probe candidate set is a subset of the multi-probe set,
    // but top-1 within a SUPERSET can only match ground truth at
    // least as often (brute top-1 ∈ probed set ⇒ it wins the rerank)
    assert(hm >= h1, s"multi-probe recall ($hm) below 1-probe ($h1)")
    // on this corpus 1-probe is known-coarse (6 planes ⇒ per-plane
    // agreement^6); multi-probe must find SOMETHING
    assert(hm > 0, "multi-probe found no true neighbors at all")
  }
}
