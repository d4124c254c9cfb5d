package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupQueries, Multimodal, SimilarityQueries, TextQueries}

/** Semantics tests for the training-data pipeline operators (dedup,
  * similarity, text analysis, multimodal plumbing). */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("LSH candidate generation recalls every direct-threshold near-dup pair") {
    val direct = DedupQueries.queries("d2_jaccard_pairs")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.queries("d3_minhash_lsh")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct.nonEmpty, "corpus should contain planted near-dup pairs")
    // banding is probabilistic-by-construction but deterministic given
    // the hash family; with 4 bands × 2 rows at j≥0.8, recall here is
    // total — assert it so a hash regression is caught
    assert(direct == lsh, s"LSH missed: ${direct -- lsh}, extra: ${lsh -- direct}")
  }

  test("d12 simhash lookup equals a brute-force hamming scan") {
    import graft.functions.HashExprs.{char_fold_array, simhash16, tokenize}
    // the neighbor-expansion equi-join must be EXACT: replicate the
    // seed×corpus hamming scan in-process and compare per-seed
    // (n_near, best_doc, best_hamming)
    val sims = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), char_fold_array(tokenize(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), simhash16(col("hs")).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = sims.filter(_._1 < 2000).flatMap { case (sid, ss) =>
      val hits = sims.collect {
        case (did, ds) if did != sid && java.lang.Long.bitCount(ss ^ ds) <= 3 =>
          (java.lang.Long.bitCount(ss ^ ds).toLong, did)
      }
      if (hits.isEmpty) None
      else {
        val bk = hits.map { case (h, did) => h * 100000000L + did }.min
        Some(sid -> ((hits.size.toLong, bk % 100000000L, bk / 100000000L)))
      }
    }.toMap
    assert(expected.nonEmpty, "test corpus must contain seed near-dups")
    val got = DedupQueries.queries("d12_simhash_lookup")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("cosine top-k is k rows per query, ranked descending") {
    val rows = SimilarityQueries.queries("s1_cosine_topk")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 5)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val cosines = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh ann buckets: every reported pair shares a bucket and rerank is top-1") {
    val rows = SimilarityQueries.queries("s2_lsh_ann")(spark, sf).collect()
    val perQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(perQ.values.forall(_.length == 1))
  }

  test("token counts match text lengths") {
    val bad = TextQueries.queries("t1_token_count")(spark, sf)
      .filter(col("n_tokens") < 1 || col("n_distinct") > col("n_tokens"))
      .count()
    assert(bad == 0)
  }

  test("quality score is bounded [0,1]") {
    val bad = TextQueries.queries("t2_quality_score")(spark, sf)
      .filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
  }

  test("fingerprints are stable and mostly distinct") {
    val fp = TextQueries.queries("t4_fingerprint")(spark, sf)
    val n = fp.count()
    val distinct = fp.select("fingerprint").distinct().count()
    assert(distinct >= n - 5, s"$distinct distinct fingerprints of $n docs")
  }

  test("multimodal: decode is partition-local, batched, deterministic; " +
    "undecodable payloads yield typed zero rows") {
    val media = Multimodal.asMedia(spark, sf)
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(media, batchSize = 16)
    val rows = feats.collect()
    assert(rows.length == media.count())
    val again = Multimodal.extractFeatures(media, batchSize = 7).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted),
      "features must be independent of batch size")
    // asMedia payloads are raw text bytes — no decodable container, so
    // the features must be the typed "undecodable" row (zero dims,
    // zero brightness, declared mime kept), never fabricated numbers
    val undecodable = rows.filter(_.getAs[Int]("width") == 0)
    assert(undecodable.length == rows.length,
      "text payloads must all be undecodable")
    undecodable.foreach { r =>
      assert(r.getAs[Int]("height") == 0 && r.getAs[Int]("n_frames") == 0)
      assert(r.getAs[Double]("brightness") == 0.0)
      assert(r.getAs[String]("mime").startsWith("image/fake"))
    }
  }
}
