package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupQueries

/** Semantics evidence for the round-6 text operators: containment
  * must fire on a planted quote/extract pair (the case symmetric
  * Jaccard misses) and respect its guards; chunking must cover every
  * token with the declared size/stride geometry. */
class ContainmentAndChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val words = Seq(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega")

  private def text(ix: Seq[Int]): String = ix.map(i => words(i % words.size)).mkString(" ")

  test("d7 finds the planted containment pair, asymmetrically") {
    import spark.implicits._
    val quoted = text(0 until 30) // 30 tokens
    val container = quoted + " " + text((100 until 160).map(_ * 7)) // quote + 60 more
    val unrelated = text((200 until 240).map(_ * 13 + 5))
    val docs = Seq(
      (1L, quoted),
      (2L, container),
      (3L, unrelated)
    ).toDF("doc_id", "text")

    val pairs = DedupQueries.containmentPairs(docs).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("containment"))).toSeq

    // the quote is contained in the container → (1, 2) fires …
    assert(pairs.exists { case (a, b, c) => a == 1L && b == 2L && c >= 0.8 },
      s"planted containment not found: $pairs")
    // … but the container is NOT contained in the quote (asymmetry):
    // its fingerprint set is ~3× larger, so the reverse ratio is low
    assert(!pairs.exists { case (a, b, _) => a == 2L && b == 1L }, s"got $pairs")
    // the unrelated doc pairs with nothing
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L }, s"got $pairs")
  }

  test("d7 stop-fingerprint guard drops boilerplate-only pairs") {
    import spark.implicits._
    // 60 docs sharing ONE boilerplate sentence (its fingerprints hit
    // df=60 > cap) plus per-doc unique tails → no pair may survive on
    // boilerplate alone
    val boiler = text(0 until 12)
    val docs = (1L to 60L).map { i =>
      // tails are globally unique tokens — no cross-doc signal at all
      (i, boiler + " " + (0 until 12).map(k => s"u${i}x$k").mkString(" "))
    }.toDF("doc_id", "text")
    val pairs = DedupQueries.containmentPairs(docs, maxFpDf = 50).collect()
    assert(pairs.isEmpty, s"boilerplate produced ${pairs.length} pairs")
  }

  test("t14 chunking covers every token: 50-token chunks, stride 40, clamped tail") {
    val sf = "/root/testdata/sf0.001"
    val chunks = SparkEntry.queries("t14_chunking")(spark, sf)
    val tokens = SparkEntry.queries("t1_token_count")(spark, sf)
      .select(col("doc_id"), col("n_tokens"))

    val byDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("nchunks"),
        max("chunk_id").as("last_id"),
        min("chunk_len").as("min_len"),
        max("chunk_len").as("max_len"),
        sum(when(col("chunk_len") =!= 50, 1).otherwise(0)).as("n_short"))
      .join(tokens, "doc_id")
      .collect()

    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      val (nchunks, lastId, maxLen, nShort, n) =
        (r.getAs[Long]("nchunks"), r.getAs[Long]("last_id").toInt,
          r.getAs[Int]("max_len"), r.getAs[Long]("n_short"), r.getAs[Int]("n_tokens"))
      assert(lastId == nchunks - 1, s"chunk ids not dense: $r")
      assert(maxLen <= 50, s"oversized chunk: $r")
      // only the tail chunk may be short
      assert(nShort <= 1, s"more than one short chunk: $r")
      if (n <= 50) assert(nchunks == 1 && maxLen == n, s"short doc not passthrough: $r")
      else {
        // the tail chunk starts at 40·lastId and is clamped to the end:
        // coverage is exact iff its length is n − 40·lastId ∈ [1, 50],
        // and no earlier start would have been the true last chunk
        val tailLen = n - 40 * lastId
        assert(tailLen >= 1 && tailLen <= 50, s"tail misses the end: $r")
        assert(r.getAs[Int]("min_len") == math.min(50, tailLen), s"unexpected short chunk: $r")
      }
    }
  }
}
