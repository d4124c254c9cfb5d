package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashExprs.bpe_merge_step
import graft.operators.Bpe

/** BPE training: equality with an independent in-memory reference
  * implementation (merge table AND final vocabulary), the pinned
  * tie-break, left-greedy overlap semantics of the compiled merge
  * step, and partitioning invariance of the whole training loop. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Straightforward reference BPE on Map[word → freq]. */
  private def referenceBpe(vocab: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Long]) = {
    var words: Map[Vector[String], Long] =
      vocab.map { case (w, f) => w.map(_.toString).toVector -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), sup) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r, sup))
        words = words.groupMapReduce { case (syms, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        } { case (_, f) => f }(_ + _)
      }
    }
    val outVocab = scala.collection.mutable.Map.empty[String, Long]
    for ((syms, f) <- words; s <- syms)
      outVocab(s) = outVocab.getOrElse(s, 0L) + f
    (merges.toSeq, outVocab.toMap)
  }

  private val classic = Map( // Sennrich et al.'s running example shape
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("merge table and final vocabulary match the reference implementation") {
    import spark.implicits._
    val vocabDf = classic.toSeq.toDF("word", "freq")
    val (merges, outVocab) = Bpe.train(vocabDf, rounds = 8)
    val (refMerges, refVocab) = referenceBpe(classic, rounds = 8)
    assert(merges.map(m => (m.left, m.right, m.support)) == refMerges)
    val got = outVocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refVocab)
    // the classic first merge: ('e','s') with support 9 (newest+widest)
    assert((merges.head.left, merges.head.right, merges.head.support) == ("e", "s", 9L))
  }

  test("tie-break is (support desc, left asc, right asc) — deterministic") {
    import spark.implicits._
    // "ab" and "ba" pairs tie at support 3: ('a','b') must win lexically
    val vocab = Seq(("ab", 3L), ("ba", 3L)).toDF("word", "freq")
    val (merges, _) = Bpe.train(vocab, rounds = 1)
    assert(merges.map(m => (m.left, m.right, m.support)) == Seq(("a", "b", 3L)))
  }

  test("compiled merge step is left-greedy and non-overlapping") {
    import spark.implicits._
    val out = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("b", "a", "a"))
      .toDF("syms")
      .select(bpe_merge_step(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(List("aa", "a"), List("aa", "aa"), List("b", "aa")))
  }

  test("training is invariant to input partitioning") {
    import spark.implicits._
    val vocab = (1 to 200)
      .map(i => (s"w${i % 37}x${i % 11}", (i % 7 + 1).toLong))
      .toDF("word", "freq")
      .groupBy("word").agg(sum("freq").as("freq"))
    val (m1, _) = Bpe.train(vocab.repartition(1), rounds = 5)
    val (m8, _) = Bpe.train(vocab.repartition(8), rounds = 5)
    assert(m1 == m8)
  }

  test("trains from a raw corpus and stops early when pairs are exhausted") {
    import spark.implicits._
    val docs = Seq("aa aa ab", "aa b").toDF("text")
    val (merges, outVocab) = Bpe.trainOnCorpus(docs, "text", rounds = 50)
    // tiny corpus exhausts all adjacent pairs well before 50 rounds
    assert(merges.nonEmpty && merges.length < 50)
    // final vocabulary must reconstruct the corpus word mass
    val total = outVocab.agg(sum(length(col("token")) * col("freq")))
      .head().getLong(0)
    assert(total == "aaaaab".length + "aab".length)
  }
}
