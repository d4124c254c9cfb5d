package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashExprs._
import graft.functions.HashOps
import graft.operators.DedupQueries

/** The compiled hash/vector expressions must match their interpreted
  * higher-order-function spellings bit-for-bit — those spellings are
  * what the DuckDB oracle mirrors. */
class HashExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a lazy cat"),
      (3L, "completely different text with no overlap at all"),
      (4L, "x"),
      (5L, "")
    ).toDF("doc_id", "text")
  }

  private val toks = "filter(split(text, '\\\\s+'), x -> x != '')"

  test("char_fold equals the interpreted aggregate/ascii fold") {
    val got = docs.select(
      char_fold(col("text")).as("fast"),
      expr("aggregate(split(text, ''), 7L, (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)")
        .as("slow")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("tokenize equals filter(split(text, '\\s+'), non-empty)") {
    import spark.implicits._
    val tricky = Seq("  leading", "trailing  ", "a\tb\nc\r d", "", "   ",
      "one", "the quick  brownfox")
    val df = tricky.toDF("text")
    val rows = df.select(
      tokenize(col("text")).as("fast"),
      expr("filter(split(text, '\\\\s+'), x -> x != '')").as("slow")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("char_fold_array hashes each token like char_fold") {
    val row = docs.filter(col("doc_id") === 1)
      .select(char_fold_array(expr(toks)).as("hs"), expr(toks).as("ts"))
      .head()
    val hs = row.getSeq[Long](0)
    val ts = row.getSeq[String](1)
    assert(hs.length == ts.length)
    assert(hs == ts.map(t =>
      t.foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)))
  }

  test("shingle_hashes composes like the LEAD-window expression") {
    val hs = Seq(11L, 22L, 33L, 44L)
    def compose(a: Long, b: Long, c: Long) =
      ((a * 1000003 + b) % 1000000007 * 1000003 + c) % 1000000007
    import spark.implicits._
    val got = Seq(Tuple1(hs)).toDF("hs")
      .select(shingle_hashes(col("hs"), 3)).head().getSeq[Long](0)
    assert(got == Seq(compose(11, 22, 33), compose(22, 33, 44)))
    // shorter than n → empty, not a crash
    val short = Seq(Tuple1(Seq(1L, 2L))).toDF("hs")
      .select(shingle_hashes(col("hs"), 3)).head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("token_ngrams joins adjacent tokens with single spaces") {
    val got = docs.filter(col("doc_id") === 1)
      .select(token_ngrams(expr(toks), 2)).head().getSeq[String](0)
    assert(got.head == "the quick" && got.last == "lazy dog" && got.length == 8)
    assert(docs.filter(col("doc_id") === 5)
      .select(token_ngrams(expr(toks), 2)).head().getSeq[String](0).isEmpty)
  }

  test("dot_long matches the interpreted zip_with/aggregate dot") {
    import spark.implicits._
    val df = Seq((Seq(1L, -2L, 3L), Seq(4L, 5L, -6L))).toDF("a", "b")
    val r = df.select(
      dot_long(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("slow"))
      .head()
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == (4 - 10 - 18))
  }

  test("simhash16 equals the relational weighted-bit formulation") {
    val sig = docs.select(simhash16(char_fold_array(expr(toks))).as("s"))
      .collect().map(_.getLong(0))
    // relational mirror in plain Scala
    val expected = docs.select(col("doc_id"), expr(toks).as("ts"))
      .collect().map { r =>
        val hs = r.getSeq[String](1).map(t =>
          t.foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L))
        (0 until 16).map { b =>
          val s = hs.groupBy(identity).map { case (h, occ) =>
            occ.size.toLong * (((h >> b) & 1L) * 2 - 1)
          }.sum
          if (s > 0) 1L << b else 0L
        }.sum
      }
    assert(sig.toSeq == expected.toSeq)
  }

  test("simhash64 equals the relational derived-parity formulation") {
    val M = 1000000007L
    val sig = docs.select(simhash64(char_fold_array(expr(toks))).as("s"))
      .collect().map(_.getLong(0))
    val expected = docs.select(col("doc_id"), expr(toks).as("ts"))
      .collect().map { r =>
        val hs = r.getSeq[String](1).map(t =>
          t.foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % M))
        (0 until 64).map { b =>
          val s = hs.groupBy(identity).map { case (h, occ) =>
            occ.size.toLong * ((((h * (2L * b + 3) + b * 7919L + 1) % M) % 2) * 2 - 1)
          }.sum
          if (s > 0) 1L << b else 0L // b = 63 sets the sign bit — intended
        }.sum
      }
    assert(sig.toSeq == expected.toSeq)
  }

  test("simhash64 banding: hamming<=3 pairs always share a 16-bit band") {
    // pigeonhole invariant the d6 candidate join relies on, exercised
    // on signatures with planted bit flips (incl. around the sign bit)
    val base = 0x7A3F9C5E2D1B4680L
    val flips = Seq(Seq(0), Seq(15, 16), Seq(62, 63), Seq(1, 30, 63), Seq(17, 18, 19))
    flips.foreach { fs =>
      val other = fs.foldLeft(base)((acc, b) => acc ^ (1L << b))
      val shared = (0 until 4).exists(band =>
        ((base >>> (band * 16)) & 0xFFFFL) == ((other >>> (band * 16)) & 0xFFFFL))
      assert(java.lang.Long.bitCount(base ^ other) <= 3 && shared, s"flips=$fs")
    }
  }

  test("expressions participate in whole-stage codegen") {
    // must read a real source: a local Seq collapses to LocalTableScan
    // (ConvertToLocalRelation eager-evals projections). Keep
    // higher-order functions OUT of this projection — a HOF like
    // `filter(..., lambda)` is CodegenFallback and would break WSCG
    // for the stage regardless of these expressions.
    val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(char_fold(col("text")).as("f"),
        simhash16(char_fold_array(split(col("text"), "\\s+"))).as("s"))
    df.collect()
    // `*(n)` is the WholeStageCodegen region marker in plan toString
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [char_fold"), plan)
  }

  test("subword_count and count_in equal their interpreted spellings") {
    val rows = docs.select(
      subword_count(tokenize(col("text"))).as("sw_fast"),
      expr("aggregate(filter(split(text, '\\\\s+'), x -> x != ''), 0L, " +
        "(acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG))").as("sw_slow"),
      count_in(tokenize(col("text")), Seq("the", "a", "of", "and", "in")).as("st_fast"),
      expr("CAST(size(filter(filter(split(text, '\\\\s+'), x -> x != ''), " +
        "t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS LONG)").as("st_slow")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), r.toString)
      assert(r.getLong(2) == r.getLong(3), r.toString)
    }
  }

  test("winnow equals the interpreted sliding-window array_min") {
    import spark.implicits._
    val hs = Seq(9L, 3L, 7L, 7L, 1L, 8L, 2L)
    val df = Seq(Tuple1(hs)).toDF("hs")
    val fast = df.select(winnow(col("hs"), 4)).head().getSeq[Long](0)
    val slow = df.select(expr(
      "transform(sequence(0, size(hs) - 4), i -> array_min(slice(hs, i + 1, 4)))"))
      .head().getSeq[Long](0)
    assert(fast == slow && fast == Seq(3L, 1L, 1L, 1L))
    // window longer than the array → empty
    val short = Seq(Tuple1(Seq(5L, 6L))).toDF("hs")
      .select(winnow(col("hs"), 4)).head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("hyperplane_bucket equals the interpreted nested-aggregate bucket") {
    import spark.implicits._
    val v = Seq.tabulate(64)(i => ((i * 37) % 201 - 100).toLong)
    val df = Seq(Tuple1(v)).toDF("qv")
    val r = df.select(
      hyperplane_bucket(col("qv"), 6).as("fast"),
      expr(
        """aggregate(transform(sequence(0, 5), j ->
             CASE WHEN aggregate(zip_with(qv, sequence(0, 63),
                    (x, dd) -> x * ((j * 64 + dd) * 2654435761 % 97 - 48)),
                  0L, (a, p) -> a + p) > 0
               THEN CAST(power(2, j) AS LONG) ELSE 0L END),
           0L, (acc, b) -> acc + b)""").as("slow")).head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("HashOps.charFold handles supplementary code points like ascii()") {
    import spark.implicits._
    val df = Seq("aé水😀z").toDF("text") // é, 水, 😀
    val r = df.select(
      char_fold(col("text")).as("fast"),
      expr("aggregate(split(text, ''), 7L, (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)")
        .as("slow")).head()
    assert(r.getLong(0) == r.getLong(1))
  }
}

/** The d2 stop-shingle guard: a planted boilerplate shingle must not
  * explode the candidate join, and the guard must be inert when no
  * shingle exceeds the frequency cut. */
class DedupGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** (doc_id, shash) set: `n` docs all share hot shingle 999; each doc
    * has two private shingles. */
  private def planted(n: Int) = {
    import spark.implicits._
    (1 to n).flatMap { d =>
      Seq((d.toLong, 999L), (d.toLong, 10000L + d), (d.toLong, 20000L + d))
    }.toDF("doc_id", "shash")
  }

  test("hot shingle alone yields no pairs once guarded") {
    val sh = planted(200)
    // ungated: every doc pair is a candidate through shingle 999 →
    // 200*199/2 candidate pairs feed the jaccard stage
    val gated = DedupQueries.jaccardPairs(sh, 0.1, maxDocFreq = 50)
    assert(gated.count() == 0) // only-hot overlap carries no signal
  }

  test("guard is inert when no shingle exceeds the cut") {
    import spark.implicits._
    // two genuine near-dups sharing 2 of 3 shingles
    val sh = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 4L)
    ).toDF("doc_id", "shash")
    val strict = DedupQueries.jaccardPairs(sh, 0.4, maxDocFreq = 1000).collect()
    val loose = DedupQueries.jaccardPairs(sh, 0.4, maxDocFreq = 2).collect()
    assert(strict.toSeq == loose.toSeq)
    assert(strict.length == 1 && strict.head.getDouble(2) == 0.5)
  }

  test("connectedComponents clusters transitive chains to the min id") {
    import spark.implicits._
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,6}; singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("da", "db")
    val got = DedupQueries.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents survives a deep-diameter graph (checkpoint " +
    "stats pinned exact, no BigInteger planning overflow)") {
    import spark.implicits._
    // a 20 000-node PATH needs ~15 pointer-jump iterations; before the
    // exact-stats pin, each generation's localCheckpoint inherited the
    // optimizer's ESTIMATE, which compounds ~×4 per iteration and
    // overflows Spark's BigInteger size arithmetic at planning time
    // around iteration 13 (ArithmeticException — first hit by s8 on
    // the 10× embeddings corpus). The pinned invariant |labels|=|nodes|
    // keeps every generation's stats exact and flat.
    val n = 20000L
    val pairs = spark.range(n - 1)
      .select(col("id").as("da"), (col("id") + 1).as("db"))
    val labels = DedupQueries.connectedComponents(pairs)
    val agg = labels.agg(
      org.apache.spark.sql.functions.countDistinct("cluster_id"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.max("cluster_id")).collect().head
    assert(agg.getLong(0) == 1L, "one path = one component")
    assert(agg.getLong(1) == n)
    assert(agg.getLong(2) == 0L, "label = min node id")
  }

  test("connectedComponents on an empty pair graph returns empty (no NPE)") {
    import spark.implicits._
    // SUM over an empty frame is NULL — the monotone-sum convergence
    // check must coalesce it, or a dup-free corpus crashes d5
    val pairs = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(DedupQueries.connectedComponents(pairs).count() == 0)
  }

  test("bpe_encode_len equals size() of the per-round bpe_merge_step fold") {
    import spark.implicits._
    // adversarial symbol streams: overlapping merge targets, runs of
    // the left symbol, merges whose output feeds a later merge, and
    // boundary sentinels that must never merge
    val merges = Seq("a" -> "a", "b" -> "c", "a" -> "bc", "abc" -> "abc")
    val syms = Seq(
      Seq("a", "a", "a", "a", "a"),
      Seq("a", "b", "c", "a", "b", "c"),
      Seq("b", "c", "b", "c", "a", "b", "c"),
      Seq(" ", "a", "a", " ", "b", "c"),
      Seq.empty[String],
      Seq("a")).toDF("s0")
    val folded = merges.foldLeft(col("s0")) { case (c, (l, r)) =>
      bpe_merge_step(c, l, r)
    }
    val rows = syms
      .select(size(folded).cast("long").as("want"),
        bpe_encode_len(col("s0"), merges).as("got"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("dup_gram_chars slice keys match a naive string-gram replica") {
    import spark.implicits._
    // duplicated 5-gram ("x1 .. x5" twice), a longer duplicated run,
    // and near-miss grams differing only in one token
    val toks = Seq(
      (1L, "x1 x2 x3 x4 x5 q x1 x2 x3 x4 x5"),
      (2L, "a b c d e f g a b c d e f g a b c d e f g"),
      (3L, "p1 p2 p3 p4 p5 p1 p2 p3 p4 p6"))
      .toDF("doc_id", "text")
    def naive(text: String): Seq[Long] = {
      val ts = text.split("\\s+").filter(_.nonEmpty)
      (5 to 10).map { n =>
        val grams = ts.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq
        grams.groupBy(identity).collect {
          case (g, occ) if occ.size >= 2 => occ.size.toLong * g.length
        }.sum
      }
    }
    val got = toks
      .select(col("doc_id"), col("text"),
        dup_gram_chars(tokenize(col("text"))).as("dg"))
      .collect()
      .map(r => r.getString(1) -> r.getSeq[Long](2).toSeq)
    got.foreach { case (text, dg) => assert(dg == naive(text), text) }
  }

  test("guarded join prunes the hot key's fan-out in the plan input") {
    val sh = planted(100)
    // with the guard, the self-join input no longer contains shingle
    // 999 — candidate volume is linear in docs, not quadratic
    val pruned = sh
      .join(org.apache.spark.sql.functions.broadcast(
        sh.groupBy("shash").count().filter(col("count") > 50).select("shash")),
        Seq("shash"), "left_anti")
    assert(pruned.filter(col("shash") === 999).count() == 0)
    assert(pruned.count() == 200)
  }
}
