package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupQueries, TextQueries}

/** Planted-URL gates for the crawl stage-0 family (t30/d14/d15):
  * every documented canonicalization rule on a hand-built URL, the
  * identity-preserving non-rules, and the dedup/gate behavior over a
  * planted corpus with known collision structure. */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(TextQueries.urlCanonical(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("each canonicalization rule fires on a planted URL") {
    val cases = Seq(
      // scheme+host lowercase, http→https
      "HTTP://Ex.COM/a" -> "https://ex.com/a",
      // www strip
      "https://www.ex.com/a" -> "https://ex.com/a",
      // default ports strip; non-default survives
      "http://ex.com:80/a" -> "https://ex.com/a",
      "https://ex.com:443/a" -> "https://ex.com/a",
      "https://ex.com:8443/a" -> "https://ex.com:8443/a",
      // fragment drop
      "https://ex.com/a#frag" -> "https://ex.com/a",
      // trailing slash strip (root path collapses to bare host)
      "https://ex.com/a/b///" -> "https://ex.com/a/b",
      "https://ex.com/" -> "https://ex.com",
      // tracking params drop, survivors SORT; ?-only / all-tracking
      // queries vanish whole
      "https://ex.com/a?utm_source=x&id=1&utm_medium=y" -> "https://ex.com/a?id=1",
      "https://ex.com/a?b=2&a=1" -> "https://ex.com/a?a=1&b=2",
      "https://ex.com/a?gclid=z" -> "https://ex.com/a",
      "https://ex.com/a?" -> "https://ex.com/a",
      // anchored tracking match: referrer= and UTM_SOURCE= are NOT
      // the tracking spellings and survive (params case-sensitive)
      "https://ex.com/a?referrer=b&ref=c" -> "https://ex.com/a?referrer=b",
      "https://ex.com/a?UTM_SOURCE=x" -> "https://ex.com/a?UTM_SOURCE=x",
      // path case is identity
      "https://ex.com/Docs/A" -> "https://ex.com/Docs/A",
      // fragment before a '#'-suffixed query stays dropped (query
      // regex must not read past the fragment)
      "https://ex.com/a?id=1#sec?fake=2" -> "https://ex.com/a?id=1")
    val got = canon(cases.map(_._1): _*)
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"canonical of $in")
    }
  }

  test("redirect-pair variants of one page converge to one canonical form") {
    val variants = Seq(
      "https://www.ex.com:443/docs/p1/?utm_source=feed&id=1",
      "HTTPS://EX.com/docs/p1?id=1&utm_medium=email",
      "https://ex.com/docs/p1?id=1#sec2",
      "https://WWW.EX.com/docs/p1?gclid=abc&id=1",
      "http://ex.com:80/docs/p1?id=1")
    assert(canon(variants: _*).distinct == Seq("https://ex.com/docs/p1?id=1"))
  }

  test("d14/d15 over a planted corpus: collision groups, domain gate branches") {
    import spark.implicits._
    // build a fake documents dir: 3 domains x known dup structure.
    // srcA: 4 docs, 2 pages (dup farm at >= 7000bp? 10000*(4-2)/4 =
    // 5000 -> keep); srcB: 5 docs of ONE page (8000bp -> review);
    // src3 is on the pinned blocklist -> drop regardless
    val dir = java.nio.file.Files.createTempDirectory("url_docs").toString
    val docs = Seq(
      // doc_id, source: crawlUrlExpr varies by doc_id DIV 20 % 5 and
      // pages by DIV 100 — plant ids that collide and ids that don't
      (0L, "srcA"), (20L, "srcA"), (40L, "srcA"), (100L, "srcA"),
      (1L, "srcB"), (21L, "srcB"), (41L, "srcB"), (61L, "srcB"), (81L, "srcB"),
      (3L, "src3"), (103L, "src3"),
      // srcC sits in the unique-page population (doc_id % 20 >= 10):
      // page = doc_id, no collisions, dup ratio 0 -> gate 'keep'
      (10L, "srcC"), (30L, "srcC"))
      .toDF("doc_id", "source")
      .withColumn("text", org.apache.spark.sql.functions.lit("x"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(1L))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val dedup = DedupQueries.queries("d14_url_dedup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // srcA: docs 0/20/40 share page 0 (3-way), doc 100 is page 1 alone
    val aGroups = dedup.filter(_._1.contains("srca.example.com"))
    assert(aGroups.toSet == Set(
      ("https://srca.example.com/docs/p0?id=0", 0L, 3L),
      ("https://srca.example.com/docs/p1?id=1", 100L, 1L)))
    // srcB: all five variants of page 0 collapse to one group
    val bGroups = dedup.filter(_._1.contains("srcb.example.com"))
    assert(bGroups.toSet == Set(
      ("https://srcb.example.com/docs/p0?id=0", 1L, 5L)))
    // srcC: unique-page population — two singleton groups
    val cGroups = dedup.filter(_._1.contains("srcc.example.com"))
    assert(cGroups.toSet == Set(
      ("https://srcc.example.com/docs/p10?id=10", 10L, 1L),
      ("https://srcc.example.com/docs/p30?id=30", 30L, 1L)))

    // every planted text is "x" (no classifier term): each doc scores
    // the bare +100 bias, so every domain's mean quality is 100
    val gates = DedupQueries.queries("d15_domain_gate")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    assert(gates == Set(
      ("srca.example.com", 4L, 2L, 5000L, 100L, "keep"),
      ("srcb.example.com", 5L, 1L, 8000L, 100L, "review_dup_farm"),
      ("src3.example.com", 2L, 2L, 0L, 100L, "drop_blocklist"),
      ("srcc.example.com", 2L, 2L, 0L, 100L, "keep")))
  }

  test("unparseable inputs canonicalize to NULL, never to a shared sentinel " +
    "(malformed URLs must not dedup against each other)") {
    import spark.implicits._
    val out = Seq("not a url", "example.com/no-scheme", "://bad", "", "x?id=1")
      .toDF("u")
      .select(TextQueries.urlCanonical(col("u")).as("c"),
        TextQueries.urlDomain(col("u")).as("d"))
      .collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1)),
      out.mkString("; "))
    // and the streaming gate PASSES such rows (null domain can't match
    // a blocklist; dropping them would silently eat malformed docs)
    val gated = graft.streaming.StreamGuards.urlGated(
      Seq(("ok", "https://spam.example.com/a"), ("bad", "not a url"))
        .toDF("id", "url"),
      blocklist = Seq("spam.example.com"))
    assert(gated.select("id").collect().map(_.getString(0)).toSeq == Seq("bad"))
  }

  test("t30 normalize rides the scan: one FileScan, no shuffle before the sort") {
    val df = TextQueries.queries("t30_url_canonical")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1, plan)
    assert(!plan.contains("HashAggregate"), plan)
    // exactly the sort's range-partition exchange, nothing upstream
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1, plan)
  }
}
