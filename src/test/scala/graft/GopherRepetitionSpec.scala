package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** t31 Gopher top-n-gram repetition on planted docs: the character-
  * share formula, the strict-> threshold boundary, the deterministic
  * tie-break, and the contrast with t16 (distinct bigrams, dominant
  * phrase) that motivates a separate signal. */
class GopherRepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("t31").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    TextQueries.queries("t31_gopher_repetition")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
  }

  test("character share, thresholds, boundary, and tie-break") {
    val spamRun = "spam spam spam spam spam" // 24 chars, 5 tokens
    // exactly-at-threshold doc: "spam spam" twice over exactly 90
    // chars -> 10000*2*9 DIV 90 = 2000 bp = the 2-gram threshold,
    // strict > means NOT flagged
    val boundary = "spam spam x spam spam" +
      " aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt uu vv ww"
    assert(boundary.length == 90, boundary.length.toString)
    val clean = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu")
    val ties = "b b a a b b a a"

    val out = run(Seq(1L -> spamRun, 2L -> boundary, 3L -> clean, 4L -> ties))

    // doc 1: "spam spam" x4, 9 chars each over 24 -> 15000 bp, flagged
    assert(out((1L, 2)) == (("spam spam", 4L, 15000L, true)), out((1L, 2)).toString)
    // overlapping occurrences legitimately exceed 10000 bp (uncapped,
    // as the published filter computes it)
    assert(out((1L, 3)) == (("spam spam spam", 3L, 17500L, true)))
    assert(out((1L, 4)) == (("spam spam spam spam", 2L, 15833L, true)))

    // doc 2: exactly AT the 2000 bp threshold -> strict > leaves it clean
    assert(out((2L, 2)) == (("spam spam", 2L, 2000L, false)), out((2L, 2)).toString)

    // doc 3: long diverse prose -> far under every threshold
    val (g3, c3, s3, f3) = out((3L, 2))
    assert(c3 == 1L && s3 < 2000L && !f3, out((3L, 2)).toString)
    assert(g3.nonEmpty)

    // doc 4: three bigrams tie at count 2 -> deterministic winner is
    // the LARGEST gram string ("b b" > "b a" > "a a")
    assert(out((4L, 2))._1 == "b b", out((4L, 2)).toString)
  }

  private def runT32(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("t32").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    (dir, TextQueries.queries("t32_gopher_dup_fractions")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getBoolean(13))))
      .toMap) // doc -> (n_lines, line_bp, line_char_bp, para_bp, para_char_bp, dup5_bp, flagged)
  }

  test("t32 duplicate-fraction suite: every rule on a planted page, " +
    "including the doc t31 passes but dup-5-gram coverage fails") {
    // doc 1 (no promo branch): 40 distinct 3-char tokens repeated
    // twice — NO dominant single gram (t31 clean at every n) but every
    // in-copy 5-gram occurs twice: the published dup-n-gram rule
    // catches what the top-gram rule structurally cannot
    val periodic = ((1 to 40) ++ (1 to 40)).map(i => f"q$i%02d").mkString(" ")
    // doc 2: the body itself carries duplicate PARAGRAPHS (planted
    // \n\n) — para fraction 2/5 = 4000 bp > 3000 fires
    val dupParas = "red blue green\n\nred blue green\n\nred blue green"
    // doc 3: diverse single-line prose — everything 0, clean
    val clean = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra"
    // doc 15 (promo branch, r = 1+15%6 = 4): four identical promo
    // lines — dup-line fraction 3/7 fires
    // doc 20 (dup-para branch, r = 1+20%6 = 3, promo para twice):
    // para fraction is EXACTLY 2000 bp (1 dup of 5 paras... see
    // below) — the para-COUNT rule stays quiet under strict >, the
    // para-CHAR rule fires
    val (dir, out) = runT32(Seq(
      1L -> periodic, 2L -> dupParas, 3L -> clean,
      15L -> "alpha beta gamma", 20L -> "alpha beta gamma"))

    // doc 1: t31 clean at n = 2/3/4 on the same planted dir
    val t31 = TextQueries.queries("t31_gopher_repetition")(spark, dir)
      .filter("doc_id = 1").collect()
    assert(t31.length == 3 && t31.forall(!_.getBoolean(5)),
      t31.mkString("; "))
    // ...but 36 distinct 5-grams × 2 occurrences × 19 chars over the
    // 372-char page = 36774 bp — flagged
    val d1 = out(1L)
    assert(d1._6 == 36774L && d1._7, d1.toString)
    assert(d1._2 == 0L && d1._4 == 0L, d1.toString) // no line/para dups

    // doc 2: paras nav|p|p|p|footer -> 2 dups of 5 = 4000 bp; the
    // same three lines dup at line grain too
    val d2 = out(2L)
    assert(d2._4 == 4000L && d2._2 == 4000L && d2._1 == 5L && d2._7,
      d2.toString)

    // doc 3: every statistic zero, clean
    assert(out(3L) == ((3L, 0L, 0L, 0L, 0L, 0L, false)), out(3L).toString)

    // doc 15: lines nav|body|promo×4|footer -> 3 dups of 7 = 4285 bp;
    // dup line chars 3×31 over the 198-char page = 4696 bp
    val d15 = out(15L)
    assert(d15._1 == 7L && d15._2 == 4285L && d15._3 == 4696L && d15._7,
      d15.toString)
    assert(d15._4 == 0L, d15.toString) // one promo para — no para dup

    // doc 20: dup_para_bp exactly AT 2000 (1 dup of 5 paras) — under
    // the 3000 threshold; the 95 duplicated para chars over the
    // 263-char page = 3612 bp > 2000 fire the char rule instead
    val d20 = out(20L)
    assert(d20._4 == 2000L && d20._5 == 3612L && d20._7, d20.toString)
  }

  private def runT33(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("t33").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    TextQueries.queries("t33_gopher_quality")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getBoolean(9))))
      .toMap // doc -> (words, mean_c100, symbol, bullet, ellipsis, alpha, stops, flagged)
  }

  test("t33 quality rules: each rule fires alone on its planted page") {
    // ids avoid every promo/bullet/teaser page branch (%5/%7/%9/%10)
    val tooShort = "the a tiny doc"
    val longWords = "the a " + Seq.fill(45)("extraordinarily").mkString(" ")
    val hashy = "the a " + (1 to 46).map(i => s"w$i").mkString(" ") +
      " #x #x #x #x #x #x #x"
    val bullets = (1 to 40).map(i => s"- bullet item number$i the a").mkString("\n")
    val ellipsis = ("a dozen ordinary words sit inside this very first line " +
      "here now\nthe second line also carries twelve ordinary words of " +
      "plain prose text\nwait for it then some...\nmore to come quite " +
      "soon...\nstill loading more text...")
    val numeric = "the a " + (1 to 30).map(i => s"${i}00${i}").mkString(" ") +
      " " + (1 to 22).map(i => s"w$i").mkString(" ")
    val noStops = (1 to 50).map(i => f"word$i%02d").mkString(" ")
    val clean = "the a " + (1 to 45).map(i => s"prose$i").mkString(" ")

    val out = runT33(Seq(1L -> tooShort, 2L -> longWords, 3L -> hashy,
      13L -> bullets, 17L -> ellipsis, 19L -> numeric, 23L -> noStops,
      29L -> clean))

    val d1 = out(1L) // 13 words < 50
    assert(d1._1 < TextQueries.GopherMinWords && d1._8, d1.toString)
    val d2 = out(2L) // mean word length past 10
    assert(d2._2 > TextQueries.GopherMaxMeanWlenC100 && d2._8, d2.toString)
    assert(d2._1 >= TextQueries.GopherMinWords, d2.toString)
    val d3 = out(3L) // 7 hashes over 64 words = 1093 bp > 1000
    assert(d3._3 > TextQueries.GopherSymbolBp && d3._8, d3.toString)
    assert(d3._2 <= TextQueries.GopherMaxMeanWlenC100, d3.toString)
    val d13 = out(13L) // 40 of 42 lines (nav + bullets + footer) = 9523 bp
    assert(d13._4 == 9523L && d13._8, d13.toString)
    assert(d13._6 >= TextQueries.GopherAlphaWordBp, d13.toString)
    val d17 = out(17L) // 3 of 7 lines ellipsis-ended = 4285 bp
    assert(d17._5 == 4285L && d17._8, d17.toString)
    assert(d17._3 <= TextQueries.GopherSymbolBp, d17.toString) // 3 syms pass
    val d19 = out(19L) // 32 non-alpha of 61 words
    assert(d19._6 < TextQueries.GopherAlphaWordBp && d19._8, d19.toString)
    val d23 = out(23L) // zero stop words
    assert(d23._7 == 0L && d23._8, d23.toString)
    // the clean page passes every rule
    val d29 = out(29L)
    assert(!d29._8, d29.toString)
    assert(d29._7 == 2L && d29._1 >= 50L, d29.toString)
  }

  test("distinct signal from t16: a dominant phrase among distinct bigrams") {
    import spark.implicits._
    // every bigram DISTINCT except the dominant phrase: t16's
    // dup-ratio stays under its 0.2 flag while t31's 2-gram character
    // share flags the doc — the two signals are not redundant
    val phrase = "click here"
    val doc = (1 to 12).map(i => s"w$i x$i y$i z$i $phrase").mkString(" ")
    val dir = Files.createTempDirectory("t31c").toString
    Seq((1L, doc)).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val t31 = TextQueries.queries("t31_gopher_repetition")(spark, dir)
      .filter("n = 2").collect().head
    assert(t31.getString(2) == phrase && t31.getLong(3) == 12L &&
      t31.getBoolean(5), t31.toString)
    val t16 = TextQueries.queries("t16_repetition")(spark, dir)
      .collect().head
    assert(!t16.getAs[Boolean]("flagged"),
      s"t16 should stay clean on distinct-bigram text: $t16")
  }
}
