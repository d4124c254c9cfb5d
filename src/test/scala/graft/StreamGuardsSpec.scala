package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamGuards

/** The stateless decontamination guard must (a) agree exactly with the
  * relational c2 sweep on a batch frame and (b) run unchanged inside a
  * structured stream (no state, no stream-static join). */
class StreamGuardsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("batch parity: guard survivors = corpus minus c2 hits") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val bench = StreamGuards.benchmarkShingles(docs.filter(col("doc_id") < 10))
    assert(bench.nonEmpty && bench.length == bench.distinct.length)
    val survivors = StreamGuards
      .decontaminated(docs.filter(col("doc_id") >= 10), bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c2hits = SparkEntry.queries("c2_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.filter(col("doc_id") >= 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c2hits.nonEmpty, "the corpus plants contaminated docs at sf0.001")
    assert(survivors == all -- c2hits)
  }

  test("streaming HTML gate: stream survivors+clean text == batch t29 labels") {
    import spark.implicits._
    val docs = Seq(
      1L -> ("<p>A proper article with plenty of prose around one " +
        "<a href=\"/r\">link</a> and enough text to clear every gate.</p>"),
      2L -> ("<ul><li><a href=\"/a\">Home page link</a></li>" +
        "<li><a href=\"/b\">Products and services</a></li>" +
        "<li><a href=\"/c\">About the whole company</a></li></ul>"), // link-dense
      3L -> "<p>tiny</p>",                                           // short
      4L -> "plain text with no markup, long enough to stay content here")
    // batch truth: the t29 labels + extracted text over the same rows
    val batch = graft.operators.CorpusPipeline
      .htmlGate(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val in = MemoryStream[(Long, String)](spark)
    val gated = StreamGuards.htmlGated(in.toDF.toDF("doc_id", "text"))
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("html_gated_docs").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("html_gated_docs")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch)
      assert(streamed.keySet == Set(1L, 4L), streamed.toString)
      assert(!streamed(1L).contains("<"), streamed(1L))
    } finally q.stop()
  }

  test("streaming URL gate: canonical columns attached, blocked domains dropped, stream==batch") {
    import spark.implicits._
    val blocklist = Seq("spam.example.com")
    val docs = Seq(
      (1L, "https://www.Good.EXAMPLE.com:443/a/?utm_source=x&id=1"),
      (2L, "http://spam.example.com:80/landing"),   // blocked
      (3L, "https://good.example.com/a?id=1"))      // 1's redirect twin
    val batch = graft.streaming.StreamGuards
      .urlGated(docs.toDF("doc_id", "url"), blocklist)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet

    val in = MemoryStream[(Long, String)](spark)
    val gated = StreamGuards.urlGated(in.toDF.toDF("doc_id", "url"), blocklist)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("url_gated_docs").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("url_gated_docs")
        .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set(1L, 3L), streamed.toString)
      // redirect-pair twins converge to ONE canonical form — the key a
      // downstream dropDuplicates("url_canon") dedups on
      assert(streamed.map(_._2) == Set("https://good.example.com/a?id=1"))
      assert(streamed.map(_._3) == Set("good.example.com"))
    } finally q.stop()
  }

  test("quality gate: each rule drops its planted doc; flags agree with " +
    "the t2/t16/t31 queries over the whole corpus") {
    import spark.implicits._
    // per-rule planted docs (GopherRepetitionSpec's constructions)
    val phrase = (1 to 12).map(i => s"w$i x$i y$i z$i click here").mkString(" ")
    val periodic = ((1 to 40) ++ (1 to 40)).map(i => f"q$i%02d").mkString(" ")
    // long enough that no cnt=1 4-gram covers 16% of the characters —
    // the Gopher top-gram rule legitimately flags very short docs
    // (its published pipeline applies a 50-word floor upstream)
    val clean = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu"
    val planted = Seq(
      1L -> phrase,      // t31 drop (dominant phrase, t16/t2 clean)
      2L -> periodic,    // t16 drop (dup bigrams, NO dominant gram)
      3L -> "too short", // t2 drop (token floor)
      4L -> ("spam spam spam spam spam spam spam spam spam spam " +
        "spam spam"),    // t2 diversity (and every repetition rule)
      5L -> clean)       // kept
    val kept = StreamGuards.qualityGated(planted.toDF("doc_id", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L), kept.toString)

    // corpus cross-check at sf0.001: the gate's survivors must be the
    // corpus minus the union of the three NAMED queries' flag sets
    // (the gate is the streaming face of those reports — one
    // definition, two consumers)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val t16f = SparkEntry.queries("t16_repetition")(spark, sf)
      .filter("flagged").select("doc_id").collect().map(_.getLong(0)).toSet
    val t31f = SparkEntry.queries("t31_gopher_repetition")(spark, sf)
      .filter("flagged").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val t2f = docs.select(col("doc_id"),
        graft.functions.HashExprs.tokenize(col("text")).as("t"))
      .filter(size(col("t")) < 10 ||
        size(array_distinct(col("t"))) * 10000L < size(col("t")).cast("long") * 3000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gateKept = StreamGuards.qualityGated(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gateKept == all -- t16f -- t31f -- t2f,
      s"gate=${gateKept.size} expected=${(all -- t16f -- t31f -- t2f).size}")
  }

  test("composed ingest order (html gate -> quality gate): stream == batch") {
    import spark.implicits._
    val spam = (1 to 20).map(_ => "buy now").mkString(" ")
    val docs = Seq(
      1L -> ("<p>A proper article with plenty of prose spread around one " +
        "<a href=\"/r\">link</a> and containing enough distinct varied text " +
        "that neither the markup gate nor any repetition or quality rule " +
        "fires on the extracted body of the page.</p>"),
      2L -> s"<p>$spam and some extra words to pass the length floor</p>",
      3L -> ("plain diverse text with many distinct words kept all the way " +
        "through every stage because nothing here repeats and the body is " +
        "long enough that no single gram dominates its character count"))
    def compose(df: org.apache.spark.sql.DataFrame) =
      StreamGuards.qualityGated(StreamGuards.htmlGated(df))
    val batch = compose(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val in = MemoryStream[(Long, String)](spark)
    val q = compose(in.toDF.toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("quality_gated_docs").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("quality_gated_docs")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch)
      // doc 2 passes the html gate (prose-shaped) but its "buy now"
      // repetition fails the quality gate
      assert(streamed.keySet == Set(1L, 3L), streamed.toString)
    } finally q.stop()
  }

  test("full-Gopher gate: survivors == corpus minus the t32/t33 queries' " +
    "flag sets on the same pages; stream == batch") {
    import spark.implicits._
    // run the gate over the SAME synthetic pages the t32/t33 queries
    // score, so the floor-div/multiplication equivalence is pinned
    // corpus-wide, not just on planted docs
    val pages = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.operators.TextQueries.crawlPageExpr.as("text"))
    val all = pages.select("doc_id").collect().map(_.getLong(0)).toSet
    val t32f = SparkEntry.queries("t32_gopher_dup_fractions")(spark, sf)
      .filter("flagged").select("doc_id").collect().map(_.getLong(0)).toSet
    val t33f = SparkEntry.queries("t33_gopher_quality")(spark, sf)
      .filter("flagged").select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = StreamGuards.gopherGated(pages)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- t32f -- t33f,
      s"gate=${kept.size} expected=${(all -- t32f -- t33f).size}")
    assert(kept.nonEmpty && (t32f ++ t33f).nonEmpty, "both branches live")

    // and the same filter runs unchanged inside a structured stream
    val sample = pages.limit(32).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batchKept = StreamGuards.gopherGated(
      sample.toDF("doc_id", "text")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamGuards.gopherGated(in.toDF.toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_gated_docs").start()
    try {
      in.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("gopher_gated_docs")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batchKept, s"stream=$streamed batch=$batchKept")
    } finally q.stop()
  }

  test("C4 gate: survivors+rebuilt text == the t34 query's verdicts on " +
    "the same pages; stream == batch") {
    import spark.implicits._
    val pages = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.operators.TextQueries.c4PageExpr.as("text"))
    val report = SparkEntry.queries("t34_c4_filters")(spark, sf)
      .select("doc_id", "flagged", "kept_text").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    val gated = StreamGuards.c4Gated(pages).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gated.keySet == report.filter(!_._2._1).keySet,
      s"gate=${gated.size} expected=${report.count(!_._2._1)}")
    assert(gated.nonEmpty && report.exists(_._2._1), "both branches live")
    gated.foreach { case (id, text) =>
      assert(text == report(id)._2, s"doc $id rebuilt text diverges")
    }

    val sample = pages.limit(32).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batchKept = StreamGuards.c4Gated(
      sample.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamGuards.c4Gated(in.toDF.toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("c4_gated_docs").start()
    try {
      in.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("c4_gated_docs")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batchKept, s"stream=${streamed.size} batch=${batchKept.size}")
    } finally q.stop()
  }

  test("mix gate: a precomputed rate table gives stream arrivals the " +
    "same fate as the batch sampler; stream == batch") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val rates = graft.operators.CorpusPipeline.mixRates(docs, "lang")
      .localCheckpoint(true) // the static side, frozen once
    val batchIds = graft.operators.CorpusPipeline
      .temperatureSample(docs, "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gatedIds = StreamGuards.mixSampled(docs, rates, "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gatedIds == batchIds, s"gate=${gatedIds.size} batch=${batchIds.size}")
    assert(gatedIds.nonEmpty && gatedIds.size <
      docs.count(), "both branches live")

    val sample = docs.select("doc_id", "lang").limit(64).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamGuards.mixSampled(
        in.toDF.toDF("doc_id", "lang"), rates, "lang")
      .writeStream.outputMode("append")
      .format("memory").queryName("mix_gated_docs").start()
    try {
      in.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("mix_gated_docs")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == sample.map(_._1).toSet.intersect(batchIds),
        s"stream=${streamed.size}")
    } finally q.stop()
  }

  test("CCNet gate: map-form scores equal the t35 report bit for bit; " +
    "tail drops; stream == batch") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val model = graft.operators.TextQueries.ccnetModel(docs)
      .localCheckpoint(true)
    val report = SparkEntry.queries("t35_ccnet_buckets")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getString(4)))).toMap
    val gated = StreamGuards.ccnetBucketed(
        docs.filter(col("doc_id") >= graft.operators.TextQueries.CcnetRefDocs),
        model)
      .select("doc_id", "lm_ppm", "bucket").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    val expected = report.filter(_._2._2 != "tail")
    assert(gated.keySet == expected.keySet,
      s"gate=${gated.size} expected=${expected.size}")
    gated.foreach { case (id, (ppm, b)) =>
      assert(ppm == report(id)._1 && b == report(id)._2,
        s"doc $id: gate ($ppm, $b) vs report ${report(id)}")
    }
    assert(report.exists(_._2._2 == "tail"), "tail branch live")

    val sample = docs
      .filter(col("doc_id") >= graft.operators.TextQueries.CcnetRefDocs)
      .select("doc_id", "lang", "text").limit(24).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val in = MemoryStream[(Long, String, String)](spark)
    val q = StreamGuards.ccnetBucketed(
        in.toDF.toDF("doc_id", "lang", "text"), model)
      .writeStream.outputMode("append")
      .format("memory").queryName("ccnet_gated_docs").start()
    try {
      in.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("ccnet_gated_docs")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed ==
        sample.map(_._1).toSet.intersect(expected.keySet),
        s"stream=${streamed.size}")
    } finally q.stop()
  }

  test("the guard runs stateless inside a structured stream") {
    import spark.implicits._
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((0L, benchText)).toDF("doc_id", "text")
    val shingles = StreamGuards.benchmarkShingles(bench)

    val in = MemoryStream[(Long, String)](spark)
    val guarded = StreamGuards.decontaminated(
      in.toDF.toDF("doc_id", "text"), shingles, minHits = 3)
    val q = guarded.writeStream.outputMode("append")
      .format("memory").queryName("guarded_docs").start()
    try {
      in.addData(
        (10L, benchText + " iota kappa"),          // ≥3 bench shingles → dropped
        (11L, "one two three four five six seven"), // clean → kept
        (12L, "alpha beta gamma nine ten"))         // 1 bench shingle → kept
      q.processAllAvailable()
      val kept = spark.table("guarded_docs")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(11L, 12L))
    } finally q.stop()
  }
}
