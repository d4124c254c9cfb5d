package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries

case class UEv(ts: java.sql.Timestamp, user_id: Long)

/** The Misra–Gries guarantee (every item with frequency > n/(k+1)
  * survives), under sequential feed and under arbitrary merge trees —
  * the property the two-pass heavy-hitter pipeline (e2) rests on. */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def feed(items: Seq[String], k: Int): MisraGries.Summary = {
    val s = mutable.HashMap.empty[String, Long]
    items.foreach(MisraGries.add(s, _, k))
    s
  }

  private def heavy(items: Seq[String], k: Int): Set[String] = {
    val n = items.length
    items.groupBy(identity).collect {
      case (item, occ) if occ.length.toLong * (k + 1) > n => item
    }.toSet
  }

  test("no false negatives on random zipf-ish streams") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val k = 1 + rnd.nextInt(12)
      val items = Seq.fill(500 + rnd.nextInt(1500)) {
        // skewed: small ids are frequent
        s"w${(math.sqrt(rnd.nextInt(900)).toInt)}"
      }
      val summary = feed(items, k)
      val must = heavy(items, k)
      assert(must.subsetOf(summary.keySet.toSet),
        s"trial $trial k=$k lost ${must -- summary.keySet}")
    }
  }

  test("merge preserves the guarantee across arbitrary splits") {
    val rnd = new Random(7)
    for (trial <- 1 to 20) {
      val k = 2 + rnd.nextInt(10)
      val items = Seq.fill(2000)(s"w${math.sqrt(rnd.nextInt(400)).toInt}")
      // split into 4 chunks, summarize each, merge pairwise then root
      val chunks = items.grouped(500).map(feed(_, k)).toSeq
      val merged = chunks.reduce((a, b) => MisraGries.merge(a, b, k))
      val must = heavy(items, k)
      assert(must.subsetOf(merged.keySet.toSet),
        s"trial $trial k=$k lost ${must -- merged.keySet}")
      assert(merged.size <= k)
    }
  }

  test("e2_heavy_tokens equals brute-force heavy hitters") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val viaSketch = SparkEntry.queries("e2_heavy_tokens")(spark, sf)
      .as[(String, Long)].collect().toMap
    val toks = graft.sources.Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.HashExprs.tokenize(col("text"))).as("tok"))
      .as[String].collect()
    val n = toks.length
    val brute = toks.groupBy(identity).collect {
      case (t, occ) if occ.length.toLong * 100 > n => t -> occ.length.toLong
    }.toMap
    assert(viaSketch == brute)
  }

  test("streaming windowed candidates keep the heavy user across micro-batches") {
    import spark.implicits._
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[UEv](spark)
    val base = 1700002800000L // hour-aligned
    def ev(min: Long, uid: Long) = UEv(new java.sql.Timestamp(base + min * 60000), uid)
    // user 7 is heavy (appears every batch); background users rotate
    val q = graft.streaming.EventWindows.frequentUsersPerWindow(stream.toDF(), k = 3)
      .writeStream.outputMode("complete")
      .format("memory").queryName("freq_win_out").start()
    for (b <- 0 until 4) {
      stream.addData((0 until 10).map(i => ev(b * 10 + i % 9, if (i < 6) 7L else 100L + b * 10 + i)): _*)
      q.processAllAvailable()
    }
    q.stop()
    val cands = spark.table("freq_win_out")
      .selectExpr("explode(candidates) AS u").as[String].collect().toSet
    assert(cands.contains("7"), s"heavy user lost from $cands")
  }

  test("freq_candidates is SQL-registered with arity checking") {
    // extensions are a session-construction concern (static conf in a
    // real deployment) — same pattern as GraftExtensionsSpec
    val shared = SparkTestSession.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .appName("graft-freq-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      graft.sources.Tables.load(s, "/root/testdata/sf0.001", "events")
        .createOrReplaceTempView("events")
      val arr = s.sql(
        "SELECT freq_candidates(event_type, 10) AS c FROM events")
        .head.getSeq[String](0)
      assert(arr.nonEmpty && arr.size <= 10)
      val err = intercept[Exception] {
        s.sql("SELECT freq_candidates(event_type) FROM events").collect()
      }
      assert(err.getMessage.contains("freq_candidates"))
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(shared)
      org.apache.spark.sql.SparkSession.setDefaultSession(shared)
    }
  }
}
