package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

/** c12 C4 three-sentence-span dedup on planted docs: occurrence-grain
  * keep-first across documents AND within one document, overlap
  * handling, and the no-span short-doc identity. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)]): Map[Long, String] = {
    import spark.implicits._
    CorpusPipeline.spanDedupRebuild(docs.toDF("doc_id", "text"), "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("cross-doc span: global first occurrence keeps, the rest lose") {
    val shared = "shared line number one here.\nshared line number two " +
      "here.\nshared line number three here."
    val a = "one two three four five.\nalpha beta gamma delta one.\n" + shared
    val b = shared + "\nunique closing line for doc two."
    val out = run(Seq(1L -> a, 2L -> b))
    // doc 1 holds the span's min (doc, pos) — untouched
    assert(out(1L) == a, out(1L))
    // doc 2's occurrence loses: its first three sentences go
    assert(out(2L) == "unique closing line for doc two.", out(2L))
  }

  test("within-doc repetition dedups at occurrence grain") {
    val para = "rep line alpha.\nrep line beta.\nrep line gamma."
    val out = run(Seq(3L -> (para + "\n" + para), 4L -> "only\ntwo lines",
      5L -> "a fully unique doc.\nwith three lines.\nnothing repeats."))
    assert(out(3L) == para, out(3L)) // second occurrence removed
    assert(out(4L) == "only\ntwo lines", out(4L)) // <3 lines: no spans
    assert(out(5L) == "a fully unique doc.\nwith three lines.\n" +
      "nothing repeats.", out(5L))
  }

  test("d16 token grain: a duplicated run not aligned to any line " +
    "boundary is removed whole from the losing doc") {
    import spark.implicits._
    import graft.functions.HashExprs.tokenize
    val run = (1 to 12).map(i => s"dup$i").mkString(" ") // 12-token run
    val a = "a1 a2 a3 a4 a5 " + run + " a6 a7 a8 a9 a10"
    val b = "b1 b2 b3 " + run + " b4 b5 b6 b7 b8 b9 b10"
    val c = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"
    val out = CorpusPipeline.windowDedupRebuild(
        Seq(1L -> a, 2L -> b, 3L -> c).toDF("doc_id", "text"),
        "text", 10, tokenize(_), " ")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the run's min (doc, pos) — untouched
    assert(out(1L) == a, out(1L))
    // doc 2's occurrence loses: exactly the 12 run tokens go —
    // windows at positions 3/4/5 cover tokens 3..14
    assert(out(2L) == "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10", out(2L))
    assert(out(3L) == c, out(3L)) // unique 12 tokens: untouched
  }

  test("schema is preserved and working columns dropped") {
    import spark.implicits._
    val df = Seq((1L, "x", "a\nb\nc"), (2L, "y", "a\nb\nc"))
      .toDF("doc_id", "source", "text")
    val res = CorpusPipeline.spanDedupRebuild(df, "text")
    assert(res.columns.toSeq == Seq("doc_id", "source", "text"))
    val m = res.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(1L) == "a\nb\nc" && m(2L) == "", m.toString) // doc 2 loses all
    assert(res.select("source").collect().map(_.getString(0)).sorted
      .toSeq == Seq("x", "y"))
  }
}
