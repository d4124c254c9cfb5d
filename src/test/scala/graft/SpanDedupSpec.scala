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
