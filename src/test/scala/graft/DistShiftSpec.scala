package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProfileQueries

/** dq6_dist_shift — the exact-integer total-variation drift report.
  * Planted extremes pin the metric's range: fully disjoint slice
  * vocabularies must read the TV ceiling (1.0 on the 1e-9 grid);
  * identical distributions must read exactly zero (the integer grid
  * makes "no drift" a hard 0, never a float epsilon). */
class DistShiftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("dq6: disjoint vocabularies hit the TV ceiling; identical " +
    "distributions read exactly zero; real-data bounds hold") {
    import spark.implicits._
    val disjoint = Seq(
      ("en", "aaa aaa aaa"), ("en", "aaa aaa"),
      ("de", "bbb bbb bbb"), ("de", "bbb bbb"))
      .toDF("lang", "text")
    val d = ProfileQueries.distShift(disjoint).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(d("en") == ((2L, 1000000000L, "aaa")), s"got $d")
    assert(d("de") == ((2L, 1000000000L, "aaa")),
      "gap ties (1e9 on both planted terms) break to term ASC")

    val same = Seq(("en", "x y"), ("de", "x y")).toDF("lang", "text")
    val z = ProfileQueries.distShift(same).collect()
      .map(r => (r.getLong(2), r.getLong(4)))
    assert(z.forall(_ == ((0L, 0L))), s"identical slices must read 0: ${z.toSeq}")

    // a TOKEN-LESS slice (crawler gone dark: blank text) must appear
    // as the alarm row, not vanish through the report joins
    val dark = Seq(("en", "x y"), ("de", "x y"), ("xx", "  "), ("xx", ""))
      .toDF("lang", "text")
    val darkRows = ProfileQueries.distShift(dark).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(darkRows("xx") == ((2L, 1000000000L, "<none>")), s"got $darkRows")
    assert(darkRows.keySet == Set("de", "en", "xx"),
      "tokened slices keep their rows alongside the alarm")

    // real corpus: TV within [0, 1e9], every slice present exactly once
    val real = ProfileQueries
      .queries("dq6_dist_shift")(spark, "/root/testdata/sf0.001").collect()
    assert(real.nonEmpty)
    assert(real.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= 1000000000L))
    assert(real.map(_.getString(0)).distinct.length == real.length)
    assert(real.map(_.getLong(1)).sum == 500L, "n_docs partitions the corpus")
  }
}
