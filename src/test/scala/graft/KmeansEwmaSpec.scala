package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for s13 (Lloyd assignment step) and ts8 (truncated EWMA)
  * beyond their DuckDB oracles — brute-force integer replicas plus
  * the invariants that make the operators trustworthy:
  *
  *  - s13: the DotLong identity |v−c|² = v·v + c·c − 2·v·c must equal
  *    the componentwise sum exactly; every vector lands somewhere
  *    (populations sum to the corpus) and each seed's own cell is
  *    non-empty (a seed is at distance 0 from itself)
  *  - ts8: eight-term weighted replica; renormalized start-up means
  *    the EWMA always lies inside [min, max] of its window
  */
class KmeansEwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("s13: componentwise L2 replica matches populations and inertia exactly") {
    val vs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val arr = r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000000)).toArray
        (r.getLong(0), arr)
      }
    val seeds = vs.filter(_._1 < 8).sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val assigned = vs.map { case (vid, arr) =>
      val (bestSid, bestD2) = seeds
        .map { case (sid, sv) => (sid, d2(arr, sv)) }
        .minBy { case (sid, dd) => (dd, sid) }
      (vid, bestSid, bestD2)
    }
    val expected = assigned.groupBy(_._2).map { case (sid, xs) =>
      val inertia = xs.map(_._3).sum
      (sid, xs.length.toLong, inertia, inertia / xs.length)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("s13_kmeans_assign")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == vs.length)
    // each seed is at distance 0 from itself → its cell is non-empty
    assert(got.map(_._1) == (0L to 7L), s"empty cells: ${got.map(_._1)}")
  }

  test("ts8: eight-term truncated-EWMA replica matches; EWMA bounded by its window") {
    val rows = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts_ns", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1000000)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      ordered.indices.map { i =>
        val windowVals = (0 to math.min(7, i)).map(k => ordered(i - k)._4)
        val num = windowVals.zipWithIndex.map { case (v, k) => v * (1L << (7 - k)) }.sum
        val den = 256L - (1L << (8 - windowVals.length))
        (uid, ordered(i)._2, ordered(i)._4, num / den, windowVals)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("ts8_ewma")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected.map(t => (t._1, t._2, t._3, t._4)))
    // renormalized start-up: EWMA never escapes its window's value range
    expected.foreach { case (uid, eid, _, ewma, wv) =>
      assert(ewma >= wv.min - 1 && ewma <= wv.max,
        s"EWMA $ewma outside [${wv.min}, ${wv.max}] at ($uid, $eid)")
    }
  }

  test("ts8 plan: one window exchange partitioned by user — no global sort") {
    val plan = SparkEntry.queries("ts8_ewma")(spark, sf)
      .queryExecution.executedPlan.toString
    // the window must be partitioned (hashpartitioning on user_id),
    // never a single-partition global window
    assert(plan.contains("hashpartitioning(user_id"), plan)
  }
}
