package graft

import org.scalatest.funsuite.AnyFunSuite

/** s20 hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
  * arm and the cosine semantic arm. The oracle (DuckDB) proves the
  * end-to-end numbers; this spec pins the FUSION ALGEBRA and the plan
  * shape (each arm reduced by TakeOrdered, never a global sort). */
class HybridRrfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("RRF algebra: emitted score == sum of 1e9 div (60+rank) over " +
    "present arms; -1 sentinels mark absent arms; ordering is total") {
    val rows = SparkEntry.queries("s20_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (id, lexRank, semRank, rrf) =>
      assert(lexRank > 0 || semRank > 0,
        s"id $id reached the fused list with NO arm rank")
      val expect =
        (if (lexRank > 0) 1000000000L / (60 + lexRank) else 0L) +
          (if (semRank > 0) 1000000000L / (60 + semRank) else 0L)
      assert(rrf == expect, s"id $id: rrf $rrf != $expect")
      assert(lexRank >= -1 && lexRank != 0 && semRank >= -1 && semRank != 0)
    }
    // fused order is (rrf desc, id asc) — a total order
    assert(rows.sortBy { case (id, _, _, rrf) => (-rrf, id) }.toSeq == rows.toSeq)
    // both arms actually contribute to the fused head (the corpus has
    // term matches AND the embedding space has neighbors)
    assert(rows.exists(_._2 > 0) && rows.exists(_._3 > 0))
    // an id ranked top-1 in BOTH arms would score 2·(1e9/61); nobody
    // can beat a double top-1 — sanity ceiling on the algebra
    assert(rows.head._4 <= 2L * (1000000000L / 61L))
  }

  test("dual-arm dominance: an id present in both arms outranks any id " +
    "whose single arm rank is no better than both of its ranks") {
    val rows = SparkEntry.queries("s20_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val dual = rows.filter(r => r._2 > 0 && r._3 > 0)
    val single = rows.filter(r => r._2 < 0 || r._3 < 0)
    for {
      d <- dual
      s <- single
      sRank = math.max(s._2, s._3) // its one live rank
      if sRank >= math.max(d._2, d._3)
    } assert(d._4 > s._4,
      s"dual-arm ${d._1} (ranks ${d._2}/${d._3}) must outscore " +
        s"single-arm ${s._1} (rank $sRank)")
  }

  test("plan: each arm reduces via TakeOrdered (no global sort of a " +
    "full arm), and fusion is a join-free union aggregate") {
    val plan = SparkEntry.queries("s20_hybrid_rrf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // fusion = union + ≤100-row hash aggregate; a FULL OUTER join here
    // cannot broadcast and would sort-merge even two 50-row lists
    assert(!plan.contains("SortMergeJoin"),
      s"fusion must not join at all (union+agg):\n$plan")
    assert(plan.contains("Union"), plan)
  }
}
