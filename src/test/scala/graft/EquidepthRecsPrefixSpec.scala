package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-7 batch (a15, g3, d11) beyond their DuckDB
  * oracles:
  *
  *  - a15_equidepth_hist: exact order-statistic replica in plain
  *    Scala (octile fractions k/8 are exact binary doubles, so the
  *    ⌈p·n⌉ rank index is reproducible anywhere) + mass invariants
  *  - g3_copurchase_recs: brute-force wedge/RA replica with both
  *    guards, plus the novelty invariant (no recommendation is
  *    already adjacent to its seed)
  *  - d11_prefix_filter: must equal d2's exact-threshold output
  *    row-for-row — the prefix filter is a physical optimization
  *    (completeness by pigeonhole), never a semantic one — plus a
  *    no-cartesian plan gate
  */
class EquidepthRecsPrefixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a15: order-statistic replica matches buckets; mass and range invariants") {
    val cents = graft.sources.Tables.load(spark, sf, "lineitem")
      .select("l_extendedprice").collect()
      .map(r => math.round(r.getDouble(0) * 100)).sorted
    val n = cents.length
    def pctDisc(p: Double): Long = cents((math.ceil(n * p) - 1).toInt max 0)
    val bounds = (1 to 7).map(k => pctDisc(k / 8.0))
    val expected = cents.groupBy(c => bounds.count(_ < c))
      .map { case (b, xs) => (b, xs.length.toLong, xs.min, xs.max) }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("a15_equidepth_hist")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == n)
    // buckets partition the value range without overlap
    got.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo._4 <= hi._3, s"overlap: $lo vs $hi")
      case _ => ()
    }
  }

  test("g3: brute-force RA link-prediction replica matches the per-seed top-5") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .filter(_._2.size <= 64) // hot-order guard, mirrored from the query
    val edges: Set[(Long, Long)] = byOrder.values.flatMap { pks =>
      val v = pks.toSeq.sorted
      for (i <- v.indices; j <- (i + 1) until v.length) yield (v(i), v(j))
    }.toSet
    val adj: Map[Long, Set[Long]] =
      (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val expected = adj.keys.filter(_ < 50).toSeq.sorted.flatMap { seed =>
      val scores = collection.mutable.Map.empty[Long, (Long, Long)]
      for (w <- adj(seed) if deg(w) <= 256; rec <- adj(w) if rec != seed) {
        val (cn, ra) = scores.getOrElse(rec, (0L, 0L))
        scores(rec) = (cn + 1, ra + 1000000L / deg(w))
      }
      scores.toSeq
        .filterNot { case (rec, _) => adj(seed).contains(rec) }
        .map { case (rec, (cn, ra)) => (rec, cn, ra) }
        .sortBy { case (rec, _, ra) => (-ra, rec) }
        .take(5).zipWithIndex
        .map { case ((rec, cn, ra), i) => (seed, rec, cn, ra, i + 1) }
    }
    val got = SparkEntry.queries("g3_copurchase_recs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 co-purchase graph should yield recommendations")
    // novelty: no recommended pair is already an edge
    got.foreach { case (seed, rec, _, _, _) =>
      assert(!adj.get(seed).exists(_.contains(rec)), s"adjacent pair: $seed, $rec")
    }
  }

  test("d11: prefix-filtered join reproduces d2's exact threshold output") {
    val d2 = SparkEntry.queries("d2_jaccard_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val d11 = SparkEntry.queries("d11_prefix_filter")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(d11 == d2)
    assert(d11.nonEmpty, "sf0.001 corpus should contain near-dup pairs")
  }

  test("d11 plan: equi-joins only — no cartesian products, no nested loops") {
    val plan = SparkEntry.queries("d11_prefix_filter")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
