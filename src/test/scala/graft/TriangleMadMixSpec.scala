package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the third round-7 batch beyond their DuckDB oracles:
  *
  *  - g2_triangles: full brute-force replica (edges, degrees, wedges,
  *    triangles, coefficient) — the degree-ordered orientation in the
  *    query is a physical optimization and must not change the count
  *  - dq2_outlier_mad: exact percentile_disc/MAD replica in plain Scala
  *  - sp8_temperature_mix: integer-arithmetic replica + share sanity
  *
  * Plus plan gates: g2 must never degenerate into a nested-loop join,
  * and sp8's unpartitioned window must sit ABOVE the aggregate (it
  * normalizes |sources| rows, never the corpus).
  */
class TriangleMadMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("g2: brute-force triangle/wedge/coefficient replica matches exactly") {
    val op = graft.sources.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size <= 64) // hot-order guard, mirrored from the query
    val pairSupport = byOrder.values.toSeq.flatMap { pks =>
      val v = pks.toSeq.sorted
      for (i <- v.indices; j <- (i + 1) until v.length) yield (v(i), v(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    // support ≥ 2: a pair must co-occur in at least two orders
    val edges: Set[(Long, Long)] = pairSupport.filter(_._2 >= 2).keySet.toSet
    val adj: Map[Long, Set[Long]] = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nNodes = adj.size.toLong
    val nEdges = edges.size.toLong
    val nWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    // each triangle {a<b<c} counted once at edge (a,b) with witness c>b
    val nTri = edges.toSeq.map { case (u, v) =>
      (adj(u) intersect adj(v)).count(_ > v).toLong
    }.sum
    val ccMicro = if (nWedges == 0) 0L else 3000000L * nTri / nWedges

    val row = SparkEntry.queries("g2_triangles")(spark, sf).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getLong(r.fieldIndex("n_nodes")) == nNodes)
    assert(r.getLong(r.fieldIndex("n_edges")) == nEdges)
    assert(r.getLong(r.fieldIndex("n_wedges")) == nWedges)
    assert(r.getLong(r.fieldIndex("n_triangles")) == nTri)
    assert(r.getLong(r.fieldIndex("cc_micro")) == ccMicro)
    assert(nTri > 0, "sf0.001 co-purchase graph should contain triangles")
  }

  test("g2 plan: banded equi-joins only — no nested-loop/cartesian anywhere") {
    val plan = SparkEntry.queries("g2_triangles")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the only NL joins allowed are the scalar 1×1 stat combines at the
    // very top — every edge/wedge join must be an equi-join
    val nl = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(nl.size <= 2 && nl.forall(_.contains("Cross")), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("dq2: exact percentile_disc median/MAD replica matches the top-15") {
    def pctDisc(sorted: Seq[Long]): Long =
      sorted((math.ceil(sorted.length * 0.5) - 1).toInt max 0)
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select("l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val expected = li.groupBy(_._1).map { case (sid, xs) =>
      val cents = xs.map(_._2).toSeq.sorted
      val med = pctDisc(cents)
      val adev = cents.map(c => math.abs(c - med)).sorted
      val mad = pctDisc(adev)
      val nOut = adev.count(_ > mad * 3).toLong
      (sid, cents.length.toLong, med, mad, nOut)
    }.toSeq.sortBy(t => (-t._5, t._1)).take(15)
    val got = SparkEntry.queries("dq2_outlier_mad")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("sp8: integer temperature-mix replica; shares bounded and monotone-dampened") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("source").collect().map(_.getString(0))
    val counts = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sq = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1000000).toLong
    }
    val totSq = sq.values.sum
    val totN = counts.values.sum
    val expected = counts.keys.toSeq.sorted.map { s =>
      val shareBp = sq(s) * 10000 / totSq
      val natBp = counts(s) * 10000 / totN
      val boostBp = if (natBp == 0) 0L else shareBp * 10000 / natBp
      (s, counts(s), shareBp, natBp, boostBp, shareBp * 500000 / 10000)
    }
    val got = SparkEntry.queries("sp8_temperature_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // integer floor division can only lose basis points, never exceed 10000
    assert(got.map(_._3).sum <= 10000, "shares exceed 100%")
    // temperature α=0.5 up-weights small sources: boost decreases as n grows
    val byN = got.sortBy(_._2)
    byN.sliding(2).foreach {
      case Seq(small, large) =>
        assert(small._5 >= large._5 - 1, // ±1 bp integer-rounding slack
          s"boost not dampened: $small vs $large")
      case _ => ()
    }
  }

  test("sp8 plan: the unpartitioned window runs over aggregated rows, not the corpus") {
    val plan = SparkEntry.queries("sp8_temperature_mix")(spark, sf)
      .queryExecution.executedPlan.toString
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0, plan)
    assert(winIdx < aggIdx, // tree prints parents first: Window above the agg
      s"window must consume the per-source aggregate, not raw documents:\n$plan")
  }
}
