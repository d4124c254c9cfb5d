package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the second round-7 batch beyond their DuckDB oracles:
  *
  *  - cdc_scd2_history: interval algebra + agreement with the
  *    converged mirror (its current rows ARE cdc_apply_state)
  *  - dq1_constraint_report: shape + the pristine corpus passes the
  *    structural checks
  *  - g1_pagerank: full brute-force integer replica
  */
class GraphCdcDqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("scd2: versions contiguous, intervals chain, current rows = converged mirror") {
    val rows = SparkEntry.queries("cdc_scd2_history")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to vs.length).toSeq, s"user $u versions")
      // intervals are ordered and never overlap: valid_to (when set)
      // is at or before the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.isDefined, s"user $u: non-final version left open")
          assert(a._4.get <= b._3, s"user $u: overlapping intervals")
          assert(a._3 < b._3, s"user $u: valid_from not increasing")
        case _ => ()
      }
      assert(vs.count(_._6) <= 1, s"user $u: multiple current rows")
      vs.foreach(v => assert(v._6 == v._4.isEmpty, s"user $u: is_current flag"))
    }
    // the current image per key must equal the converged CDC mirror
    val current = rows.filter(_._6).map(v => (v._1, v._3)).toSet
    val mirror = SparkEntry.queries("cdc_apply_state")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(current == mirror, "SCD2 current rows disagree with cdc_apply_state")
  }

  test("dq1: one row per check, counts match the tables, pristine keys hold") {
    val rows = SparkEntry.queries("dq1_constraint_report")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows.size == 7)
    val orders = graft.sources.Tables.load(spark, sf, "orders").count()
    val lineitem = graft.sources.Tables.load(spark, sf, "lineitem").count()
    assert(rows("fk_orders_custkey")._1 == orders)
    assert(rows("fk_lineitem_orderkey")._1 == lineitem)
    assert(rows("range_lineitem_qty")._1 == lineitem)
    // the driver-generated corpus is referentially intact by
    // construction — uniqueness and FK checks must PASS on it
    for (c <- Seq("unique_customer_key", "unique_order_key",
        "fk_orders_custkey", "fk_lineitem_orderkey")) {
      assert(rows(c)._2 == 0 && rows(c)._3 == "PASS", s"$c: ${rows(c)}")
    }
    rows.values.foreach { case (checked, violations, status) =>
      assert(checked > 0 && violations >= 0)
      assert(status == (if (violations == 0) "PASS" else "FAIL"))
    }
  }

  test("g1: brute-force integer PageRank replica matches exactly") {
    val edges = graft.sources.Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1)).toSet
    val und = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val outd = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inbound = und.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var rank: Map[Long, Long] = outd.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to 3) {
      rank = inbound.map { case (dst, srcs) =>
        val acc = srcs.map(s => rank(s) / outd(s)).sum
        dst -> (150000L + 850000L * acc / 1000000L)
      }
    }
    val expected = rank.toSeq
      .map { case (nid, r) =>
        (if (nid % 2 == 0) "part" else "supplier", nid / 2, r)
      }
      .sortBy { case (t, id, r) => (-r, t, id) }
      .take(20)
    val got = SparkEntry.queries("g1_pagerank")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("g4: driver BFS replica matches the level summary exactly") {
    val out = graft.operators.GraphQueries.queries("g4_reach")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // rebuild g2's support>=2 co-purchase graph driver-side
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).map { case (_, xs) => xs.map(_._2).sorted }
      .filter(_.length <= 64) // hot-order cut (df > 64 excluded)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { parts =>
      for (i <- parts.indices; j <- (i + 1) until parts.length
           if parts(i) != parts(j))
        support((parts(i), parts(j))) =
          support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    support.foreach { case ((u, v), c) =>
      if (c >= 2) { adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    }
    val nodes = adj.keySet.toSet
    var level = nodes.filter(_ < 10)
    var seen = level
    val levels = scala.collection.mutable.ArrayBuffer((0, level))
    for (h <- 1 to 4) {
      level = level.flatMap(adj).diff(seen)
      seen = seen ++ level
      if (level.nonEmpty) levels += ((h, level))
    }
    val expected = levels.map { case (h, ids) =>
      (h, ids.size.toLong, ids.min, ids.max) }.toSeq
    assert(out.toSeq == expected, s"engine ${out.toSeq} vs replica $expected")
    assert(out.head._1 == 0 && out.head._2 > 0, "seed level present")
  }

  test("g5: driver peel replica matches; 6 rounds reach the fixpoint here") {
    val out = graft.operators.GraphQueries.queries("g5_kcore")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // rebuild the support>=2 graph driver-side (same as the g4 replica)
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).map { case (_, xs) => xs.map(_._2).sorted }
      .filter(_.length <= 64)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { parts =>
      for (i <- parts.indices; j <- (i + 1) until parts.length
           if parts(i) != parts(j))
        support((parts(i), parts(j))) =
          support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    var adj = Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    support.foreach { case ((u, v), c) =>
      if (c >= 2) { adj = adj + (u -> (adj(u) + v)) + (v -> (adj(v) + u)) }
    }
    // 6 bounded peel rounds at k=3, exactly the engine's contract
    var rounds = 0
    for (_ <- 1 to 6) {
      val keep = adj.collect { case (n, ns) if ns.size >= 3 => n }.toSet
      val next = adj.collect { case (n, ns) if keep(n) =>
        n -> ns.intersect(keep) }.toMap.filter(_._2.nonEmpty)
      if (next != adj) rounds += 1
      adj = next.withDefaultValue(Set.empty)
    }
    val expected = adj.toSeq.map { case (n, ns) => (n, ns.size.toLong) }
      .sortBy(_._1)
    assert(out == expected, s"engine size ${out.size} vs replica ${expected.size}")
    // every survivor holds the 3-core invariant — i.e. the bounded
    // 6-round contract CONVERGED on this graph (the bound is slack,
    // not a truncation)
    assert(out.forall(_._2 >= 3), "un-peeled under-degree survivor")
    assert(rounds < 6, s"fixpoint not reached within the 6-round bound")
  }
}
