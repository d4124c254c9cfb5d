package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for cdc_compact, a16_weighted_median and a17_pareto_abc
  * beyond their DuckDB oracles:
  *
  *  - cdc_compact: REPLAY EQUIVALENCE — applying the last-per-key /
  *    drop-tombstone fold over the compacted log (baseline + tail)
  *    must converge to exactly cdc_apply_state's output over the full
  *    feed; that equivalence is the entire point of compaction.
  *    Segment invariants pin the watermark split.
  *  - a16_weighted_median: exact integer replica of the cumulative-
  *    weight crossing, plus the defining property |w(< m) | ≤ W/2 and
  *    w(≤ m) ≥ W/2.
  *  - a17_pareto_abc: exact replica of the descending cumulative
  *    shares and class boundaries, plus the plan gate that the global
  *    cumsum goes through Ranks.globalCumSum's bucketed two-pass (no
  *    unpartitioned window node anywhere).
  */
class CompactWmedianSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // sf0.001's feed ends below the watermark (every row is baseline);
  // sf0.01 (max event_id 9999) exercises BOTH segments — tail rows,
  // the watermark boundary, and tombstone keys re-created by the tail
  for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"cdc_compact: replaying the compacted log converges to cdc_apply_state ($sfDir)") {
      val compacted = SparkEntry.queries("cdc_compact")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getString(4)))
      // replay: per key take the highest-LSN row; drop if it's a tombstone
      val replayed = compacted.groupBy(_._1).flatMap { case (_, rows) =>
        val last = rows.maxBy(_._2)
        if (last._3 == "error") None else Some((last._1, last._2, last._4))
      }.toSeq.sortBy(_._1)
      val state = SparkEntry.queries("cdc_apply_state")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 100))).toSeq.sortBy(_._1)
      assert(replayed == state)
      // watermark split invariants
      val (base, tail) = compacted.partition(_._5 == "baseline")
      assert(base.forall(_._2 < 5000) && tail.forall(_._2 >= 5000))
      assert(base.groupBy(_._1).forall(_._2.length == 1),
        "baseline must hold at most one image per key")
      assert(base.forall(_._3 != "error"), "baseline must not carry tombstones")
      assert(base.nonEmpty)
      if (sfDir.endsWith("sf0.01")) {
        assert(tail.nonEmpty, "sf0.01 must exercise the tail segment")
        // the tail keeps tombstones verbatim — compaction must not
        // have dropped them above the watermark
        assert(tail.exists(_._3 == "error"), "tail should retain tombstones")
      }
    }
  }

  test("a17: descending cumulative-share replica matches classes exactly") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val rev = li.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (pid, c) => (-c, pid) } // cents desc, part asc
    val total = rev.map(_._2).sum
    var cum = 0L
    val classes = rev.map { case (pid, c) =>
      val prevBp = cum * 10000 / total
      cum += c
      val cls = if (prevBp < 8000) "A" else if (prevBp < 9500) "B" else "C"
      (cls, pid, c)
    }
    val expected = classes.groupBy(_._1).map { case (cls, xs) =>
      (cls, xs.length.toLong, xs.map(_._3).sum,
        xs.map(_._3).sum * 10000 / total)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("a17_pareto_abc")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // Pareto sanity: A-class revenue share dominates its part share
    val a = got.find(_._1 == "A").get
    assert(a._4 >= 8000 - 10000 / a._2.max(1), s"A share too small: $a")
  }

  test("a17 plan: global cumsum is bucketed — no unpartitioned window node") {
    val plan = SparkEntry.queries("a17_pareto_abc")(spark, sf)
      .queryExecution.executedPlan.toString
    // the cumsum window must ride the _bkt hash partitioning; scalar
    // aggregates (stats/total) legitimately use SinglePartition
    // exchanges for their one-row results, so the gate is specific:
    // no Window node may sit on a single-partition exchange
    assert(plan.contains("Window"), plan)
    assert(plan.contains("hashpartitioning(_bkt"), plan)
    val lines = plan.linesIterator.toSeq
    lines.sliding(2).foreach {
      case Seq(win, ex)
        if win.contains("Window") && ex.contains("SinglePartition") =>
        fail(s"global window on a single partition:\n$win\n$ex\n$plan")
      case _ => ()
    }
  }

  test("a16 plan: no whole-flag value sort — every window bucket-bounded, joins broadcast") {
    // the r7 one-scan spelling sorted each flag's value cells in ONE
    // window partition (#flags-way parallelism, cells ≈ rows on
    // near-unique values); the groupQuantilesDisc spelling trades two
    // extra cheap scans for windows that only ever see ≤ buckets
    // histogram rows or one bucket's rows — at 100 TB that trade is
    // the whole point, so the plan gate pins it
    val df = SparkEntry.queries("a16_weighted_median")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toList
    assert(windows.nonEmpty, plan)
    windows.foreach(w =>
      assert(w.contains("_bkt"), s"whole-group window in a16:\n$w"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }

  test("a16: exact cumulative-weight replica; crossing property holds") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        r.getDouble(2).toLong))
    val expected = li.groupBy(_._1).map { case (flag, xs) =>
      val tot = xs.map(_._3).sum
      val cells = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val m = cells.collectFirst {
        case (cents, w) if { cum += w; 2 * cum >= tot } => cents
      }.get
      (flag, m, tot)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("a16_weighted_median")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // defining property of the weighted median m: strictly-below mass
    // < half total, at-or-below mass ≥ half total
    got.foreach { case (flag, m, tot) =>
      val xs = li.filter(_._1 == flag)
      val below = xs.filter(_._2 < m).map(_._3).sum
      val atOrBelow = xs.filter(_._2 <= m).map(_._3).sum
      assert(2 * below < tot && 2 * atOrBelow >= tot, s"$flag: $m")
    }
  }
}
