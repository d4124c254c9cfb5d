package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-7 data-quality additions beyond their DuckDB
  * oracles:
  *
  *  - dq3_benford: exact integer replica of digit counts, 4-dp
  *    half-up percentages, and the χ² contributions — plus the
  *    invariant that the Benford expectations themselves sum to ~100%
  *  - dq4_schema_drift: exact replica of the midpoint split and both
  *    halves' per-type shares / integer-micro means
  *
  * Both queries are all-integer until one final IEEE division, so the
  * replicas compare with == (no tolerance anywhere).
  */
class DriftBenfordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val b4 = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
    4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
    9 -> 45757L)

  test("dq3: exact integer Benford replica matches (digit, n, pct, chi2)") {
    val cents = graft.sources.Tables.load(spark, sf, "orders")
      .select("o_totalprice").collect()
      .map(r => math.round(r.getDouble(0) * 100))
    val counts = cents.map(_.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val expected = counts.keys.toSeq.sorted.map { dig =>
      val n = counts(dig)
      val pct4 = (2 * n * 1000000 + total) / (2 * total)
      val dev = pct4 - b4(dig)
      (dig, n, pct4.toDouble / 10000, b4(dig).toDouble / 10000,
        (dev * dev).toDouble / (b4(dig) * 10000).toDouble)
    }
    val got = SparkEntry.queries("dq3_benford")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == total)
  }

  test("dq3: pinned Benford constants are a proper distribution") {
    // 4-dp truncation loses at most 9 * 0.5e-4 in percentage points
    val sum = b4.values.sum
    assert(sum >= 999996L && sum <= 1000000L, s"b4 sum = $sum")
  }

  test("dq4: exact midpoint-split replica matches shares, drift and means") {
    val rows = graft.sources.Tables.events(spark, sf)
      .select("event_type", "ts_ns", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1000000)))
    val mid = (rows.map(_._2).min + rows.map(_._2).max) / 2
    val (a, b) = rows.partition(_._2 <= mid)
    val (ta, tb) = (a.length.toLong, b.length.toLong)
    val types = rows.map(_._1).distinct.sorted
    val expected = types.map { t =>
      val ga = a.filter(_._1 == t); val gb = b.filter(_._1 == t)
      val (na, nb) = (ga.length.toLong, gb.length.toLong)
      val pa4 = (2 * na * 1000000 + ta) / (2 * ta)
      val pb4 = (2 * nb * 1000000 + tb) / (2 * tb)
      (t, na, nb, pa4.toDouble / 10000, pb4.toDouble / 10000,
        math.abs(pa4 - pb4).toDouble / 10000,
        ga.map(_._3).sum / na, gb.map(_._3).sum / nb)
    }
    val got = SparkEntry.queries("dq4_schema_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected.toSeq)
    // both halves are non-degenerate: the midpoint split saw real data
    assert(ta > 0 && tb > 0)
  }

  test("dq4 plan: conditional aggregate over one scan per pass — no join on events") {
    val plan = SparkEntry.queries("dq4_schema_drift")(spark, sf)
      .queryExecution.executedPlan.toString
    // the split point and totals arrive as broadcast scalars; the only
    // joins are 1-row cross combines, never an equi-join on event rows
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
  }
}
