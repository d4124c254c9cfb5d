package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for e5/x20/x21 beyond their DuckDB oracles:
  *
  *  - e5: every inclusion–exclusion estimate lands in its bracket
  *    (hll_ok all true — the oracle hashes the booleans, this spec
  *    makes the failure readable), and exact intersections respect
  *    |A∩B| ≤ min(|A|, |B|)
  *  - x21: NULLS FIRST actually bites — the ranking leads with the
  *    null keys, so a DuckDB NULLS-LAST default would hash-mismatch
  *    rather than silently agree
  */
class SetopsUnpivotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("e5: all brackets hold; intersections bounded by the smaller set") {
    val rows = SparkEntry.queries("e5_hll_setops")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4), s"bracket violated: ${rows.filterNot(_._4).toSeq}")
    val perType = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (ta, tb, inter, _) =>
      val bound = math.min(perType(ta).size, perType(tb).size)
      assert(inter <= bound && inter == (perType(ta) intersect perType(tb)).size,
        s"($ta, $tb): $inter")
    }
  }

  test("x21: null keys rank first (the cross-engine default divergence the pin exists for)") {
    val rows = SparkEntry.queries("x21_nulls_order")(spark, sf).collect()
      .map(r => (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2)))
    val nNulls = rows.count(_._1.isEmpty)
    assert(nNulls > 0, "the first 200 events should contain values > 250")
    assert(rows.sortBy(_._2).take(nNulls).forall(_._1.isEmpty),
      "all null keys must rank before every non-null key")
  }

  test("x20: long form carries 3 metrics per priority") {
    val rows = SparkEntry.queries("x20_unpivot")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byP = rows.groupBy(_._1)
    assert(byP.nonEmpty)
    byP.foreach { case (p, ms) =>
      assert(ms.map(_._2).toSet == Set("n", "sum_cents", "max_cents"), s"$p: $ms")
    }
  }
}
