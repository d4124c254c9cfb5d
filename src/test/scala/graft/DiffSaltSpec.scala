package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Pins for cdc_snapshot_diff and j9_salted_agg beyond their DuckDB
  * oracles:
  *
  *  - cdc_snapshot_diff: exact replica of the two converged states and
  *    the per-class rollup at sf0.01 (where the feed actually crosses
  *    the snapshot boundary, so added/updated/unchanged all occur)
  *  - j9_salted_agg: the salted physical plan must equal the PLAIN
  *    join bit-for-bit, and repeat runs must agree even though the
  *    salt column is drawn from rand() — the semantics-free property
  *    that justifies swapping salting in under a hot key
  */
class DiffSaltSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("cdc_snapshot_diff: converged-state replica matches the class rollup (sf0.01)") {
    val sf = "/root/testdata/sf0.01"
    val rows = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.round(r.getDouble(3) * 100)))
    def state(xs: Array[(Long, Long, String, Long)]): Map[Long, (Long, Long)] =
      xs.groupBy(_._1).flatMap { case (uid, es) =>
        val last = es.maxBy(_._2)
        if (last._3 == "error") None else Some(uid -> (last._2, last._4))
      }
    val y = state(rows.filter(_._2 < 5000))
    val t = state(rows)
    val classes = (y.keySet ++ t.keySet).toSeq.map { uid =>
      val (yv, tv) = (y.get(uid), t.get(uid))
      val cls = (yv, tv) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some((yl, _)), Some((tl, _))) if tl != yl => "updated"
        case _ => "unchanged"
      }
      val vc = (yv, tv) match {
        case (Some((_, yc)), Some((_, tc))) => yc != tc
        case _ => false
      }
      (cls, uid, vc)
    }
    val expected = classes.groupBy(_._1).map { case (cls, xs) =>
      (cls, xs.length.toLong, xs.count(_._3).toLong, xs.map(_._2).min)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("cdc_snapshot_diff")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the sf0.01 feed crosses the boundary: the tail must have
    // produced both fresh keys and advanced existing ones
    val present = got.map(_._1).toSet
    assert(present.contains("added") && present.contains("updated"), present)
  }

  test("j9: salted join equals the plain join exactly, run-to-run stable despite rand()") {
    val sf = "/root/testdata/sf0.001"
    def plain = {
      val li = graft.sources.Tables.load(spark, sf, "lineitem")
      val supp = graft.sources.Tables.load(spark, sf, "supplier")
      val nation = graft.sources.Tables.load(spark, sf, "nation")
      li.join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(nation, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))) / lit(10000.0))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    }
    def salted = SparkEntry.queries("j9_salted_agg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val s1 = salted
    assert(s1 == plain)
    assert(salted == s1, "salted join must be run-to-run deterministic")
  }
}
