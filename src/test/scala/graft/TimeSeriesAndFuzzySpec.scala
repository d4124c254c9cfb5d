package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextQueries, TimeSeriesQueries}

/** Targeted properties for the round-5 operators beyond the oracle
  * gate: the fuzzy-match banding must be COMPLETE (no lev≤1 pair can
  * escape candidate generation) and the calendar gap-fill must
  * reinstate empty days as explicit zeros. */
class TimeSeriesAndFuzzySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("t10 half-banding is complete: equals brute-force lev<=1 pairs") {
    import spark.implicits._
    val banded = SparkEntry.queries("t10_edit_distance")(spark, sf)
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    // brute force over the same bounded slice
    val names = graft.sources.Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") < 150)
      .select("c_custkey", "c_name").as[(Long, String)].collect()
    val brute = (for {
      (ak, an) <- names; (bk, bn) <- names
      if ak < bk && an.length == bn.length
      if an.zip(bn).count { case (x, y) => x != y } <= 1
    } yield (ak, bk)).toSet
    assert(banded == brute)
  }

  test("t10 finds a planted one-substitution pair") {
    // sanity on real data: keys 1 and 2 differ by one digit
    val pairs = SparkEntry.queries("t10_edit_distance")(spark, sf)
      .filter(col("a_key") === 1 && col("b_key") === 2)
    assert(pairs.count() == 1)
  }

  test("ts1 emits a dense (type x day) grid with explicit zeros") {
    val out = SparkEntry.queries("ts1_gap_fill")(spark, sf)
    val types = out.select("event_type").distinct().count()
    val days = out.select("day").distinct().count()
    assert(out.count() == types * days, "grid must be complete")
    // sparse threshold guarantees at least one zero cell at sf0.001
    assert(out.filter(col("n") === 0).count() > 0)
    assert(out.filter(col("n").isNull).count() == 0)
  }

  test("ts2 cohort offsets start at zero for every cohort") {
    val out = SparkEntry.queries("ts2_retention")(spark, sf)
    val cohorts = out.select("cohort_week").distinct().count()
    val zeroRows = out.filter(col("week_offset") === 0).count()
    assert(cohorts == zeroRows, "every cohort is active in its own week")
  }

  test("x11/x12 json extraction agrees with a direct parse") {
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    assert(ev.filter(col("k").isNull).count() == 0, "every props payload has k")
    val total = ev.agg(sum("k")).head.getLong(0)
    val viaQuery = SparkEntry.queries("x11_json_agg")(spark, sf)
      .agg(sum("sum_k")).head.getLong(0)
    assert(total == viaQuery)
  }
}
