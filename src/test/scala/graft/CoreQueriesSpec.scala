package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // Blanket plan discipline, enforced on EVERY query while the smoke
  // loop has the plan in hand anyway:
  //  - no CartesianProduct ever (a cross join must broadcast or band);
  //  - no Window fed by a single-partition exchange (the global-sort
  //    funnel w3/w4 were rewritten to avoid), except where the window
  //    provably runs over bounded input: an aggregated/limited frame
  //    or a literal-bounded filter.
  private val boundedGlobalWindowOk = Set(
    "sp8_temperature_mix", // window over the per-source aggregate (≤|sources| rows)
    "x21_nulls_order", // literal event_id < 200 bound — constant at any SF
    "e8_rolling_distinct", // window over the DAILY sketch aggregate (≤|days| rows)
    // global groupQuantilesDisc: cumulative window over the log-bucket
    // HISTOGRAM (≤16384 rows — bounded by the bucket encoding, never
    // by data); the grouped callers partition on their real group key
    "a15_equidepth_hist"
  )
  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs at sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materialize — throws on bad plans
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian in $name:\n$plan")
      if (!boundedGlobalWindowOk(name)) {
        plan.linesIterator.toSeq.sliding(2).foreach {
          case Seq(win, ex)
            if win.contains("Window") && ex.contains("SinglePartition") =>
            fail(s"unpartitioned window in $name:\n$win\n$ex")
          case _ => ()
        }
      }
    }
  }

  test("lag report classifies with reference thresholds") {
    val rows = SparkEntry.queries("j2_lag_synced")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("sync_status") == "SYNCED"))
    assert(rows.forall(_.getAs[String]("efficiency_band") == "near real-time"))
  }

  test("globalNtile matches SQL ntile() bit-for-bit across sizes and remainders") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (n <- Seq(1L, 2L, 3L, 7L, 100L, 101L, 1000L); k <- Seq(2, 3, 7)) {
      // strictly increasing, unevenly spaced order values
      val df = spark.range(n).selectExpr("id * (id + 3) AS v", "id AS payload")
      val expected = df
        .withColumn("tile", ntile(k).over(Window.orderBy("v")))
        .select("v", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val actual = operators.CoreQueries.globalNtile(df, "v", k, buckets = 8)
        .select("v", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(actual == expected, s"n=$n k=$k")
    }
  }

  test("next-key allocation null→1 on empty input") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("o_orderkey")
    val next = empty.agg(coalesce((max("o_orderkey") + 1).cast("long"), lit(1L)).as("next_id"))
      .collect().head.getLong(0)
    assert(next == 1L)
  }
}
