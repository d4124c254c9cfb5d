package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranks

/** [[Ranks.groupQuantilesDisc]] — the no-value-buffer exact
  * percentile_disc. Bit-equality with the ordered-set aggregate on
  * uniform, skewed, duplicate-heavy and tiny inputs (grouped, global,
  * and weighted), plus the plan discipline: every window in the plan
  * is partitioned (bucket-bounded) — never a whole-group sort. */
class GroupQuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val octiles = (1 to 7).map(k => (k, 8))

  private def discOracle(df: org.apache.spark.sql.DataFrame,
      groupCol: String, valueCol: String): Map[(Int, Int), Long] = {
    val pcts = octiles.map { case (n0, d0) => n0.toDouble / d0 }.mkString(", ")
    df.groupBy(col(groupCol))
      .agg(expr(s"percentile_disc(array($pcts)) WITHIN GROUP (ORDER BY $valueCol)")
        .as("bs"))
      .select(col(groupCol) +: octiles.indices.map(i =>
        expr(s"CAST(bs[$i] AS BIGINT)").as(s"p$i")): _*)
      .collect()
      .flatMap(r => octiles.indices.map(i => (r.getInt(0), i) -> r.getLong(i + 1)))
      .toMap
  }

  private def ours(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], valueCol: String,
      weightCol: Option[String] = None): Map[(Int, Int), Long] =
    Ranks.groupQuantilesDisc(df, groupCols, valueCol, weightCol, octiles)
      .collect()
      .map(r => (if (groupCols.isEmpty) 1 else r.getAs[Int](groupCols.head),
        r.getAs[Int]("_p_idx")) -> r.getAs[Long](valueCol))
      .toMap

  test("matches percentile_disc bit-for-bit: uniform, skewed, duplicates, tiny") {
    import spark.implicits._
    val uniform = spark.range(10007)
      .select((col("id") % 3).cast("int").as("g"),
        ((col("id") * 2654435761L) % 100000L).as("v"))
    assert(ours(uniform, Seq("g"), "v") == discOracle(uniform, "g", "v"))

    // heavy duplicates: 90% of rows share one value (degenerate-bucket
    // path must fire and still agree)
    val dupes = spark.range(5000)
      .select(lit(1).as("g"),
        when(col("id") % 10 =!= 0, 7777L).otherwise(col("id")).as("v"))
    assert(ours(dupes, Seq("g"), "v") == discOracle(dupes, "g", "v"))

    // exponential-ish skew: values cluster at the low end
    val skewed = spark.range(8000)
      .select(lit(1).as("g"), (col("id") * col("id") % 1000000L).as("v"))
    assert(ours(skewed, Seq("g"), "v") == discOracle(skewed, "g", "v"))

    // tiny groups (n < buckets) and n = 1
    val tiny = Seq((1, 5L), (1, 3L), (1, 9L), (2, 42L)).toDF("g", "v")
    assert(ours(tiny, Seq("g"), "v") == discOracle(tiny, "g", "v"))
  }

  test("global (no group) spelling agrees too") {
    val df = spark.range(9001)
      .select(((col("id") * 48271L) % 65536L).as("v"))
    val got = ours(df, Seq.empty, "v")
    val want = discOracle(df.withColumn("g", lit(1)), "g", "v")
    assert(got == want)
  }

  test("weighted selection equals percentile_disc over the expanded stream") {
    import spark.implicits._
    val wdf = Seq(
      (1, 10L, 3L), (1, 20L, 1L), (1, 30L, 6L), (1, 40L, 2L),
      (2, 5L, 1L), (2, 6L, 1L)).toDF("g", "v", "w")
    // expand each row `w` times and run the unweighted oracle on it
    val expanded = wdf.withColumn("e", explode(sequence(lit(1L), col("w"))))
      .select("g", "v")
    val want = discOracle(expanded, "g", "v")
    val got = ours(wdf, Seq("g"), "v", weightCol = Some("w"))
    assert(got == want)
    // weighted-median read: smallest v whose cumulative weight crosses
    // half the total (a16's predicate) equals the (1,2) slot
    val med = ours(wdf, Seq("g"), "v", Some("w"))
    assert(med((1, octiles.indexOf((4, 8)))) == 30L) // cum 3,4,10 of 12 → 30
  }

  test("negative and mixed-sign values: log-bucket reflection stays monotone") {
    val df = spark.range(6000)
      .select(lit(1).as("g"), (col("id") * 37L % 5000L - 2500L).as("v"))
    assert(ours(df, Seq("g"), "v") == discOracle(df, "g", "v"))
    // extremes: values straddling octave boundaries and Long extremes
    import spark.implicits._
    val edges = Seq(Long.MinValue, -129L, -128L, -2L, -1L, 0L, 1L, 127L,
      128L, 255L, 256L, Long.MaxValue).map((1, _)).toDF("g", "v")
    assert(ours(edges, Seq("g"), "v") == discOracle(edges, "g", "v"))
  }

  test("result is invariant to input partitioning") {
    val base = spark.range(20000)
      .select((col("id") % 4).cast("int").as("g"),
        ((col("id") * 2654435761L) % 50000L).as("v"))
    val r1 = ours(base.repartition(1), Seq("g"), "v")
    val r32 = ours(base.repartition(32), Seq("g"), "v")
    assert(r1 == r32)
  }

  test("no whole-group value sort: windows run on histogram rows or one bucket") {
    val df = spark.range(50000).select(lit(1).as("g"), (col("id") % 9973L).as("v"))
    val q = Ranks.groupQuantilesDisc(df, Seq("g"), "v", None, octiles)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toList
    assert(windows.nonEmpty, plan)
    // every window either partitions on the bucket key (selection
    // pass) or aggregates histogram weights (_bw — frame bounded by
    // the log-bucket range); a window sorting raw values over a whole
    // group would contain neither
    windows.foreach(wl =>
      assert(wl.contains("_bkt") || wl.contains("_bw"),
        s"whole-group window:\n$wl"))
  }

  test("continuous quartiles (x4 integers) match percentile() exactly: " +
    "uniform, duplicates, tiny, n=1") {
    import spark.implicits._
    def contOracle(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      df.groupBy(col("g"))
        .agg(expr("percentile(v, array(0.25, 0.5, 0.75))").as("qs"))
        .select(col("g") +: (0 to 2).map(i =>
          expr(s"CAST(round(qs[$i] * 4) AS BIGINT)").as(s"q$i")): _*)
        .collect()
        .flatMap(r => (0 to 2).map(i => (r.getInt(0), i) -> r.getLong(i + 1)))
        .toMap
    def oursCont(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      Ranks.groupQuartilesCont(df, Seq("g"), "v").collect()
        .map(r => (r.getAs[Int]("g"), r.getAs[Int]("_p_idx")) ->
          r.getAs[Long]("v_x4"))
        .toMap

    val uniform = spark.range(10007)
      .select((col("id") % 3).cast("int").as("g"),
        ((col("id") * 2654435761L) % 100000L).as("v"))
    assert(oursCont(uniform) == contOracle(uniform))

    val dupes = spark.range(5000)
      .select(lit(1).as("g"),
        when(col("id") % 10 =!= 0, 7777L).otherwise(col("id")).as("v"))
    assert(oursCont(dupes) == contOracle(dupes))

    // even n (interpolation halves) and tiny/odd groups incl. n = 1:
    // the bracketing statistics coincide where h is integral and the
    // fraction term must vanish
    val tiny = Seq((1, 5L), (1, 3L), (1, 9L), (1, 20L),
      (2, 42L), (3, 4L), (3, 8L)).toDF("g", "v")
    assert(oursCont(tiny) == contOracle(tiny))
  }
}
