package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hll
import graft.functions.HllSketch.{hll_distinct, hll_estimate, hll_merge, hll_sketch}

/** The HLL sketch aggregate: accuracy envelope, lossless merge (the
  * property that makes pre-aggregated rollups sound), small-range
  * exactness, and distributed-vs-local agreement. */
class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("small cardinalities are near-exact via linear counting") {
    import spark.implicits._
    // ~1 register collision is expected at n=100, m=4096 (birthday
    // bound n²/2m) — linear counting then reads one high: allow ±2
    val est = (1L to 100L).toDF("v")
      .agg(hll_distinct(col("v"))).head().getLong(0)
    assert(math.abs(est - 100L) <= 2, s"est=$est")
    // far below the collision regime it is exact
    val tiny = (1L to 12L).toDF("v")
      .agg(hll_distinct(col("v"))).head().getLong(0)
    assert(tiny == 12L)
  }

  test("100k distinct longs estimate within 3% at p=12") {
    import spark.implicits._
    val n = 100000L
    val est = spark.range(n).toDF("v")
      .agg(hll_distinct(col("v"))).head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.03, s"est=$est")
  }

  test("string inputs hash independently of integral inputs") {
    import spark.implicits._
    val est = (1 to 50000).map(i => s"user_$i").toDF("v")
      .agg(hll_distinct(col("v"))).head().getLong(0)
    assert(math.abs(est - 50000).toDouble / 50000 < 0.03, s"est=$est")
  }

  test("sketch union is lossless: merged halves equal the whole") {
    // register-level property, engine-free: max-merge of two sketches
    // must produce the identical register file (hence identical
    // estimate) as sketching the union stream directly
    val p = 12
    def sketchOf(vs: Range): Array[Byte] = {
      val regs = new Array[Byte](1 << p)
      vs.foreach(v => Hll.add(regs, p, Hll.mix64(v.toLong)))
      regs
    }
    val whole = sketchOf(1 to 80000)
    val merged = Hll.merge(sketchOf(1 to 50000), sketchOf(30001 to 80000))
    assert(merged.toSeq == whole.toSeq)
    assert(Hll.estimate(merged) == Hll.estimate(whole))
  }

  test("estimate is deterministic across partitionings") {
    import spark.implicits._
    val df1 = spark.range(60000).repartition(1).toDF("v")
    val df32 = spark.range(60000).repartition(32).toDF("v")
    val e1 = df1.agg(hll_distinct(col("v"))).head().getLong(0)
    val e32 = df32.agg(hll_distinct(col("v"))).head().getLong(0)
    assert(e1 == e32)
  }

  test("precision argument trades size for error") {
    import spark.implicits._
    val n = 100000L
    val coarse = spark.range(n).toDF("v")
      .agg(hll_distinct(col("v"), 8)).head().getLong(0)
    // p=8 → 256 registers → ~6.5% σ; just assert the envelope holds
    assert(math.abs(coarse - n).toDouble / n < 0.2, s"est=$coarse")
  }

  test("SQL registration through the extensions") {
    // spark.sql.extensions is a STATIC conf; build with
    // .withExtensions over the shared context and restore afterwards
    // (same pattern as GraftExtensionsSpec)
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-hll-ext")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val est = s.range(10000).selectExpr("hll_distinct(id) AS e").head().getLong(0)
      assert(math.abs(est - 10000).toDouble / 10000 < 0.05, s"est=$est")
      val est2 = s.range(200).selectExpr("hll_distinct(id, 14) AS e").head().getLong(0)
      assert(math.abs(est2 - 200L) <= 3, s"est=$est2") // LC regime, ±birthday collisions
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("blob rollup path equals the direct aggregate bit-for-bit") {
    import spark.implicits._
    // sketch per slice → merge blobs → estimate must equal hll_distinct
    // over the raw stream: the lossless-rollup contract e1 rides on
    val df = spark.range(80000)
      .select(col("id").as("v"), (col("id") % 7).as("slice"))
    val direct = df.agg(hll_distinct(col("v"))).head().getLong(0)
    val rolled = df.groupBy("slice").agg(hll_sketch(col("v")).as("sk"))
      .agg(hll_merge(col("sk")).as("sk"))
      .select(hll_estimate(col("sk"))).head().getLong(0)
    assert(rolled == direct, s"rolled=$rolled direct=$direct")
  }

  test("hll_merge rejects mixed sketch widths loudly") {
    import spark.implicits._
    val a = Seq(1L).toDF("v").agg(hll_sketch(col("v"), 8).as("sk"))
    val b = Seq(2L).toDF("v").agg(hll_sketch(col("v"), 12).as("sk"))
    val e = intercept[Exception] {
      a.union(b).agg(hll_merge(col("sk"))).collect()
    }
    assert(e.getMessage.contains("mixed sketch widths")
      || Option(e.getCause).exists(_.getMessage.contains("mixed sketch widths")),
      e.toString)
  }

  test("blob functions register through the extensions for SQL use") {
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-hll-blob-ext")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.range(30000).selectExpr("id % 5 AS slice", "id AS v")
        .createOrReplaceTempView("t")
      val out = s.sql(
        """SELECT hll_estimate(hll_merge(sk)) AS e FROM (
             SELECT slice, hll_sketch(v) AS sk FROM t GROUP BY slice)""")
        .head().getLong(0)
      assert(math.abs(out - 30000).toDouble / 30000 < 0.05, s"est=$out")
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("unsupported input types are rejected at analysis, not execution") {
    import spark.implicits._
    val e = intercept[Exception] {
      // analysis fires on plan resolution — collect() must not be needed,
      // but call it so a silently-resolved plan would also fail the test
      Seq(1.5, 2.5).toDF("v").agg(hll_distinct(col("v"))).collect()
    }
    assert(e.getMessage.contains("hll_distinct supports BIGINT/INT/STRING"), e.getMessage)
    assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException], e.getClass.toString)
  }

  test("nulls are ignored like builtin count distinct") {
    import spark.implicits._
    val est = Seq(Some(1L), None, Some(2L), None, Some(1L)).toDF("v")
      .agg(hll_distinct(col("v"))).head().getLong(0)
    assert(est == 2L)
  }
}
