package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LogHist
import graft.functions.LogHist.{lb_hist, lb_merge, lb_quantile}
import graft.streaming.EventWindows

/** The log-bucket quantile histogram: the integer-exact accuracy
  * bracket (est ≤ exact ≤ est + est div 64 + 1), blob-rollup
  * losslessness, partitioning invariance, and streaming batch/stream
  * agreement. */
class LogHistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def exactDisc(vs: Seq[Long], num: Long, den: Long): Long = {
    val sorted = vs.sorted
    val rank = math.max(1L, (num * vs.length + den - 1) / den)
    sorted((rank - 1).toInt)
  }

  test("bracket contract holds on uniform, skewed, and tiny inputs") {
    import spark.implicits._
    val shapes: Seq[Seq[Long]] = Seq(
      (1L to 10000L).map(i => (i * 2654435761L) % 1000000L),  // uniform-ish
      (1L to 5000L).map(i => i * i % 97L),                    // low duplicates
      Seq(5L, 3L, 9L),                                        // tiny (singleton buckets)
      (1L to 3000L).map(i => 1L << (i % 40))                  // octave boundaries
    )
    for (vs <- shapes; (num, den) <- Seq((1L, 2L), (3L, 4L), (15L, 16L))) {
      val blob = vs.toDF("v").agg(lb_hist(col("v")))
        .head().getAs[Array[Byte]](0)
      val est = LogHist.quantile(blob, num, den)
      val exact = exactDisc(vs, num, den)
      assert(est <= exact && exact <= est + est / 64 + 1,
        s"est=$est exact=$exact p=$num/$den n=${vs.length}")
    }
  }

  test("values below 128 read back exactly (singleton buckets)") {
    import spark.implicits._
    val vs = (0L until 128L) ++ (0L until 128L)
    val blob = vs.toDF("v").agg(lb_hist(col("v"))).head().getAs[Array[Byte]](0)
    for ((num, den) <- Seq((1L, 4L), (1L, 2L), (3L, 4L)))
      assert(LogHist.quantile(blob, num, den) == exactDisc(vs, num, den))
  }

  test("blob rollup equals the direct aggregate bit-for-bit; partition-invariant") {
    val df = spark.range(60000)
      .select(((col("id") * 48271L) % 500000L).as("v"), (col("id") % 9).as("slice"))
    val direct = df.agg(lb_hist(col("v"))).head().getAs[Array[Byte]](0)
    val rolled = df.groupBy("slice").agg(lb_hist(col("v")).as("h"))
      .agg(lb_merge(col("h"))).head().getAs[Array[Byte]](0)
    // same sparse map → same quantile at every read point
    for ((num, den) <- Seq((1L, 16L), (1L, 2L), (15L, 16L)))
      assert(LogHist.quantile(rolled, num, den) == LogHist.quantile(direct, num, den))
    val p1 = df.repartition(1).agg(lb_hist(col("v"))).head().getAs[Array[Byte]](0)
    val p32 = df.repartition(32).agg(lb_hist(col("v"))).head().getAs[Array[Byte]](0)
    assert(LogHist.quantile(p1, 1, 2) == LogHist.quantile(p32, 1, 2))
  }

  test("SQL registration through the extensions") {
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-lbhist-ext")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.range(10000).selectExpr("id % 7 AS slice", "id * 31 % 40000 AS v")
        .createOrReplaceTempView("t")
      val est = s.sql(
        """SELECT lb_quantile(lb_merge(h), 1, 2) AS p50 FROM (
             SELECT slice, lb_hist(v) AS h FROM t GROUP BY slice)""")
        .head().getLong(0)
      // p50 of ~uniform [0, 40000): bracket around 20000 within 1/64
      assert(est >= 18000 && est <= 21000, s"p50=$est")
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("streaming windowed quantiles merge across micro-batches like one batch") {
    import spark.implicits._
    def t(min: Long) = new Timestamp(1700000000000L + min * 60000)
    def ev(min: Long, v: Double) = (t(min), v)
    val b1 = (1 to 200).map(i => ev(5, i * 1.0))
    val b2 = (201 to 600).map(i => ev(30, i * 1.0)) // same window as b1
    val b3 = (1 to 300).map(i => ev(70, i * 3.0))   // next window
    val all = (b1 ++ b2 ++ b3).toDF("ts", "value")

    val stream = MemoryStream[(Timestamp, Double)](spark)
    val q = EventWindows.valueQuantilesLbHist(
        stream.toDF().toDF("ts", "value"), withWatermarkCol = true)
      .writeStream.outputMode("complete")
      .format("memory").queryName("lbq_out").start()
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    stream.addData(b3: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("lbq_out").orderBy("window_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = EventWindows.valueQuantilesLbHist(all).orderBy("window_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // window 0: values 1000..600000 milli — p50 bracket near 300000
    val (_, p50, _) = streamed.head
    val exact = exactDisc((1 to 600).map(_ * 1000L), 1, 2)
    assert(p50 <= exact && exact <= p50 + p50 / 64 + 1, s"p50=$p50 exact=$exact")
  }
}
