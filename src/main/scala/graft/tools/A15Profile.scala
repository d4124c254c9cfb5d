package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ranks
import graft.sources.Tables

/** Stage-wall profile for a15 (r13 verdict ask #5 — adjudicate the
  * +24% untouched-code drift): splits the query into its two stages —
  * the octile-bounds selection ([[graft.operators.Ranks
  * .groupQuantilesDisc]], ~75% of the wall) and the final
  * bucket-assign scan (~25%) — and times each thrice. The r14 runs
  * showed per-run spread of the SAME stage up to ±25% (bounds
  * 1.2–2.1 s back-to-back on identical code/data), i.e. the kernel's
  * wall at the ~2 s grain carries noise larger than the r12→r13 driver
  * delta; an eager pin of the selection targets measured within that
  * noise (AQE stage reuse already shares the histogram shuffle across
  * the selection branches — the a15 plan has ONE FileScan). SCALE.md's
  * r14 note carries the numbers.
  *
  * Run: sbt "runMain graft.tools.A15Profile /root/testdata/sf0.1" */
object A15Profile {
  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = Tables.load(spark, d, "lineitem")
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    def qrows = Ranks.groupQuantilesDisc(li, Seq.empty, "cents", None,
      ps = (1 to 7).map(k => (k, 8)))
    def boundsDf = {
      val bAggs = (1 to 7).map(k =>
        max(when(col("_p_idx") === k - 1, col("cents"))).as(s"b$k"))
      qrows.agg(bAggs.head, bAggs.tail: _*)
    }
    def full = {
      val bounds = boundsDf
      val bucket = (1 to 7)
        .map(k => when(col("cents") > col(s"b$k"), 1).otherwise(0))
        .reduce(_ + _)
      li.crossJoin(broadcast(bounds))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("cents").as("lo_cents"), max("cents").as("hi_cents"))
        .orderBy("bucket")
    }
    // warm
    full.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      val sBounds = time(boundsDf.collect())
      val sFull = time(full.write.format("noop").mode("overwrite").save())
      // the final bucket-assign scan alone, with bounds PRE-COLLECTED
      // into literals (what a cached-bounds variant would pay)
      val b = boundsDf.collect().head
      val bucketLit = (1 to 7)
        .map(k => when(col("cents") > lit(b.getLong(k - 1)), 1).otherwise(0))
        .reduce(_ + _)
      val sAssign = time(li.withColumn("bucket", bucketLit)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("cents"), max("cents"))
        .orderBy("bucket")
        .write.format("noop").mode("overwrite").save())
      println(f"[a15] run$i bounds=$sBounds%.3f full=$sFull%.3f assignOnly=$sAssign%.3f")
    }
    spark.stop()
  }
}
