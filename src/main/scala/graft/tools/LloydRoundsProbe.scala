package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, SimilarityQueries}

/** Inertia-vs-rounds evidence for the hard-coded 2 Lloyd rounds (r13
  * verdict ask #7): at each scale factor, train the IVF centroids with
  * 0..4 rounds (0 = the first-k init, the floor every round improves
  * on) at the ENGINE stride, then measure
  *
  *  - `inertia`: the exact routed-assignment SSE over the FULL corpus
  *    (sum of [[IvfIndex.routeAssign]]'s integer `cell_dist2`, summed
  *    as decimal(38,0) — per-row dist² ≈ 2.6e14 would overflow an
  *    int64 sum at ~35k rows), i.e. the quality of the geometry the
  *    engine actually serves;
  *  - `train_s`: the wall the cold build pays for those rounds.
  *
  * The question the row answers: where does the inertia curve flatten
  * relative to its per-round training cost? If round 3 still buys a
  * material SSE drop at ×100, the constant 2 is wrong and rounds
  * should become a sized rule like every other knob; if the curve is
  * flat past 2, the constant is justified with a measured artifact
  * instead of an assertion.
  *
  * Corpus: AssignProbe's embeddings-only scaled copies
  * (signed-permutation decorrelated — the probe measures the plan, not
  * duplicated similarity structure).
  *
  * Run:
  *   sbt "runMain graft.tools.LloydRoundsProbe /root/testdata/sf0.1 /tmp/graft_assign 10,100"
  */
object LloydRoundsProbe {

  private def quantized(s: SparkSession, d: String): DataFrame =
    graft.sources.Tables.load(s, d, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft_assign"
    val factors = (if (args.length > 2) args(2) else "10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    factors.foreach { f =>
      val dir =
        if (f == 1) src
        else { AssignProbe.buildScaled(spark, src, s"$work/x$f", f); s"$work/x$f" }
      val v = quantized(spark, dir).localCheckpoint(true)
      val n = v.count()
      val k = SimilarityQueries.autoCells(n)
      val kc = IvfIndex.autoCoarseCells(k)
      val stride = IvfIndex.trainStride(n, k)
      IvfIndex.lloydCentroids(v, k, rounds = 1, stride = stride).count() // warm
      val rows = (0 to 4).map { r =>
        val t0 = System.nanoTime()
        val cents = IvfIndex.lloydCentroids(v, k, rounds = r, stride = stride)
          .localCheckpoint(true)
        val trainS = (System.nanoTime() - t0) / 1e9
        val inertia = IvfIndex.routeAssign(v, cents, kc)
          .agg(sum(col("cell_dist2").cast("decimal(38,0)")).as("sse"))
          .head().getDecimal(0)
        cents.unpersist(blocking = true)
        (r, trainS, new java.math.BigDecimal(inertia.toBigInteger))
      }
      val base = rows.head._3 // round-0 (init) inertia: the floor's scale
      def rel(x: java.math.BigDecimal): Double =
        if (base.signum() == 0) 1.0
        else x.divide(base, 6, java.math.RoundingMode.HALF_UP).doubleValue()
      println(f"""{"probe":"lloyd_rounds","factor":$f,"n":$n,"k":$k,"kc":$kc,"stride":$stride,""" +
        rows.map { case (r, t, sse) =>
          f""""r$r":{"train_s":$t%.3f,"inertia":$sse,"vs_init":${rel(sse)}%.4f}"""
        }.mkString(",") + "}")
      v.unpersist(blocking = true)
    }
    spark.stop()
  }
}
