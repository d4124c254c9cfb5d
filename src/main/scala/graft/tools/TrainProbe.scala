package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, SimilarityQueries}
import graft.sources.Tables

/** Wall-clock evidence for the bounded training sample
  * ([[graft.operators.IvfIndex.trainStride]]): time the 2-round Lloyd
  * training (the cost a cold [[IvfIndex.servedCentroids]] build pays)
  * with stride 1 (full-corpus training, the pre-r12 behavior) vs the
  * engine stride (~64 vectors/cell) on a base corpus and a 10× one.
  * The claim under test: with the occupancy-ruled k the stride is a
  * constant 4, so sampled training does a fixed quarter of the
  * full-corpus training work at EVERY scale — the ratio of the two
  * walls should hold (or widen, as fixed costs shrink relative to
  * work) as the corpus grows.
  *
  * Run (dirs must hold an embeddings.parquet; the second is typically
  * ScaleProbe's derived 10× output):
  *   sbt "runMain graft.tools.TrainProbe /root/testdata/sf0.1 /tmp/graft_scale_x10"
  */
object TrainProbe {
  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))

  /** Train to completion (count() forces every round's checkpoint). */
  private def time(v: DataFrame, k: Long, stride: Long): Double = {
    val t0 = System.nanoTime()
    IvfIndex.lloydCentroids(v, k, rounds = 2, stride = stride).count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val v = quantized(spark, dir).localCheckpoint(true) // pin the input once: both arms pay sampling+training only
      val n = v.count()
      val k = SimilarityQueries.autoCells(n)
      val stride = IvfIndex.trainStride(n, k)
      time(v, k, stride) // warm (codegen/shuffle setup)
      val full = Seq.fill(2)(time(v, k, 1L)).min
      val sampled = Seq.fill(2)(time(v, k, stride)).min
      println(f"""{"probe":"train","dir":"$dir","n":$n,"k":$k,"stride":$stride,""" +
        f""""train_rows":${(n + stride - 1) / stride},""" +
        f""""full_s":$full%.3f,"sampled_s":$sampled%.3f,""" +
        f""""ratio":${sampled / full}%.2f}""")
    }
    spark.stop()
  }
}
