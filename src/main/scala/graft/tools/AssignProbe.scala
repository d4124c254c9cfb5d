package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExprs.dot_long
import graft.operators.{IvfIndex, SimilarityQueries}
import graft.sources.Tables

/** Wall-clock evidence for the two-level ROUTER (r11 verdict ask #2's
  * done-criterion, still open after r12): time FLAT nearest-centroid
  * assignment (crossJoin(broadcast(cents)) + per-vector window — the
  * pre-r12 design, N·k dots and a k-row broadcast) against ROUTED
  * assignment ([[IvfIndex.routeAssign]] — N·(kc + ~k/kc) dots with a
  * √k-row broadcast) on the same learned centroids, across scale
  * factors. The claim under test: flat work grows ~N²/256 (k tracks
  * N), routed ~N^1.5/16 — so flat/routed walls must DIVERGE with the
  * factor, and the routed wall per vector must stay near-flat.
  *
  * Also re-times Lloyd training (full stride-1 vs engine stride) per
  * factor: TrainProbe's sf0.1-scale walls are fixed-cost-dominated
  * (~2 s of job scheduling per round hides the per-row work); at
  * factor 100 the per-row assignment work dominates and the ~4×
  * training-input reduction becomes visible.
  *
  * Corpus: embeddings-only scaled copies built with ScaleProbe's
  * signed-permutation recipe (ScaleProbe.scala:116–146 — orthogonal
  * transform per copy: within-copy geometry exact, cross-copy
  * decorrelated), so the probe measures the PLAN, not duplicated
  * similarity structure.
  *
  * Run:
  *   sbt "runMain graft.tools.AssignProbe /root/testdata/sf0.1 /tmp/graft_assign 1,10,100"
  */
object AssignProbe {

  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))

  /** Embeddings-only `factor`× copy (ScaleProbe's builder, minus the
    * other tables — this probe never reads them; LloydRoundsProbe
    * shares the corpus). */
  private[tools] def buildScaled(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    if (new java.io.File(s"$out/embeddings.parquet").exists()) return
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    val span = base.agg(max("vec_id")).collect().head.getLong(0) + 1
    (0 until factor).map { k =>
      val shift = (k * 7) % 64
      base.select(
        (col("vec_id") + lit(k * span)).as("vec_id"),
        (if (k == 0) col("embedding")
         else expr(
           s"""transform(sequence(0, 63), i ->
               CAST(element_at(embedding, ((i + $shift) % 64) + 1) *
                 (CASE WHEN (i * 2654435761L + $k * 97) % 4 = 0
                       THEN -1.0 ELSE 1.0 END) AS FLOAT))"""))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    System.err.println(s"[assign] built ${factor}x embeddings at $out")
  }

  private def dist2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    dot_long(a, a) - lit(2L) * dot_long(a, b) + dot_long(b, b)

  /** The pre-r12 flat assignment: every vector scores every centroid. */
  private def flatAssign(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), dist2(col("qv"), col("cv")).as("d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft_assign"
    val factors = (if (args.length > 2) args(2) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    factors.foreach { f =>
      val dir = if (f == 1) src else { buildScaled(spark, src, s"$work/x$f", f); s"$work/x$f" }
      val v = quantized(spark, dir).localCheckpoint(true)
      val n = v.count()
      val k = SimilarityQueries.autoCells(n)
      val kc = IvfIndex.autoCoarseCells(k)
      val stride = IvfIndex.trainStride(n, k)
      // training walls, full vs engine stride (min of 2 after a warm)
      def train(s: Long): Double =
        time(IvfIndex.lloydCentroids(v, k, rounds = 2, stride = s).count())
      train(stride) // warm
      val trainFull = Seq.fill(2)(train(1L)).min
      val trainSampled = Seq.fill(2)(train(stride)).min
      val cents = IvfIndex.lloydCentroids(v, k, rounds = 2, stride = stride)
        .localCheckpoint(true)
      // assignment walls on the SAME centroids (min of 2 after a warm)
      def routed(): Double =
        time(IvfIndex.routeAssign(v, cents, kc)
          .select("vec_id", "cell").write.format("noop").mode("overwrite").save())
      def flat(): Double =
        time(flatAssign(v, cents)
          .write.format("noop").mode("overwrite").save())
      routed(); flat() // warm both arms
      val routedS = Seq.fill(2)(routed()).min
      val flatS = Seq.fill(2)(flat()).min
      println(f"""{"probe":"assign","factor":$f,"n":$n,"k":$k,"kc":$kc,"stride":$stride,""" +
        f""""flat_dots":${n * k},"routed_dots":${n * (kc + (k + kc - 1) / kc)},""" +
        f""""flat_s":$flatS%.3f,"routed_s":$routedS%.3f,""" +
        f""""flat_over_routed":${flatS / routedS}%.2f,""" +
        f""""train_full_s":$trainFull%.3f,"train_sampled_s":$trainSampled%.3f,""" +
        f""""train_ratio":${trainSampled / trainFull}%.2f}""")
      v.unpersist(blocking = true)
      cents.unpersist(blocking = true)
    }
    spark.stop()
  }
}
