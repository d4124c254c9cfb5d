package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IndexStore, IvfIndex}
import graft.streaming.IndexedIngest

/** Centroid retrain CADENCE on a live corpus (r12 verdict ask #3):
  * the per-row sidecars ride the ingest rate (one O(batch) delta per
  * micro-batch — r11 ask #8), but centroids are a whole-corpus
  * statistic with no delta path, so any-change invalidation would
  * retrain full Lloyd per batch. [[IvfIndex.servedCentroidsAuto]]'s
  * staleness policy must make the composition sane: N micro-batches →
  * N per-row deltas but ≤1 centroid training run, with the SERVED
  * (stale) centroids still functioning as a correct index — routed
  * coverage complete, reported distances exact, and cell-gated
  * nearest-neighbor search landing in the true (brute-force) anchor
  * region — until growth crosses the threshold and ONE retrain
  * happens. */
class CentroidStalenessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 64

  /** plantedSkew's geometry: 4 far-apart anchors, deterministic
    * jitter; `anchor(id)` spreads ids round-robin. */
  private def vec(anchor: Int, jitter: Int): Array[Long] =
    Array.tabulate(dim) { d =>
      val base = if (d % 4 == anchor) 1000000L else 0L
      base + ((jitter * 31 + d * 7) % 997)
    }
  private def rows(ids: Range): Seq[(Long, Array[Long])] =
    ids.map(i => (i.toLong, vec(i % 4, i)))

  test("ingest composition: N micro-batches = N per-row deltas but <=1 " +
    "centroid retrain; stale centroids still serve correct search") {
    import spark.implicits._
    val dataDir = Files.createTempDirectory("graft_cent_stale").toString
    val src = MemoryStream[(Long, Array[Long])](spark)
    val docs = src.toDF().toDF("vec_id", "qv")
    // per-row index: squared norm (a row-decomposable derivation)
    def norms(df: DataFrame): DataFrame =
      df.select(col("vec_id"),
        expr("aggregate(qv, CAST(0 AS BIGINT), (a, x) -> a + x * x)").as("n2"))
    val q = IndexedIngest.start(docs, dataDir, "embeddings", "norms",
      s"$dataDir/ckpt")(norms)

    def corpus(): DataFrame =
      spark.read.parquet(s"$dataDir/embeddings.parquet")
        .select(col("vec_id"), col("qv"))
    def cents(): DataFrame =
      IvfIndex.servedCentroidsAuto(spark, dataDir, "embeddings", corpus(),
        rounds = 1, maxGrowFraction = 1.0)

    // batch 0: the training corpus (512 vectors)
    src.addData(rows(0 until 512): _*)
    q.processAllAvailable()
    val builds0 = IndexStore.buildsPerformed
    val trained = cents().collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(IndexStore.buildsPerformed == builds0 + 1, "first consumer trains")

    // batches 1..3: small appends — each pays a per-row DELTA, none a
    // centroid retrain (growth ~9% of trained bytes, under the 100%
    // budget)
    val deltas0 = IndexStore.incrementalAppends
    val stale0 = IndexStore.staleServes
    (1 to 3).foreach { b =>
      src.addData(rows(512 + (b - 1) * 16 until 512 + b * 16): _*)
      q.processAllAvailable()
      val served = cents().collect().map(r =>
        r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(served == trained,
        s"under-threshold growth must serve the TRAINED centroids (batch $b)")
    }
    assert(IndexStore.incrementalAppends == deltas0 + 3,
      "every micro-batch pays a per-row delta")
    assert(IndexStore.staleServes == stale0 + 3,
      "every under-threshold consumer serves stale")
    assert(IndexStore.buildsPerformed == builds0 + 1 + 3,
      "3 deltas, ZERO centroid retrains across the micro-batches")

    // stale centroids are still a CORRECT index over the grown corpus:
    // full routed coverage, exact distances, and cell-gated top-1
    // search landing in the brute-force anchor
    val all = corpus().collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    assert(all.size == 512 + 48)
    val assigned = IvfIndex.routeAssignAuto(corpus(), cents())
      .select("vec_id", "cell", "cell_dist2").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    assert(assigned.length == all.size, "every vector routed exactly once")
    val byCell = assigned.groupBy(_._2._1).map { case (c, vs) =>
      c -> vs.map(_._1).toSet
    }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val cellOf = assigned.toMap.map { case (vid, (c, _)) => vid -> c }
    // queries: the 48 POST-TRAINING vectors (the drift the stale
    // centroids must absorb)
    var recallable = 0
    var anchorHits = 0
    (512L until 560L).foreach { qid =>
      val qv = all(qid)
      val cand = byCell(cellOf(qid)) - qid
      if (cand.nonEmpty) {
        recallable += 1
        val top1 = cand.map(vid => (d2(qv, all(vid)), vid)).min._2
        val bf = (all.keySet - qid).map(vid => (d2(qv, all(vid)), vid)).min._2
        // anchors are 10^6 apart vs 997 jitter: same-anchor is the
        // correctness bar any ANN serving stack is graded on
        if (top1 % 4 == bf % 4) anchorHits += 1
      }
    }
    assert(recallable >= 40, s"only $recallable/48 drift queries had in-cell candidates")
    assert(anchorHits == recallable,
      s"cell-gated top-1 left the brute-force anchor: $anchorHits/$recallable")

    // a LARGE append (2x the trained bytes) crosses the budget: ONE
    // retrain, and the new centroids reflect the grown corpus state
    src.addData(rows(1000 until 2200): _*)
    q.processAllAvailable()
    q.stop()
    val buildsBefore = IndexStore.buildsPerformed
    val retrained = cents().collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(IndexStore.buildsPerformed == buildsBefore + 1,
      "over-threshold growth must retrain exactly once")
    assert(retrained != trained, "retraining must see the grown corpus")
    val again = cents().collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(again == retrained, "freshly retrained state serves warm")
    assert(IndexStore.buildsPerformed == buildsBefore + 1)
  }

  test("mutation of trained files always retrains — stale serving is " +
    "append-only territory") {
    import spark.implicits._
    val dataDir = Files.createTempDirectory("graft_cent_mutate").toString
    rows(0 until 256).toDF("vec_id", "qv")
      .coalesce(1).write.parquet(s"$dataDir/embeddings.parquet")
    def corpus(): DataFrame = spark.read.parquet(s"$dataDir/embeddings.parquet")
    def cents(): DataFrame =
      IvfIndex.servedCentroidsAuto(spark, dataDir, "embeddings", corpus(),
        rounds = 1, maxGrowFraction = 10.0) // growth budget effectively off
    val b0 = IndexStore.buildsPerformed
    cents().count()
    assert(IndexStore.buildsPerformed == b0 + 1)
    // REWRITE the corpus in place (same size — growth 0, but mutated)
    rows(0 until 256).map { case (id, v) => (id, v.map(_ + 3L)) }
      .toDF("vec_id", "qv")
      .coalesce(1).write.mode("overwrite").parquet(s"$dataDir/embeddings.parquet")
    cents().count()
    assert(IndexStore.buildsPerformed == b0 + 2,
      "an in-place rewrite invalidates the trained state regardless of growth")
  }
}
