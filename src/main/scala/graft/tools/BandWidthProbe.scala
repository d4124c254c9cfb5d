package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupQueries

/** Wall-clock + candidate-count evidence for the engine-sized MinHash
  * band width ([[DedupQueries.autoMinhashRows]] — r13, the last
  * fixed-width index): a band of r minhashes collides for a random
  * pair with probability ~j₀^r, so FIXED r=2 makes candidate noise
  * quadratic in corpus size whenever the corpus has background
  * similarity (real corpora always do — boilerplate, shared phrasing),
  * while r = max(2, ⌈log₂(N/1280)⌉) keeps it linear.
  *
  * The probe corpus makes j₀ REAL and scale-invariant: every doc is 10
  * phrases drawn deterministically from a SHARED pool of 100 3-token
  * phrases, so any two docs share a phrase (= a 3-gram shingle) with
  * the same probability at every N — background similarity that
  * mirrors web-corpus boilerplate, unlike ScaleProbe's suffixed copies
  * (which deliberately ZERO cross-copy overlap and therefore cannot
  * show this wall). Measured surface = d3's full candidate → exact
  * Jaccard verify ([[DedupQueries.minhashPairsAt]]).
  *
  * Run: sbt "runMain graft.tools.BandWidthProbe 2000 1,10,40"
  */
object BandWidthProbe {

  /** Deterministic shared-phrase corpus: doc i = 10 of 100 phrases. */
  private def phraseDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n, 1, 32).select(col("id").as("doc_id"),
      expr("""array_join(transform(sequence(0, 9), k ->
          concat('a', CAST(abs(hash(id * 17 + k)) % 100 AS STRING),
                 ' b', CAST(abs(hash(id * 17 + k)) % 100 AS STRING),
                 ' c', CAST(abs(hash(id * 17 + k)) % 100 AS STRING))), ' ')""")
        .as("text"))

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val baseN = if (args.length > 0) args(0).toLong else 2000L
    val factors = (if (args.length > 1) args(1) else "1,10,40")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    factors.foreach { f =>
      val n = baseN * f
      val sh = DedupQueries.shinglesOf(phraseDocs(spark, n))
        .localCheckpoint(true)
      val rAuto = DedupQueries.autoMinhashRows(n)
      def wall(r: Int): Double =
        time(DedupQueries.minhashPairsAt(sh, r)
          .write.format("noop").mode("overwrite").save())
      def cands(r: Int): Long = DedupQueries.minhashCandidates(sh, r).count()
      wall(rAuto) // warm
      val fixedS = Seq.fill(2)(wall(2)).min
      val autoS = Seq.fill(2)(wall(rAuto)).min
      val (fixedC, autoC) = (cands(2), cands(rAuto))
      println(f"""{"probe":"band_width","factor":$f,"n":$n,"r_auto":$rAuto,""" +
        f""""fixed_candidates":$fixedC,"auto_candidates":$autoC,""" +
        f""""fixed_s":$fixedS%.3f,"auto_s":$autoS%.3f,""" +
        f""""fixed_over_auto":${fixedS / autoS}%.2f}""")
      sh.unpersist(blocking = true)
    }
    spark.stop()
  }
}
