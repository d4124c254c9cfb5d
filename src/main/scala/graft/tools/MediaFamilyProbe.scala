package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** m8/m9 scale probe with CONTROLLED duplicate-family cardinality
  * (r12 verdict ask #5): the r11 probe scaled the corpus by copying
  * doc_ids while the family key stayed `doc_id % 97` — so a ×10 corpus
  * had the SAME 97 families at ×10 size, within-family pairs grew
  * ×100 by construction, and the measured 4.31×/3.38× ratios priced
  * the synthetic data, not the banded plan. This probe pins family
  * SIZE and scales family COUNT (famMod = base·factor — real corpora
  * grow this way: duplication is bounded by actual copying), and also
  * re-measures the uncontrolled arm on the same corpus for contrast.
  *
  * r13 ask #6 lifted the old ×8/×5 factor caps: the generators'
  * pattern arithmetic is now mod-reduced (residues unchanged at every
  * previously-legal famMod), so both arms run to ×40 like the text
  * probes — the depth where a quadratic term would actually show. The
  * uncontrolled contrast arm stays at the old ×8/×5 (its pair
  * population grows ×factor² BY CONSTRUCTION; at ×40 that is 1600× the
  * base pairs and measures only the synthetic data). The timed surface
  * is the SERVING plan: fingerprints derived once and pinned (the
  * warm-sidecar state m8/m9 serve from), then the banded-Hamming join
  * + rank + limit.
  *
  * Run: sbt "runMain graft.tools.MediaFamilyProbe /root/testdata/sf0.1"
  */
object MediaFamilyProbe {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baseN = graft.sources.Tables.load(spark, src, "documents").count()

    // (probe name, base famMod, controlled factor, uncontrolled factor,
    //  hash column, docs+famMod -> fingerprint frame)
    val arms: Seq[(String, Long, Int, Int, String, (DataFrame, Long) => DataFrame)] =
      Seq(
        ("m8_media", 97L, 40, 8, "dhash",
          (docs, fm) => Multimodal.perceptualHashes(
            Multimodal.syntheticNearDupMediaFrom(docs, fm))),
        ("m9_audio", 89L, 40, 5, "ahash",
          (docs, fm) => Multimodal.audioHashes(
            Multimodal.syntheticNearDupAudioFrom(docs, fm))))

    arms.foreach { case (name, baseMod, factor, uncFactor, sigCol, hashesOf) =>
      def docsOf(n: Long): DataFrame =
        spark.range(0, n, 1, 32).select(col("id").as("doc_id"))
      def serve(hashes: DataFrame): Double =
        time(Multimodal.bandedPairsFor(hashes, sigCol)
          .write.format("noop").mode("overwrite").save())
      def run(n: Long, famMod: Long): (Double, Long) = {
        // fingerprints pinned = the warm IndexStore sidecar state; the
        // timed surface is the banded join the query serves from it
        val hashes = hashesOf(docsOf(n), famMod).localCheckpoint(true)
        serve(hashes) // warm
        val w = Seq.fill(2)(serve(hashes)).min
        val pairs = Multimodal.bandedPairsFor(hashes, sigCol,
          limited = false).count()
        hashes.unpersist(blocking = true)
        (w, pairs)
      }
      val (baseS, basePairs) = run(baseN, baseMod)
      // uncontrolled: corpus ×f, SAME famMod — families grow ×f, pair
      // work ×f² (the r11 artifact, reproduced at a bounded factor)
      val (uncS, uncPairs) = run(baseN * uncFactor, baseMod)
      // controlled: corpus ×factor, famMod ×factor — family size
      // PINNED, family count grows; linear plan ⇒ ratio near d13's
      val (ctlS, ctlPairs) = run(baseN * factor, baseMod * factor)
      println(f"""{"probe":"media_family","arm":"$name","base_n":$baseN,"factor":$factor,"uncontrolled_factor":$uncFactor,""" +
        f""""base_s":$baseS%.3f,"uncontrolled_s":$uncS%.3f,"controlled_s":$ctlS%.3f,""" +
        f""""uncontrolled_ratio":${uncS / baseS}%.2f,"controlled_ratio":${ctlS / baseS}%.2f,""" +
        f""""base_pairs":$basePairs,"uncontrolled_pairs":$uncPairs,"controlled_pairs":$ctlPairs}""")
    }
    spark.stop()
  }
}
