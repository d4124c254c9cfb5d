package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock evidence for the delta index path
  * ([[graft.operators.IndexStore.getOrBuildIncremental]]): on a base
  * corpus, time (a) the cold FULL signature build, then append an
  * ingest-sized batch of new parquet files and time (b) the DELTA
  * build and (c) a warm serve. The claim under test is O(batch)
  * maintenance: (b) should track the batch fraction of (a), not the
  * corpus, and (c) should be a parquet-scan epilogue only.
  *
  * Run:
  *   sbt "runMain graft.tools.DeltaProbe /root/testdata/sf0.1 /tmp/graft_delta_probe 10"
  * (base = srcDir's documents ×copies with disjoint ids/token spaces —
  * the ScaleProbe convention; delta = one more copy appended)
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val (src, work, copies) =
      (args(0), args(1), if (args.length > 2) args(2).toInt else 10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsDir = s"$work/documents.parquet"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(work), true)
    val base = spark.read.parquet(s"$src/documents.parquet")
    val span = base.agg(max("doc_id")).head.getLong(0) + 1
    // copy-k gets offset ids and suffixed tokens (disjoint similarity
    // spaces — the ScaleProbe lesson: verbatim copies square pair work)
    def copy(k: Int) = base
      .withColumn("doc_id", col("doc_id") + lit(k * span))
      .withColumn("text",
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1_c$k"))
    (0 until copies).foreach(k => copy(k)
      .write.mode("append").parquet(docsDir))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def buildAndCount(): (Long, Double) =
      timed(graft.operators.DedupQueries.simhash64Index(spark, work).count())

    val (nFull, fullS) = buildAndCount()   // cold: full derivation
    val (_, warmS) = buildAndCount()       // warm: sidecar scan only
    copy(copies).write.mode("append").parquet(docsDir) // ingest batch
    val (nAfter, deltaS) = buildAndCount() // delta: new files only
    val (_, warm2S) = buildAndCount()
    println(s"""{"probe":"delta_index","base_rows":$nFull,"after_rows":$nAfter,""" +
      s""""copies":$copies,"full_build_s":${f"$fullS%.2f"},""" +
      s""""delta_build_s":${f"$deltaS%.2f"},"warm_serve_s":${f"$warmS%.2f"},""" +
      s""""warm_after_s":${f"$warm2S%.2f"},""" +
      s""""delta_vs_full":${f"${deltaS / fullS}%.3f"}}""")
    spark.stop()
  }
}
