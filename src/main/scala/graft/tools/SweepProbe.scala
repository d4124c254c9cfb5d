package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{CdcPipeline, KeyedParquetStore}

/** Dev tool: cost-profile the soft-delete retention sweep
  * ([[CdcPipeline.sweepSoftDeleted]]) — the SCALE.md evidence that the
  * sweep is discovery-scan + touched-bucket rewrite, not a full-table
  * rewrite. Grid: table rows N × expired tombstones K; for each cell,
  * build a soft store (tombstones pre-flagged at seed time so the
  * probe times the SWEEP, not the churn that created the state), time
  * the sweep, and contrast with a full [[KeyedParquetStore.compact]]
  * (the all-buckets-rewrite ceiling) at the same N.
  *
  * Expected shape: sweep time grows with N only through the
  * predicate-pushed discovery scan (and with K through the touched
  * buckets + rewritten rows), staying under the full-rewrite ceiling
  * whenever K's buckets are a subset of the table's.
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val buckets = 64
    def build(n: Long, expired: org.apache.spark.sql.Column): KeyedParquetStore = {
      val root = java.nio.file.Files.createTempDirectory("sweep_probe").toString
      val store = new KeyedParquetStore(root, nBuckets = buckets)
      // expired tombstones at lsn 5, everything else live at lsn 0
      val df = spark.range(n).select(
        col("id"),
        concat(lit("payload-"), col("id")).as("payload"),
        expired.as(CdcPipeline.SoftDeleteCol),
        when(expired, 5L).otherwise(0L).as(CdcPipeline.SyncedLsnCol))
      store.snapshot(spark, "t", df, "id")
      store
    }
    def timed(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // one throwaway cell first: the sweep path's JIT/codegen warmup
    // must not bill the first printed row
    locally {
      val w = build(10000L, col("id") < 100)
      CdcPipeline.sweepSoftDeleted(spark, w, "t", "id", 10L)
      w.compact(spark, "t")
    }

    // SCATTERED tombstones (the churned-mirror shape: keys hash across
    // every bucket → the rewrite is effectively table-wide, only the
    // discovery scan's pushed predicate saves work) vs CLUSTERED
    // tombstones (one bucket → the merge's bucket prune bites)
    val cells = Seq(
      ("scattered", 1000000L, col("id") < 1000),
      ("scattered", 1000000L, col("id") < 100000),
      ("scattered", 4000000L, col("id") < 1000),
      ("one_bucket", 1000000L,
        pmod(hash(col("id")), lit(buckets)) === 0 && col("id") < 64000))
    for ((shape, n, cond) <- cells) {
      val store = build(n, cond)
      var purged = 0L
      val sweepS = timed {
        purged = CdcPipeline.sweepSoftDeleted(spark, store, "t", "id", 10L)
      }
      val compactS = timed(store.compact(spark, "t"))
      println(f"""{"probe":"sweep","shape":"$shape","rows":$n,""" +
        f""""tombstones":$purged,"sweep_s":$sweepS%.3f,""" +
        f""""full_rewrite_s":$compactS%.3f}""")
    }
    spark.stop()
  }
}
