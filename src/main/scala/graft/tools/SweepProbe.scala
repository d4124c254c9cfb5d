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

    // ── POST-COMPACT STEADY STATE (r16 verdict #5): a mirror on the
    // sweepAndCompact cadence. The store here is REALISTIC: _synced_lsn
    // is monotone in apply order (lsn = id), the expired tombstones are
    // the OLDEST rows, and parquet row groups are small enough that one
    // bucket file holds many (128 KiB blocks ≈ production's many-row-
    // groups-per-file shape at probe scale). Measured claims:
    //  (a) discovery after compact(clusterBy=_synced_lsn) reads
    //      O(expired) — zone maps skip every young row group — vs the
    //      same predicate on the unclustered layout;
    //  (b) one sweepAndCompact pass ≈ the rewrite the compaction
    //      cadence already pays, vs sweep-then-compact as separate jobs
    //      (the scattered worst case's discovery + merge + rewrite).
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.block.size", 128 * 1024)
    // lsn = a fixed multiplicative permutation of the key (odd
    // multiplier, power-of-two n → bijection), NOT the key itself: a
    // real mirror's apply order is uncorrelated with key order, and
    // with lsn ≡ id the store's id-ordered write would leave every
    // bucket file ACCIDENTALLY lsn-sorted — the unclustered baseline
    // would zone-skip and the compact would have nothing to prove.
    // (A pre-write orderBy can't scramble it either: EliminateSorts
    // drops a sort sitting under the store's bucket repartition.)
    def buildMonotone(n: Long, k: Long): KeyedParquetStore = {
      require((n & (n - 1)) == 0L, s"n=$n must be a power of two")
      val root = java.nio.file.Files.createTempDirectory("sweep_pc").toString
      val store = new KeyedParquetStore(root, nBuckets = buckets)
      val lsn = expr(s"(id * 2654435761L) % $n")
      val df = spark.range(n).select(
        col("id"),
        concat(lit("payload-"), col("id")).as("payload"),
        (lsn < k).as(CdcPipeline.SoftDeleteCol),
        lsn.as(CdcPipeline.SyncedLsnCol))
      store.snapshot(spark, "t", df, "id")
      store
    }
    // discovery cost in ROWS THE SCAN EMITS (post row-group skipping —
    // the honest O(expired)-vs-O(table) signal; wall time at probe
    // scale is job-overhead-dominated) plus the wall time for context
    def discover(store: KeyedParquetStore, w: Long): (Double, Long, Long) = {
      // collect() routes through the Dataset's OWN queryExecution, so
      // the scan metric can be read off the same plan instance after
      // the action (a count()/write would build a separate execution)
      val probe = store.read(spark, "t")
        .filter(col(CdcPipeline.SoftDeleteCol) &&
          col(CdcPipeline.SyncedLsnCol) <= w)
        .select(CdcPipeline.SyncedLsnCol)
      var c = 0L
      val s = timed { c = probe.collect().length.toLong }
      (s, c, org.apache.spark.sql.graftbridge.Bridge.scanOutputRows(probe))
    }
    for ((n, k) <- Seq((1L << 22, 4096L), (1L << 22, 409600L))) {
      // (a) discovery: unclustered (every row group holds a lsn mix —
      // zone maps useless) vs after compact(clusterBy=_synced_lsn)
      // with the tombstones STILL PRESENT (the layout a prior cadence
      // pass leaves for this cycle's expired band)
      val pre = buildMonotone(n, k)
      val (dPre, cPre, rPre) = discover(pre, k - 1)
      val clusterS = timed(pre.compact(spark, "t",
        clusterBy = Seq(CdcPipeline.SyncedLsnCol)))
      val (dPost, cPost, rPost) = discover(pre, k - 1)
      assert(cPre == k && cPost == k, s"discovery counts $cPre/$cPost")
      // separate-jobs path from here: sweep = (fast) discovery + the
      // scattered-key merge rewrite; the cadence's compact already ran
      val sweepS = timed {
        val purged = CdcPipeline.sweepSoftDeleted(spark, pre, "t", "id", k - 1)
        assert(purged == k, s"swept $purged of $k")
      }

      // (b) cadence path: ONE sweepAndCompact pass on a fresh
      // identical store — purge folded into the rewrite
      val post = buildMonotone(n, k)
      val sacS = timed {
        val purged = CdcPipeline.sweepAndCompact(spark, post, "t", k - 1)
        assert(purged == k, s"purged $purged of $k")
      }
      // after the pass: zero tombstones, clustered layout — the next
      // cycle's no-op discovery skips everything
      val (dNext, cNext, rNext) = discover(post, n)
      assert(cNext == 0L)
      println(f"""{"probe":"sweep_postcompact","rows":$n,"tombstones":$k,""" +
        f""""discovery_unclustered_rows":$rPre,""" +
        f""""discovery_clustered_rows":$rPost,""" +
        f""""discovery_after_purge_rows":$rNext,""" +
        f""""discovery_unclustered_s":$dPre%.3f,""" +
        f""""discovery_clustered_s":$dPost%.3f,""" +
        f""""sweep_then_compact_s":${clusterS + sweepS}%.3f,""" +
        f""""sweep_and_compact_s":$sacS%.3f,""" +
        f""""full_rewrite_s":$clusterS%.3f}""")
    }
    spark.stop()
  }
}
