package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CdcPipeline, ChangeFeed, KeyedParquetStore}

/** Feed pruning + checkpoint rotation — the engine-owned fix for the
  * file-source compact log's linear growth (OSS Spark never evicts
  * source-log entries: `CompactibleFileStreamLog.shouldRetain` ≡
  * true; `maxFileAge` trims only the in-memory seen-map). The
  * contract under test:
  *
  *  1. pruning at a watermark ≤ the committed one deletes exactly the
  *     fully-applied feed files;
  *  2. a mirror restarted on a FRESH checkpoint over the pruned feed
  *     re-reads the surviving tail, and the idempotent by-PK merge
  *     absorbs the overlap — the store converges to exactly-once
  *     totals with zero lost and zero duplicated rows;
  *  3. the rotated checkpoint's source log lists only surviving
  *     files — its footprint tracks the retention window, not the
  *     full history (the x40_rotate block of CDC_BENCH.json measures
  *     the same at 800 batches).
  */
class CheckpointRotationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val rowSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def publishBatch(feed: String, ids: Range): Unit = {
    import spark.implicits._
    val events = ids.map { i =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), "I", "t",
        i.toLong, s"""{"id":$i,"v":"v$i"}""")
    }.toDF("lsn", "commitTs", "op", "table", "key", "after")
    ChangeFeed.publish(events.coalesce(1), feed)
  }

  private def runMirror(feed: String, ckpt: String,
      store: KeyedParquetStore): Unit = {
    val q = CdcPipeline.start(
      ChangeFeed.stream(spark, feed, maxFilesPerTrigger = 1),
      store, Map("t" -> rowSchema), Map("t" -> "id"),
      mirrorName = "rotation_mirror", checkpointDir = ckpt)
    q.processAllAvailable()
    q.stop()
  }

  test("prune + rotate: overlap re-read absorbed, exactly-once totals, " +
    "rotated source log lists only the surviving tail") {
    val work = Files.createTempDirectory("graft_rotate_spec").toString
    val feed = s"$work/feed"
    val store = new KeyedParquetStore(s"$work/store", nBuckets = 4)
    // phase 1: 10 feed files of 100 rows each
    (0 until 10).foreach(b => publishBatch(feed, (b * 100) until ((b + 1) * 100)))
    runMirror(feed, s"$work/ckpt1", store)
    assert(store.read(spark, "t").count() == 1000L)
    // prune TWO batches short of the applied watermark (999): files
    // holding only lsn <= 799 go, the last two files survive
    val (pruned, kept) = ChangeFeed.prune(spark, feed, upToLsn = 799L)
    assert(pruned == 8L && kept == 2L, s"pruned=$pruned kept=$kept")
    // phase 2: two more files, then a mirror on a FRESH checkpoint —
    // it re-reads the two surviving (already-applied) files too
    (10 until 12).foreach(b => publishBatch(feed, (b * 100) until ((b + 1) * 100)))
    runMirror(feed, s"$work/ckpt2", store)
    val rows = store.read(spark, "t")
    assert(rows.count() == 1200L, "overlap re-read must be absorbed, new rows applied")
    assert(rows.select("id").distinct().count() == 1200L, "no duplicated keys")
    assert(rows.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(0L, 1199L))
    // the rotated checkpoint's source log knows only the 4 surviving
    // files (2 replayed + 2 new) — never the full 12-file history
    def listedFiles(ckpt: String): Int = {
      val dir = java.nio.file.Paths.get(s"$ckpt/sources/0")
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.map { f =>
          new String(java.nio.file.Files.readAllBytes(f),
            java.nio.charset.StandardCharsets.UTF_8)
            .linesIterator.count(_.contains("\"path\""))
        }.sum
      finally s.close()
    }
    val listed = listedFiles(s"$work/ckpt2")
    assert(listed <= 4, s"rotated source log lists $listed files")
    assert(listedFiles(s"$work/ckpt1") >= 10, "unrotated log lists full history")
  }

  test("rotateCheckpoint API (r12 ask #6): one call stops, prunes at the " +
    "store's own watermark, resets the checkpoint; same ckpt dir restarts " +
    "on the surviving tail with exactly-once totals") {
    val work = Files.createTempDirectory("graft_rotate_api").toString
    val feed = s"$work/feed"
    val ckpt = s"$work/ckpt" // ONE checkpoint path across the rotation
    val store = new KeyedParquetStore(s"$work/store", nBuckets = 4)
    (0 until 10).foreach(b => publishBatch(feed, (b * 100) until ((b + 1) * 100)))
    runMirror(feed, ckpt, store)
    // applyBatch maintained the applied watermark — no out-of-band LSN
    assert(store.appliedLsn(spark).contains(999L))
    // margin of 200 LSNs: files with maxLsn <= 799 pruned, 2 kept
    val (pruned, kept) = CdcPipeline.rotateCheckpoint(spark, store, feed,
      "rotation_mirror", ckpt, safetyLsns = 200L)
    assert(pruned == 8L && kept == 2L, s"pruned=$pruned kept=$kept")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt)),
      "rotation must reset the checkpoint")
    // phase 2 on the SAME checkpoint path: re-reads the 2 surviving
    // (already-applied) files plus 2 new ones
    (10 until 12).foreach(b => publishBatch(feed, (b * 100) until ((b + 1) * 100)))
    runMirror(feed, ckpt, store)
    val rows = store.read(spark, "t")
    assert(rows.count() == 1200L && rows.select("id").distinct().count() == 1200L,
      "exactly-once totals across the rotation")
    assert(store.appliedLsn(spark).contains(1199L))
    // rotating with NOTHING applied is a no-op (fresh store)
    val empty = new KeyedParquetStore(s"$work/store2", nBuckets = 4)
    assert(CdcPipeline.rotateCheckpoint(spark, empty, feed,
      "rotation_mirror", ckpt) == ((0L, 0L)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt)),
      "no-applied rotation must not delete the checkpoint")
  }

  test("out-of-LSN-order arrival: a late feed file below the watermark " +
    "that the mirror never read SURVIVES rotation (no data loss)") {
    val work = Files.createTempDirectory("graft_rotate_late").toString
    val feed = s"$work/feed"
    val ckpt = s"$work/ckpt"
    val store = new KeyedParquetStore(s"$work/store", nBuckets = 4)
    // files 100-199 and 300-399 applied; watermark lands at 399
    publishBatch(feed, 100 until 200)
    publishBatch(feed, 300 until 400)
    runMirror(feed, ckpt, store)
    assert(store.appliedLsn(spark).contains(399L))
    // a decoder backfill lands the MISSING 200-299 file AFTER the
    // mirror stopped: old LSNs, new mtime — never processed
    publishBatch(feed, 200 until 300)
    val (pruned, kept) = CdcPipeline.rotateCheckpoint(spark, store, feed,
      "rotation_mirror", ckpt)
    // the two processed files go; the unread backfill file — although
    // its max LSN (299) is under the watermark — must survive
    assert(pruned == 2L && kept == 1L, s"pruned=$pruned kept=$kept")
    // the restarted mirror reads the survivor: no change is ever lost
    runMirror(feed, ckpt, store)
    val rows = store.read(spark, "t")
    assert(rows.count() == 300L)
    assert(rows.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(100L, 399L))
  }

  test("rotateIfOversized: under-budget checkpoints are untouched; an " +
    "over-budget one rotates through the same API") {
    val work = Files.createTempDirectory("graft_rotate_policy").toString
    val feed = s"$work/feed"
    val ckpt = s"$work/ckpt"
    val store = new KeyedParquetStore(s"$work/store", nBuckets = 4)
    (0 until 5).foreach(b => publishBatch(feed, (b * 100) until ((b + 1) * 100)))
    runMirror(feed, ckpt, store)
    val bytes = CdcPipeline.checkpointBytes(spark, ckpt)
    assert(bytes > 0L)
    // generous budget: the policy must not stop/delete anything
    assert(CdcPipeline.rotateIfOversized(spark, store, feed,
      "rotation_mirror", ckpt, maxCheckpointBytes = bytes * 10).isEmpty)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt)))
    // 1-byte budget: rotation fires, feed pruned at the watermark
    val rotated = CdcPipeline.rotateIfOversized(spark, store, feed,
      "rotation_mirror", ckpt, maxCheckpointBytes = 1L)
    assert(rotated.contains((5L, 0L)), s"got $rotated")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt)))
    // restart on the same path: nothing to re-read, totals unchanged
    runMirror(feed, ckpt, store)
    assert(store.read(spark, "t").count() == 500L)
  }

  test("prune at the full committed watermark removes every applied file " +
    "and an idle rotated mirror applies nothing") {
    val work = Files.createTempDirectory("graft_rotate_spec2").toString
    val feed = s"$work/feed"
    val store = new KeyedParquetStore(s"$work/store", nBuckets = 4)
    (0 until 5).foreach(b => publishBatch(feed, (b * 100) until ((b + 1) * 100)))
    runMirror(feed, s"$work/ckpt1", store)
    val (pruned, kept) = ChangeFeed.prune(spark, feed, upToLsn = 499L)
    assert(pruned == 5L && kept == 0L)
    runMirror(feed, s"$work/ckpt2", store)
    assert(store.read(spark, "t").count() == 500L)
  }
}
