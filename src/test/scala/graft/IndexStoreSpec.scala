package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexStore

/** The build-once/serve-many contract of the persisted index sidecar:
  * one build per source-data state, served results row-identical to a
  * rebuild, appends invalidate via the source-file fingerprint — and
  * for per-row indexes, append-only source growth is served by a
  * DELTA build over only the new files (the O(batch)-per-ingest path
  * that keeps index maintenance off the corpus-rescan cost curve).
  */
class IndexStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshSource(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_src").toString
    graft.sources.Tables.load(spark, sf, "documents")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    dir
  }

  test("one build serves repeated reads; rows identical; append rebuilds") {
    val src = freshSource()
    def index() = IndexStore.getOrBuild(spark, src, "lens", "documents") {
      spark.read.parquet(s"$src/documents.parquet")
        .select(col("doc_id"), length(col("text")).as("len"))
    }
    val before = IndexStore.buildsPerformed
    val first = index().orderBy("doc_id").collect().toSeq
    assert(IndexStore.buildsPerformed == before + 1)
    val second = index().orderBy("doc_id").collect().toSeq
    val third = index().orderBy("doc_id").collect().toSeq
    assert(IndexStore.buildsPerformed == before + 1, "served reads must not rebuild")
    assert(first == second && second == third && first.nonEmpty)
    // append to the SOURCE — fingerprint drifts, next read rebuilds
    // and the rebuilt index covers the appended rows
    graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .write.mode("append").parquet(s"$src/documents.parquet")
    val rebuilt = index().collect()
    assert(IndexStore.buildsPerformed == before + 2, "append must invalidate")
    assert(rebuilt.length == 2 * first.length)
  }

  test("d6/d13 share the signature index: one text scan serves both") {
    // a dedicated source dir so this test owns its sidecar lifecycle
    val src = freshSource()
    val before = IndexStore.buildsPerformed
    val d6 = SparkEntry.queries("d6_simhash64_pairs")(spark, src).collect()
    val d13 = SparkEntry.queries("d13_simhash64_lookup")(spark, src).collect()
    assert(IndexStore.buildsPerformed == before + 1,
      "both queries must serve from ONE signature build")
    assert(d6.nonEmpty && d13.nonEmpty)
    // and the served path returns exactly what a fresh derivation does
    import graft.functions.HashExprs.{char_fold_array, simhash64, tokenize}
    val fresh = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), char_fold_array(tokenize(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), simhash64(col("hs")).as("simhash"))
      .orderBy("doc_id").collect().toSeq
    val served = IndexStore.getOrBuildIncremental(spark, src, "simhash64",
      "documents") { _ =>
      fail("index must already be warm"): org.apache.spark.sql.DataFrame
    }.orderBy("doc_id").collect().toSeq
    assert(served == fresh)
  }

  test("per-row index: append-only source growth takes the DELTA build " +
    "path (derives only the new files), mutation falls back to full rebuild") {
    val src = freshSource()
    var lastDeriveInput = -1L
    def index() = IndexStore.getOrBuildIncremental(spark, src, "lens_inc",
      "documents") { df =>
      lastDeriveInput = df.count()
      df.select(col("doc_id"), length(col("text")).as("len"))
    }
    val builds0 = IndexStore.buildsPerformed
    val apps0 = IndexStore.incrementalAppends
    val first = index().orderBy("doc_id").collect().toSeq
    val baseN = first.length
    assert(IndexStore.buildsPerformed == builds0 + 1 &&
      IndexStore.incrementalAppends == apps0)
    assert(lastDeriveInput == baseN && baseN > 0)
    index().collect()
    assert(IndexStore.buildsPerformed == builds0 + 1, "warm serve must not build")
    // ingest appends NEW parquet files — existing files untouched
    graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .write.mode("append").parquet(s"$src/documents.parquet")
    val after = index().orderBy("doc_id").collect().toSeq
    assert(IndexStore.incrementalAppends == apps0 + 1,
      "append-only growth must take the delta path")
    assert(lastDeriveInput == baseN,
      "delta build must derive ONLY the new files' rows, not the corpus")
    assert(after.length == 2 * baseN)
    // delta-served rows identical to a cold full derivation
    val fresh = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
      .orderBy("doc_id").collect().toSeq
    assert(after == fresh)
    // in-place mutation of already-indexed files: full rebuild, never
    // a stale serve and never a bogus delta
    val all = spark.read.parquet(s"$src/documents.parquet").localCheckpoint(true)
    all.write.mode("overwrite").parquet(s"$src/documents.parquet")
    val builds1 = IndexStore.buildsPerformed
    val apps1 = IndexStore.incrementalAppends
    val rebuilt = index().orderBy("doc_id").collect().toSeq
    assert(IndexStore.buildsPerformed == builds1 + 1 &&
      IndexStore.incrementalAppends == apps1,
      "mutated source must full-rebuild, not delta-append")
    assert(rebuilt == fresh)
  }

  test("reader isolation (r13 ask #2): a DataFrame planned over v1 keeps " +
    "reading while v2 builds and commits; versions older than the " +
    "previously-served one are pruned") {
    val src = freshSource()
    def index() = IndexStore.getOrBuild(spark, src, "lens_iso", "documents") {
      spark.read.parquet(s"$src/documents.parquet")
        .select(col("doc_id"), length(col("text")).as("len"))
    }
    val v1Reader = index() // plans v1's file list eagerly
    val n1 = v1Reader.count()
    val idxDir = new java.io.File(s"${IndexStore.rootFor(src)}/lens_iso")
    def versions() = Option(idxDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).sorted.toSeq
    assert(versions() == Seq("v1"))
    // source mutates → NEXT serve retrains into v2 while the v1 plan
    // is still held open
    graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .write.mode("append").parquet(s"$src/documents.parquet")
    val v2Reader = index()
    assert(versions() == Seq("v1", "v2"), "previous version must survive the swap")
    // BOTH read successfully: the in-flight v1 reader was not broken
    assert(v1Reader.count() == n1, "v1 reader must still scan its planned files")
    assert(v2Reader.count() == 2 * n1)
    // a third build prunes v1 (older than the previously-served v2)
    graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id") + lit(2000000L))
      .write.mode("append").parquet(s"$src/documents.parquet")
    val v3Reader = index()
    assert(versions() == Seq("v2", "v3"), "v1 must be pruned once unreferenced")
    assert(v2Reader.count() == 2 * n1 && v3Reader.count() == 3 * n1)

    // purge-vs-rebuild race: a v4 dir whose pointer swap is pending
    // (commitNewVersion's commit window) must SURVIVE the erasure
    // purge — only versions OLDER than the served one are dead
    val v4 = new java.io.File(idxDir, "v4")
    java.nio.file.Files.createDirectories(v4.toPath)
    java.nio.file.Files.writeString(
      v4.toPath.resolve("part-fake.parquet"), "in-flight")
    val dropped = IndexStore.pruneUnservedVersions(spark, src)
    assert(dropped == 1, s"only v2 is prunable, got $dropped")
    assert(versions() == Seq("v3", "v4"),
      "the in-flight v4 build must survive the purge")
    assert(v3Reader.count() == 3 * n1, "served version keeps serving")
  }

  test("crash between delta write and manifest update, then ANOTHER " +
    "append: the orphaned delta is pruned, rows served exactly once") {
    val src = freshSource()
    def index() = IndexStore.getOrBuildIncremental(spark, src, "lens_crash",
      "documents") { df =>
      df.select(col("doc_id"), length(col("text")).as("len"))
    }
    index().collect() // base build; manifest records {A}
    val manifest = java.nio.file.Paths.get(
      s"${IndexStore.rootFor(src)}/lens_crash.manifest")
    val preAppendManifest = java.nio.file.Files.readAllBytes(manifest)
    // append B → delta build lands and the manifest records it
    graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .write.mode("append").parquet(s"$src/documents.parquet")
    index().collect()
    // CRASH SIMULATION: the delta dir survived but the manifest update
    // was lost — restore the pre-append manifest, leaving delta_h({B})
    // orphaned on disk
    java.nio.file.Files.write(manifest, preAppendManifest)
    // append C — the r11 hazard: next build diffs {B, C} against {A}
    // and derives B AGAIN into delta_h({B,C}); without reconciliation
    // the orphan delta_h({B}) would serve B's rows twice
    graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id") + lit(2000000L))
      .write.mode("append").parquet(s"$src/documents.parquet")
    val served = index().orderBy("doc_id").collect().toSeq
    val cold = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
      .orderBy("doc_id").collect().toSeq
    assert(served.length == cold.length,
      s"crash+append overlap must not duplicate rows " +
        s"(served ${served.length}, cold ${cold.length})")
    assert(served == cold, "served rows must equal a cold full rebuild")
    // and the replayed-delta idempotence still holds: re-serving after
    // recovery neither rebuilds nor duplicates
    val builds = IndexStore.buildsPerformed
    assert(index().orderBy("doc_id").collect().toSeq == cold)
    assert(IndexStore.buildsPerformed == builds, "recovered index must serve warm")
  }
}
