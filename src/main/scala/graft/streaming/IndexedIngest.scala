package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IndexStore

/** Streaming ingest composed with INDEX MAINTENANCE (r11 verdict ask
  * #8): a `foreachBatch` sink that (1) idempotently lands each
  * micro-batch as one parquet file in the corpus directory and
  * (2) immediately runs the [[IndexStore]] incremental build, so the
  * per-row index (SimHash signatures, perceptual fingerprints, …) is
  * maintained at INGEST time — each batch pays one O(batch) delta
  * derivation, and every query that serves from the index sees a
  * corpus-current sidecar without ever re-scanning the corpus.
  *
  * Effective-once without a transactional sink: the batch lands under
  * a DETERMINISTIC name keyed by the micro-batch id, written to a
  * scratch path and committed by rename, and the write is SKIPPED when
  * the target already exists. A replay after a crash (the
  * at-least-once window between sink work and checkpoint commit)
  * therefore re-lands nothing — the corpus file set is identical, the
  * index build sees no new files and serves warm. Crash INSIDE the
  * index build is covered by IndexStore's own manifest reconciliation
  * (orphan deltas pruned before serving).
  *
  * At 100 TB this is the ingestion half of the signature-store
  * design: the d6/d13/m8/m9 family reads
  * `IndexStore.getOrBuildIncremental` sidecars, and this sink is what
  * keeps those sidecars hot on a live feed at O(ingest batch) cost.
  */
object IndexedIngest {

  /** The foreachBatch body: land `batch` idempotently as
    * `<dataDir>/<table>.parquet/ingest-batch-<id>.parquet`, then run
    * the incremental index build for (`name`, `derive`). Exposed
    * separately so failure-injection harnesses can wrap it. */
  def landAndIndex(batch: DataFrame, batchId: Long, dataDir: String,
      table: String, name: String)(derive: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(s"$dataDir/$table.parquet")
    val fs = dir.getFileSystem(conf)
    val target = new org.apache.hadoop.fs.Path(dir, s"ingest-batch-$batchId.parquet")
    if (!fs.exists(target)) {
      // stale scratch from a crashed EARLIER batch is dead weight —
      // invisible to Spark's listing, but never cleaned by the happy
      // path once its batch replays with the target already landed.
      // Swept when provably dead: id strictly below the current batch
      // (micro-batches are sequential, so batch b running proves every
      // b' < b committed), OR the id's target file already landed (a
      // PRIOR INCARNATION's batch after a checkpoint drop-recreate
      // resets ids to 0 — its landed target proves its scratch dead).
      // The current id's leftover is handled by the overwrite-mode
      // write; an unlanded future id may be another writer's in-flight
      // scratch and is never deleted blindly.
      if (fs.exists(dir))
        fs.listStatus(dir)
          .filter { s =>
            val n = s.getPath.getName
            s.isDirectory && n.startsWith("_ingest_scratch_") &&
              scala.util.Try(n.stripPrefix("_ingest_scratch_").toLong)
                .toOption.exists(k => k < batchId || fs.exists(
                  new org.apache.hadoop.fs.Path(dir, s"ingest-batch-$k.parquet")))
          }
          .foreach(s => fs.delete(s.getPath, true))
      // scratch is `_`-prefixed → invisible to Spark's file listing
      // (and to IndexStore's inventory) until the rename commits it
      val scratch = new org.apache.hadoop.fs.Path(dir, s"_ingest_scratch_$batchId")
      batch.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      // a zero-partition micro-batch writes no part- file: land nothing
      // (the corpus is unchanged) but still fall through to the index
      // build — killing the stream over an empty trigger would wedge
      // ingestion on any idle source
      fs.listStatus(scratch)
        .find(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .foreach(part => fs.rename(part.getPath, target))
      fs.delete(scratch, true)
    }
    IndexStore.getOrBuildIncremental(spark, dataDir, name, table)(derive)
  }

  /** Start the composed stream: every micro-batch of `docs` lands in
    * the corpus and refreshes index `name` via `derive` (a PER-ROW
    * derivation — IndexStore's delta contract). */
  def start(docs: DataFrame, dataDir: String, table: String, name: String,
      checkpointDir: String)(derive: DataFrame => DataFrame): StreamingQuery =
    docs.writeStream
      .queryName(s"indexed_ingest_$table")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landAndIndex(batch, batchId, dataDir, table, name)(derive)
      }
      .start()
}
