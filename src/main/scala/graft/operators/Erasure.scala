package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Right-to-be-forgotten sweep — tombstoned keys removed from a corpus
  * table AND from every derived artifact that could still serve them.
  * The reference replicates row deletion through the mirror (the
  * insert workload's D ops, insert.ps1); an analytics engine that also
  * PERSISTS derived state (signature sidecars, fingerprints, trained
  * centroids — [[IndexStore]]) additionally owes the user the cascade:
  * after erasure, no sidecar may keep answering from the forgotten
  * rows.
  *
  * Two surfaces, matching where rows live:
  *
  *  - [[forget]]: batch corpus directory (`<dataDir>/<table>.parquet`)
  *    — anti-join rewrite + atomic old-aside swap. The cascade is BY
  *    CONSTRUCTION: the rewrite replaces the table's file inventory,
  *    which fails every [[IndexStore]] guard on next access — the
  *    fingerprint ([[IndexStore.getOrBuild]]), the per-file manifest
  *    ([[IndexStore.getOrBuildIncremental]] treats a rewritten indexed
  *    file as mutation ⇒ full rebuild) and the trained-state inventory
  *    ([[IndexStore.getOrBuildIfFresh]] ⇒ retrain) alike. No eager
  *    sidecar deletion is needed, so a crash mid-erasure can never
  *    leave a half-invalidated index: guards compare against the data
  *    that IS there.
  *  - [[forgetFromStore]]: keyed CDC store — erasure rides the
  *    PRODUCT delete path (a synthetic `op='D'` change batch above
  *    the applied watermark, applied through
  *    [[graft.streaming.CdcPipeline.applyBatch]]'s idempotent merge),
  *    so it composes with live replication instead of racing it.
  *
  * Scale: one broadcast anti-join scan-and-rewrite; erasure cost is a
  * corpus rewrite by design (Parquet has no in-place delete) — batch
  * tombstones and run on a cadence, never per key. At 100 TB, partition
  * the table by a key range so the rewrite touches only partitions
  * holding tombstoned keys.
  */
object Erasure {

  /** Outcome of one [[forget]] sweep; `residue` MUST read 0 —
    * anything else means a tombstoned key survived the rewrite. */
  final case class Report(table: String, rowsBefore: Long,
      rowsAfter: Long, residue: Long)

  def forget(spark: SparkSession, dataDir: String, table: String,
      keyCol: String, ids: Seq[Long]): Report = {
    require(ids.nonEmpty, "empty tombstone set")
    val src = s"$dataDir/$table.parquet"
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = new org.apache.hadoop.fs.Path(src + "._forget_scratch")
    val old = new org.apache.hadoop.fs.Path(src + "._forget_old")
    // sweep a prior crashed attempt: scratch is always droppable (the
    // swap had not happened); an orphaned _old means a completed swap
    // whose cleanup was interrupted
    fs.delete(scratch, true)
    fs.delete(old, true)
    import spark.implicits._
    def tomb = broadcast(ids.toDF(keyCol))
    val rowsBefore = spark.read.parquet(src).count()
    spark.read.parquet(src).join(tomb, Seq(keyCol), "left_anti")
      .write.parquet(scratch.toString)
    // old-aside swap with CHECKED renames (a false return on many
    // Hadoop filesystems is failure, and proceeding would delete the
    // only surviving copy)
    if (!fs.rename(srcPath, old))
      throw new java.io.IOException(
        s"erasure swap failed: rename $srcPath -> $old returned false")
    if (!fs.rename(scratch, srcPath)) {
      fs.rename(old, srcPath) // restore the original; best effort
      throw new java.io.IOException(
        s"erasure swap failed: rename $scratch -> $srcPath returned false")
    }
    fs.delete(old, true)
    val after = spark.read.parquet(src)
    Report(table, rowsBefore, after.count(),
      after.join(tomb, Seq(keyCol), "left_semi").count())
  }

  /** Erase keys from a [[graft.streaming.KeyedParquetStore]] table by
    * applying delete tombstones THROUGH the replication merge — one
    * synthetic change batch at LSNs above the applied watermark, so
    * the store's exactly-once/idempotency guarantees hold and a
    * concurrent mirror's later batches re-delete harmlessly. */
  def forgetFromStore(spark: SparkSession,
      store: graft.streaming.KeyedParquetStore, table: String,
      keyCol: String, rowSchema: StructType, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "empty tombstone set")
    val base = store.appliedLsn(spark).getOrElse(0L) + 1L
    import spark.implicits._
    val batch = ids.zipWithIndex
      .map { case (id, i) => (base + i, id) }
      .toDF("lsn", "key")
      .select(col("lsn"),
        to_timestamp(lit("2000-01-01 00:00:00")).as("commitTs"),
        lit("D").as("op"), lit(table).as("table"), col("key"),
        lit(null).cast("string").as("after"))
    graft.streaming.CdcPipeline.applyBatch(batch, store,
      Map(table -> rowSchema), Map(table -> keyCol))
  }
}
