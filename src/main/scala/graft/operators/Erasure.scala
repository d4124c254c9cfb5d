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

  /** The one old-aside swap both erasure sites share: park the
    * original, move the replacement in, drop the parked copy — every
    * rename CHECKED (a false return on many Hadoop filesystems is
    * failure, and proceeding would delete the only surviving copy),
    * with a best-effort restore when the second rename fails. Crash
    * ordering contract for CALLERS: before invoking, restore any
    * orphaned old-aside whose original is absent (a crash between the
    * two renames here) and only then sweep leftovers. */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem,
      replacement: org.apache.hadoop.fs.Path,
      orig: org.apache.hadoop.fs.Path,
      oldAside: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.rename(orig, oldAside))
      throw new java.io.IOException(
        s"swap failed: rename $orig -> $oldAside returned false")
    if (!fs.rename(replacement, orig)) {
      fs.rename(oldAside, orig) // restore the original; best effort
      throw new java.io.IOException(
        s"swap failed: rename $replacement -> $orig returned false")
    }
    fs.delete(oldAside, true)
  }

  def forget(spark: SparkSession, dataDir: String, table: String,
      keyCol: String, ids: Seq[Long]): Report = {
    require(ids.nonEmpty, "empty tombstone set")
    val src = s"$dataDir/$table.parquet"
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = new org.apache.hadoop.fs.Path(src + "._forget_scratch")
    val old = new org.apache.hadoop.fs.Path(src + "._forget_old")
    // crash recovery BEFORE any sweep: an attempt that died between
    // the two swap renames leaves src ABSENT and the data in _old —
    // restore it first (deleting _old in that state would destroy the
    // only copy). Scratch is always droppable (pre-swap); _old is
    // droppable only while src exists (completed swap, interrupted
    // cleanup).
    if (!fs.exists(srcPath) && fs.exists(old) && !fs.rename(old, srcPath))
      throw new java.io.IOException(
        s"erasure crash recovery failed: rename $old -> $srcPath returned false")
    fs.delete(scratch, true)
    if (fs.exists(srcPath)) fs.delete(old, true)
    import spark.implicits._
    def tomb = broadcast(ids.toDF(keyCol))
    val rowsBefore = spark.read.parquet(src).count()
    spark.read.parquet(src).join(tomb, Seq(keyCol), "left_anti")
      .write.parquet(scratch.toString)
    swapIn(fs, scratch, srcPath, old)
    val after = spark.read.parquet(src)
    Report(table, rowsBefore, after.count(),
      after.join(tomb, Seq(keyCol), "left_semi").count())
  }

  /** One edge of an erasure cascade: child rows of `childTable` are
    * tombstoned when their `fkCol` matches a tombstoned value of the
    * parent's `parentKeyCol`. `childKeyCol` is the CHILD's own primary
    * key — the column the next cascade level (and [[forget]]) keys on. */
  final case class CascadeEdge(childTable: String, fkCol: String,
      childKeyCol: String)

  /** FK-CASCADE erasure — the relational half of right-to-be-forgotten:
    * deleting a subject's row is not enough when child tables still
    * reference it (a customer's orders, those orders' line items).
    * Derives tombstones to a FIXPOINT over the edge set (so
    * multi-parent/diamond shapes converge — a single ordered pass
    * would miss keys a later edge adds to an earlier table), each
    * derivation one distributed semi-join with the parent keys
    * broadcast (erasure subjects are human-scale sets; the collected
    * column is just the keys). Erasure then runs in CHILD-BEFORE-
    * PARENT topological order (Kahn over the edges; cycles rejected),
    * so a crash mid-cascade can only ever leave ORPHAN-FREE state +
    * un-erased ancestors (re-run completes it) — never a dangling
    * child pointing at an erased parent.
    *
    * Returns the per-table reports in erasure (bottom-up) order. */
  def forgetCascade(spark: SparkSession, dataDir: String,
      parentTable: String, parentKeyCol: String, ids: Seq[Long],
      edges: Seq[(String, CascadeEdge)]): Seq[Report] = {
    require(ids.nonEmpty, "empty tombstone set")
    // a table's key column: the cascade root's is given; every other
    // table's is its childKeyCol (must be consistent across edges)
    val keyColOf: Map[String, String] =
      edges.groupBy(_._2.childTable).map { case (t, es) =>
        val cols = es.map(_._2.childKeyCol).distinct
        require(cols.size == 1,
          s"table '$t' reached with conflicting key columns $cols")
        t -> cols.head
      } + (parentTable -> parentKeyCol)
    edges.foreach { case (from, _) =>
      require(keyColOf.contains(from),
        s"cascade edge from '$from', which no edge reaches and which is " +
          "not the root — unreachable parent")
    }
    // FIXPOINT derivation, not single-pass: with multi-parent shapes
    // (A→X, X→Y, A→B, B→X) one pass misses the X tombstones the B→X
    // edge adds AFTER X→Y already ran. Re-sweep all edges until no set
    // grows; each pass only re-joins edges whose parent set grew, so
    // the loop is bounded by the DAG depth (and a cycle, which can
    // never converge by construction here since key sets are finite
    // and monotone, just stops adding).
    import spark.implicits._
    val tombs = scala.collection.mutable.Map(parentTable -> ids.toSet)
    var grew = true
    while (grew) {
      grew = false
      edges.foreach { case (fromTable, e) =>
        val parentKeys = tombs.getOrElse(fromTable, Set.empty)
        if (parentKeys.nonEmpty) {
          val have = tombs.getOrElse(e.childTable, Set.empty)
          val derived = spark.read
            .parquet(s"$dataDir/${e.childTable}.parquet")
            .join(broadcast(parentKeys.toSeq.toDF(e.fkCol)),
              Seq(e.fkCol), "left_semi")
            .select(col(e.childKeyCol)).distinct()
            .collect().map(_.getLong(0)).toSet
          if (!derived.subsetOf(have)) {
            tombs(e.childTable) = have ++ derived
            grew = true
          }
        }
      }
    }
    // erase in CHILD-BEFORE-PARENT topological order (Kahn over the
    // parent→child edges: a table is erasable once every table it
    // points AT — its children — has been erased), so a crash at any
    // point leaves orphan-free state + un-erased ancestors for the
    // re-run. Insertion order alone is wrong for shapes like
    // (A→X, A→B, B→X), where it would erase B before its child X.
    val tables = keyColOf.keys.toSeq.sorted
    val childrenOf: Map[String, Set[String]] = tables.map { t =>
      t -> edges.collect { case (f, e) if f == t => e.childTable }.toSet
    }.toMap
    val erased = scala.collection.mutable.LinkedHashSet.empty[String]
    while (erased.size < tables.size) {
      val ready = tables.filter(t => !erased.contains(t) &&
        childrenOf(t).forall(erased.contains))
      require(ready.nonEmpty,
        s"cascade edges contain a cycle among ${tables.diff(erased.toSeq)}")
      ready.foreach(erased.add)
    }
    erased.toSeq.flatMap { table =>
      val keys = tombs.getOrElse(table, Set.empty)
      if (keys.isEmpty) None
      else Some(forget(spark, dataDir, table, keyColOf(table),
        keys.toSeq.sorted))
    }
  }

  /** Redact a key's CHANGE HISTORY from the retained feed — the last
    * place a forgotten row survives: [[forgetFromStore]] removes the
    * current image, but every retained feed file still carries the
    * key's past after-images until retention prunes it, and a replay /
    * [[graft.streaming.CdcPipeline.asOf]] read would resurrect them.
    * For hard erasure deadlines shorter than the retention window,
    * this rewrites exactly the feed files containing the tombstoned
    * events, UNDER THEIR ORIGINAL LEAF NAMES (atomic old-aside swap
    * per file): existing checkpoints' source logs stay valid — a
    * committed file is never re-read, so the rewritten content is
    * only seen by NEW readers, which is the point.
    *
    * Call with mirrors tailing this feed STOPPED (a live tail could
    * race a swap mid-listing). Shape: the discovery scan (which files
    * hold the keys) is one distributed pass; the rewrite loops over
    * AFFECTED files only — bounded by the tombstone set's locality,
    * not the feed size, and each feed file is micro-batch-sized by
    * construction. A file whose every event is tombstoned is rewritten
    * empty, not deleted (deleting would confuse nothing — but keeping
    * it preserves the file set that consumer registries and source
    * logs already reference).
    *
    * Returns (filesRewritten, eventsRemoved). */
  def forgetFromFeed(spark: SparkSession, feedDir: String, table: String,
      keys: Seq[Long]): (Long, Long) = {
    require(keys.nonEmpty, "empty tombstone set")
    import graft.streaming.ChangeFeed
    val conf = spark.sparkContext.hadoopConfiguration
    // crash recovery BEFORE discovery: an attempt that died mid-swap
    // left the original ABSENT and the data in its _redact_old_ twin —
    // such a file would not even appear in the discovery scan, so the
    // orphan sweep must run first (restore when the original is
    // missing, drop when the swap completed and only cleanup died)
    val feedPath = new org.apache.hadoop.fs.Path(feedDir)
    val feedFs = feedPath.getFileSystem(conf)
    if (feedFs.exists(feedPath)) feedFs.listStatus(feedPath).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("_redact_old_")) {
        val orig = new org.apache.hadoop.fs.Path(
          st.getPath.getParent, nm.stripPrefix("_redact_old_"))
        if (!feedFs.exists(orig)) {
          if (!feedFs.rename(st.getPath, orig))
            throw new java.io.IOException(
              s"redaction crash recovery failed: ${st.getPath} -> $orig " +
                "returned false")
        } else feedFs.delete(st.getPath, false)
      } else if (nm.startsWith("_redact_scratch_")) {
        feedFs.delete(st.getPath, true)
      }
    }
    def isTomb = col("table") === lit(table) && col("key").isin(keys: _*)
    val affected = ChangeFeed.readAll(spark, feedDir)
      .filter(isTomb)
      .select(expr("_metadata.file_path").as("path")).distinct()
      .collect().map(_.getString(0)).sorted
    var removed = 0L
    affected.foreach { p =>
      // _metadata.file_path may carry URI-encoded forms — hand the raw
      // string to Hadoop's lenient Path parser (the prune discipline)
      val orig = new org.apache.hadoop.fs.Path(p)
      val fs = orig.getFileSystem(conf)
      val scratchDir = new org.apache.hadoop.fs.Path(
        orig.getParent, s"_redact_scratch_${orig.getName}")
      val oldAside = new org.apache.hadoop.fs.Path(
        orig.getParent, s"_redact_old_${orig.getName}")
      // (crash leftovers were swept/restored up front — discovery ran
      // on clean state, so no per-file recovery is needed here)
      val file = spark.read.schema(ChangeFeed.schema).json(p)
      removed += file.filter(isTomb).count()
      file.filter(!isTomb)
        .select(ChangeFeed.schema.fieldNames.map(col).toSeq: _*)
        .coalesce(1).write.json(scratchDir.toString)
      val part = fs.listStatus(scratchDir)
        .map(_.getPath).filter(_.getName.startsWith("part-"))
        .headOption.getOrElse(throw new java.io.IOException(
          s"redaction write produced no part file in $scratchDir"))
      swapIn(fs, part, orig, oldAside)
      fs.delete(scratchDir, true)
    }
    (affected.length.toLong, removed)
  }

  /** Erase keys from a [[graft.streaming.KeyedParquetStore]] table by
    * applying delete tombstones THROUGH the replication merge (the
    * same last-image + idempotent by-PK path a mirror's batches take),
    * WITHOUT touching the applied-LSN watermark: the watermark means
    * "every feed position ≤ this was applied", and synthetic
    * out-of-band LSNs above it would let rotation prune feed files the
    * store never read (eroding exactly the safety margin the
    * watermark exists for). The tombstones' LSNs only order the batch
    * internally.
    *
    * Contract for LIVE-replicated tables: publish `op='D'` events
    * through the FEED instead (one erasure, every mirror converges) —
    * an out-of-band store delete can be resurrected by a lagging
    * mirror later applying an older update of the same key. This
    * helper is for store-resident tables, or mirrors stopped and
    * caught up. */
  def forgetFromStore(spark: SparkSession,
      store: graft.streaming.KeyedParquetStore, table: String,
      keyCol: String, rowSchema: StructType, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "empty tombstone set")
    import spark.implicits._
    val batch = ids.zipWithIndex
      .map { case (id, i) => (i + 1L, id) }
      .toDF("lsn", "key")
      .select(col("lsn"),
        to_timestamp(lit("2000-01-01 00:00:00")).as("commitTs"),
        lit("D").as("op"), lit(table).as("table"), col("key"),
        lit(null).cast("string").as("after"))
    val changes = graft.streaming.CdcPipeline
      .lastImagePerKey(batch, rowSchema, keyCol)
    store.merge(spark, table, changes, keyCol)
  }
}
