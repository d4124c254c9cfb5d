package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Keyed, bucketed parquet table store with idempotent merge — the
  * CDC target (reference: PeerDB's ordered apply to target tables,
  * README.md:231–238) without requiring a transactional table format.
  *
  * Layout: `<root>/<table>/bucket=<b>/part-*.parquet` where
  * `b = pmod(hash(key), nBuckets)`, plus a `_graft_schema.json`
  * sidecar carrying the row schema (schema propagation: target schema
  * derives from source, never hand-declared —
  * quickstart_prepare_peers.sh:80, SURVEY.md §1.3 — and reads never
  * pay parquet-footer schema inference).
  *
  * Scale design (the point of bucketing): a merge only reads and
  * rewrites the buckets that contain changed keys — cost is
  * O(touched buckets), not O(table size). At 100 TB you'd set
  * nBuckets so one bucket ≈ a few GB; a CDC micro-batch touching k
  * keys rewrites ≤ k buckets via dynamic partition overwrite, while
  * the other buckets are never opened (partition pruning on the
  * `bucket` directory column). Reads prune the same way.
  */
object KeyedParquetStore {
  /** Policy for a batch whose declared schema OMITS stored columns —
    * the observable shape of a source column DROP (the CDC path parses
    * change images with the source's declared schema, so an omitted
    * column there means the source no longer has it).
    *
    * Type CHANGES are never subject to policy: they always reject
    * loudly (silent coercion corrupts a mirror) and the operator runs
    * [[KeyedParquetStore.resync]] — the reference workflow's answer to
    * non-additive DDL (PeerDB resync, /root/reference/README.md:231–238). */
  sealed trait DropPolicy
  object DropPolicy {
    /** Pre-r7 default: the stored column survives, rows from narrower
      * batches read as null. Safe for intentionally-partial batches;
      * silently masks a real source drop. */
    case object KeepNullFill extends DropPolicy
    /** Reject the merge loudly, listing the dropped columns; the
      * operator chooses re-sync or an explicit KeepNullFill merge. */
    case object Error extends DropPolicy
  }
}

class KeyedParquetStore(val root: String, val nBuckets: Int = 16) {
  import KeyedParquetStore.DropPolicy

  private def path(table: String) = s"$root/$table"
  private def schemaPath(table: String) = new Path(s"${path(table)}/_graft_schema.json")

  private def bucketOf(key: org.apache.spark.sql.Column) =
    pmod(hash(key), lit(nBuckets))

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, table: String): Boolean =
    fs(spark).exists(schemaPath(table))

  private def watermarkPath = new Path(s"$root/_graft_applied_lsn")
  private def commitTsPath = new Path(s"$root/_graft_applied_commit_ts")

  /** Record the highest fully-applied LSN (monotonic — a replayed
    * batch's lower max never regresses it). The watermark is what
    * makes feed retention self-serve: [[CdcPipeline.rotateCheckpoint]]
    * prunes at `appliedLsn - safety` without the operator tracking
    * positions out of band. Tiny atomic file (create-overwrite of a
    * one-line value) per micro-batch — the same cost class as the
    * checkpoint's own commit marker.
    *
    * `commitTs` (the watermark event's source commit timestamp, when
    * the apply path has it) lands in a sibling sidecar under the same
    * monotonic gate, RECORDED WITH THE LSN IT BELONGS TO (`"<lsn>
    * <millis>"`) — it is the "applied as of <source time>" half of
    * the seconds-behind-source lag metric
    * ([[CdcPipeline.timeLagSeconds]]). A later batch that advances the
    * LSN but carries no commitTs leaves the sidecar at the OLDER lsn,
    * so the staleness is detectable ([[appliedCommitTs]] then reads
    * unknown instead of overstating lag against a stale stamp).
    * Pre-r16 stores simply lack the file and the metric reads as
    * unknown. */
  def recordAppliedLsn(spark: SparkSession, lsn: Long,
      commitTs: Option[java.sql.Timestamp] = None): Unit =
    if (appliedLsn(spark).forall(_ < lsn)) {
      // OVERWRITING atomic rename from a per-call-unique tmp
      // ([[AtomicFiles]]), not delete-then-rename: a concurrent reader
      // (Monitor.replicationInfra, rotateIfOversized on a cadence
      // thread) must never observe the gap where the watermark is
      // absent, a crash must not lose it until the next batch, and two
      // mirrors sharing one store write CONCURRENTLY — racing
      // lower-LSN writers are the benign pre-existing race (a lower
      // watermark only means extra idempotent replay, never loss)
      AtomicFiles.writeAtomically(spark, watermarkPath, lsn.toString)
      commitTs.foreach(t =>
        AtomicFiles.writeAtomically(spark, commitTsPath, s"$lsn ${t.getTime}"))
    }

  /** The commit-time stamp with the LSN it was recorded at: (lsn,
    * source commit timestamp). Pre-r17 sidecars carried only the
    * millis — they parse with lsn = -1 (provenance unknown). */
  def appliedCommitTsAt(spark: SparkSession): Option[(Long, java.sql.Timestamp)] = {
    val f = fs(spark)
    if (!f.exists(commitTsPath)) None
    else {
      val in = f.open(commitTsPath)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      s.split("\\s+") match {
        case Array(lsn, ms) => Some((lsn.toLong, new java.sql.Timestamp(ms.toLong)))
        case Array(ms) => Some((-1L, new java.sql.Timestamp(ms.toLong)))
        case _ => None
      }
    }
  }

  /** Source commit timestamp at the applied watermark, if recorded
    * AND CURRENT: the stamp is honored only while its recorded LSN
    * equals the applied watermark — after a commitTs-less LSN advance
    * the metric honestly reads unknown rather than overstating lag
    * against a stale stamp. Legacy single-value sidecars (lsn
    * unknowable) stay honored for replay compatibility. */
  def appliedCommitTs(spark: SparkSession): Option[java.sql.Timestamp] =
    appliedCommitTsAt(spark).collect {
      case (l, t) if l < 0 || appliedLsn(spark).contains(l) => t
    }

  /** The highest applied LSN, if any batch has been applied. */
  def appliedLsn(spark: SparkSession): Option[Long] = {
    val f = fs(spark)
    if (!f.exists(watermarkPath)) None
    else {
      val in = f.open(watermarkPath)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(s.toLong)
    }
  }

  private def writeSchema(spark: SparkSession, table: String, schema: StructType): Unit = {
    val out = fs(spark).create(schemaPath(table), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** The persisted row schema (without the bucket partition column). */
  def schemaOf(spark: SparkSession, table: String): StructType = {
    val in = fs(spark).open(schemaPath(table))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    DataType.fromJson(json).asInstanceOf[StructType]
  }

  /** Current bucket ids present on disk. */
  private def bucketsOnDisk(spark: SparkSession, table: String): Seq[Int] =
    fs(spark).listStatus(new Path(path(table)))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(_.getPath.getName.stripPrefix("bucket=").toInt).toSeq

  /** Read the current state of a table. Schema comes from the sidecar
    * — an emptied table reads as an empty DataFrame, and no parquet
    * footers are opened for inference. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val schema = schemaOf(spark, table)
    if (bucketsOnDisk(spark, table).isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      spark.read.schema(schema).parquet(path(table)).drop("bucket")
    }
  }

  /** [[read]] restricted to the buckets that could hold any of
    * `keys` — a bucket=… PARTITION filter, so Spark prunes the other
    * buckets' files before any read. For a lookup join against a
    * small key set (a micro-batch's markers, a delete slice) this
    * turns a full-table scan into O(buckets the keys hash to); the
    * driver collect is bounded by nBuckets, exactly like [[merge]]'s
    * touched-bucket pass. Falls back to the full [[read]] when the
    * keys cover every bucket. */
  def readForKeys(spark: SparkSession, table: String, keys: DataFrame,
      keyCol: String): DataFrame = {
    val schema = schemaOf(spark, table)
    if (bucketsOnDisk(spark, table).isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val touched = keys.select(bucketOf(col(keyCol)).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.size >= nBuckets) read(spark, table)
    else spark.read.schema(schema).parquet(path(table))
      .filter(col("bucket").isin(touched: _*))
      .drop("bucket")
  }

  /** Initial snapshot load (CDC snapshot-then-stream handoff,
    * flow-snapshot-worker docker-compose.yml:133–141): bulk-write the
    * source image partitioned by key bucket. */
  def snapshot(spark: SparkSession, table: String, source: DataFrame, keyCol: String): Unit = {
    require(!source.columns.contains("bucket"),
      s"table '$table' has a 'bucket' column — it collides with the store's partition column")
    // full overwrite: a prior merge() leaves partitionOverwriteMode=
    // dynamic session-wide, under which this write would only replace
    // buckets present in `source` and leave stale buckets on disk
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    source
      .withColumn("bucket", bucketOf(col(keyCol)))
      .repartition(col("bucket"))
      .write
      .partitionBy("bucket")
      .mode(SaveMode.Overwrite)
      .parquet(path(table))
    writeSchema(spark, table, source.schema)
  }

  /** Additive schema evolution (the PeerDB-style schema propagation —
    * target schema follows source): the union keeps every stored field
    * and appends incoming fields that are new, in batch order. Type
    * changes are rejected loudly — silent coercion corrupts a mirror.
    * Old parquet files are never rewritten: reads give explicit
    * schemas, and the parquet reader null-fills columns a file
    * predates. */
  private def unionSchema(stored: StructType, incoming: StructType): StructType = {
    incoming.foreach { f =>
      stored.find(_.name == f.name).foreach { old =>
        require(old.dataType == f.dataType,
          s"schema evolution cannot change type of '${f.name}': " +
            s"${old.dataType.simpleString} -> ${f.dataType.simpleString}. " +
            "Retypes are non-additive - re-sync the table from the source " +
            "image (KeyedParquetStore.resync) as the reference workflow does")
      }
    }
    StructType(stored.fields ++
      incoming.fields.filterNot(f => stored.fieldNames.contains(f.name)))
  }

  /** Project `df` to `schema` + bucket, null-padding absent columns. */
  private def alignTo(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } :+ col("bucket"): _*)

  /** Idempotent merge of a deduped change set into the table.
    *
    * `changes` must carry exactly one row per key (last-write-wins
    * already applied upstream — see [[CdcPipeline.applyBatch]]) with
    * columns: `op` ("I"|"U"|"D"), the key column, and the full row
    * image for upserts. The batch schema may be WIDER than the stored
    * one (new source columns) or narrower (columns absent from this
    * batch) — see [[unionSchema]]; existing rows get nulls for new
    * columns, new rows get nulls for omitted ones.
    *
    * Only buckets containing changed keys are read + rewritten
    * (dynamic partition overwrite). Re-applying the same change set
    * is a no-op — effective exactly-once on top of Spark's
    * at-least-once foreachBatch (SURVEY.md §2.8 C5).
    */
  def merge(spark: SparkSession, table: String, changes: DataFrame, keyCol: String,
      dropPolicy: DropPolicy = DropPolicy.KeepNullFill): Unit = {
    require(!changes.columns.contains("bucket"),
      s"table '$table' has a 'bucket' column — it collides with the store's partition column")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val keyed = changes.withColumn("bucket", bucketOf(col(keyCol)))
    val dataSchema = StructType(changes.schema.filterNot(_.name == "op"))
    if (dropPolicy == DropPolicy.Error && exists(spark, table)) {
      val dropped = schemaOf(spark, table).fieldNames
        .filterNot(dataSchema.fieldNames.contains)
      require(dropped.isEmpty,
        s"table '$table': batch schema omits stored column(s) " +
          s"${dropped.mkString("[", ", ", "]")} under DropPolicy.Error - " +
          "a source column drop is non-additive; re-sync the table " +
          "(KeyedParquetStore.resync) or merge with DropPolicy.KeepNullFill")
    }

    if (!exists(spark, table) || bucketsOnDisk(spark, table).isEmpty) {
      keyed.filter(col("op") =!= "D").drop("op")
        .repartition(col("bucket"))
        .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(path(table))
      writeSchema(spark, table, dataSchema)
      return
    }

    // Buckets touched by this batch. Key-set per micro-batch is small
    // relative to the table (CDC batches, insert.ps1:11–13) — collect
    // is bounded by nBuckets, never by table size.
    val touched = keyed.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return

    val schema = schemaOf(spark, table)
    val target = unionSchema(schema, dataSchema)
    val current = spark.read.schema(schema).parquet(path(table))
      .filter(col("bucket").isin(touched: _*))

    val changedKeys = keyed.select(col(keyCol), col("bucket")).distinct()
    val survivors = current.join(
      changedKeys.select(keyCol), Seq(keyCol), "left_anti")
    val upserts = keyed.filter(col("op") =!= "D").drop("op")

    val merged = alignTo(survivors, target)
      .unionByName(alignTo(upserts, target))
      // Break lineage from the files about to be overwritten (Spark
      // refuses to overwrite a path it is also reading from) and
      // materialize exactly once. Bounded by the touched buckets.
      .localCheckpoint(true)

    // Dynamic overwrite replaces only the bucket=... dirs present in
    // `merged`. A touched bucket whose rows were ALL deleted is absent
    // from `merged` — clear it explicitly or deletes would resurface.
    val remaining = merged.select("bucket").distinct().collect().map(_.getInt(0)).toSet
    val emptied = touched.filterNot(remaining)
    if (emptied.nonEmpty) {
      val f = fs(spark)
      emptied.foreach { b =>
        f.delete(new Path(s"${path(table)}/bucket=$b"), true)
      }
    }

    if (remaining.nonEmpty) {
      merged
        .repartition(col("bucket"))
        .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(path(table))
    }
    // persist the (possibly widened) schema AFTER the data write, so a
    // crash between the two leaves a readable store (old sidecar, old
    // columns) rather than a sidecar promising columns no file carries
    // in rewritten buckets
    if (target != schema) writeSchema(spark, table, target)
  }

  /** Non-additive evolution path — the reference workflow's RESYNC
    * (drop the target table, re-snapshot from the source with the new
    * schema, then resume the stream; /root/reference/README.md:231–238).
    * Column drops and retypes both land here: the stored files and the
    * schema sidecar are replaced wholesale, so no file on disk ever
    * disagrees with the sidecar about a column's type. */
  def resync(spark: SparkSession, table: String, source: DataFrame, keyCol: String): Unit = {
    fs(spark).delete(new Path(path(table)), true)
    snapshot(spark, table, source, keyCol)
  }

  /** Drop a table wholesale — data files and schema sidecar. The
    * target half of the mirror DROP lifecycle
    * ([[CdcPipeline.drop]]); also the first step of [[resync]]. */
  def drop(spark: SparkSession, table: String): Unit =
    fs(spark).delete(new Path(path(table)), true)

  /** Per-bucket file statistics — drives compaction decisions and the
    * monitoring table-stats report. */
  def bucketStats(spark: SparkSession, table: String): Seq[(Int, Int, Long)] = {
    val f = fs(spark)
    bucketsOnDisk(spark, table).sorted.map { b =>
      val files = f.listStatus(new Path(s"${path(table)}/bucket=$b"))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      (b, files.length, files.map(_.getLen).sum)
    }
  }

  /** Total parquet FOOTER metadata bytes across a table's files — the
    * store's closest analogue to `pg_indexes_size`: parquet footers
    * carry the column/offset indexes and row-group min/max zone maps
    * that serve the same pruning role as btree pages. Footer length is
    * the little-endian int32 in the 8-byte `len + "PAR1"` trailer. */
  def footerBytes(spark: SparkSession, table: String): Long = {
    val f = fs(spark)
    bucketsOnDisk(spark, table).map { b =>
      f.listStatus(new Path(s"${path(table)}/bucket=$b"))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map { s =>
          val in = f.open(s.getPath)
          try {
            in.seek(s.getLen - 8)
            val tail = new Array[Byte](4)
            in.readFully(tail)
            ((tail(0) & 0xffL) | ((tail(1) & 0xffL) << 8) |
              ((tail(2) & 0xffL) << 16) | ((tail(3) & 0xffL) << 24)) + 8L
          } finally in.close()
        }.sum
    }.sum
  }

  /** Compact every bucket to one file per bucket. Continuous CDC
    * merging accretes small files (each dynamic overwrite writes at
    * least one file per touched bucket); at scale a periodic compactor
    * keeps scan task counts proportional to data volume, not merge
    * history. Contents are untouched — only file layout changes.
    *
    * Optional `clusterBy`: sort rows by these columns within each
    * bucket during the rewrite. Parquet row-group min/max statistics
    * (zone maps) then become disjoint ranges on those columns, so
    * range/point predicates skip whole row groups at scan time — the
    * parquet-native analogue of clustered-index maintenance.
    *
    * Returns the number of rows PURGED by `dropWhere` (0 when none is
    * given), counted against the same checkpointed read the rewrite
    * consumes — so the count and the purge can never disagree, even
    * when a concurrent `applyBatchSoft` lands mid-compact (rows it
    * expires are simply part of the NEXT cycle).
    *
    * Crash window: the fully-purged-bucket cleanup below runs as a
    * separate FS pass AFTER the dynamic-overwrite commit. A crash
    * between the two leaves such a bucket's old file in place and its
    * dropped rows visible again until the next cadence run — the purge
    * predicate is stable (`expired` only grows), so a re-run heals it
    * idempotently; durability of a purge is therefore "by the end of
    * the next completed cadence cycle", not "at job exit". */
  def compact(spark: SparkSession, table: String, clusterBy: Seq[String] = Nil,
      dropWhere: Option[Column] = None): Long = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val schema = schemaOf(spark, table)
    val before = bucketsOnDisk(spark, table)
    if (before.isEmpty) return 0L
    val current = spark.read.schema(schema).parquet(path(table))
      .localCheckpoint(true) // break lineage from the files being replaced
    try {
      // `dropWhere` rows are PURGED during the rewrite — retention
      // folded into the compaction pass the cadence already pays, one
      // table rewrite instead of discovery + merge + compact as
      // separate jobs (CdcPipeline.sweepAndCompact's contract). A row
      // where the predicate evaluates to NULL (e.g. null _deleted) is
      // KEPT — retention must fail toward retaining.
      val kept = dropWhere.fold(current)(c =>
        current.filter(!coalesce(c, lit(false))))
      kept
        .repartition(col("bucket"))
        .sortWithinPartitions((col("bucket") +: clusterBy.map(col)): _*)
        .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(path(table))
      // dynamic overwrite leaves a bucket's OLD file in place when the
      // rewrite emits no rows for it — a fully-purged bucket must be
      // cleared explicitly or its dropped rows resurrect (the distinct
      // below reads the CHECKPOINTED blocks, not the replaced files)
      dropWhere.fold(0L) { c =>
        val after = kept.select(col("bucket").cast("int")).distinct()
          .collect().map(_.getInt(0)).toSet
        val f = fs(spark)
        before.filterNot(after).foreach(b =>
          f.delete(new Path(path(table), s"bucket=$b"), true))
        // same checkpointed blocks the rewrite read — count == purge
        current.filter(coalesce(c, lit(false))).count()
      }
    } finally
      // a compaction CADENCE (sweepAndCompact) must not accumulate one
      // generation of checkpoint blocks per cycle
      org.apache.spark.sql.graftbridge.Bridge.persistedRdd(current)
        .foreach(_.unpersist(blocking = false))
  }
}
