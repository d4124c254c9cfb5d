package graft.tools

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.Workload
import graft.streaming.{CdcPipeline, ChangeFeed, KeyedParquetStore, StreamMetrics}

/** CDC insert-throughput benchmark — the measured counterpart of the
  * reference's ONE published performance number (1.04 ops/s insert
  * throughput, README.md:131–137, which BASELINE.md identifies as
  * sleep-dominated pipeline latency, not an engine ceiling).
  *
  * Two surfaces, both ending in the same idempotent bucketed merge:
  *
  *  1. `batch_apply` — the insert.ps1 batch loop (250–334) spelled as
  *     direct [[CdcPipeline.applyBatch]] calls:
  *     [[Workload.runBatchedInsert]] with per-batch latency accounting
  *     and the reference's count reconciliation (insert.ps1:426–431).
  *  2. `streaming` — the end-to-end path: change events landed on a
  *     file [[ChangeFeed]], tailed by a checkpointed
  *     [[CdcPipeline.start]] mirror with `maxFilesPerTrigger`
  *     backpressure, measured via [[StreamMetrics]] (the engine-native
  *     replacement for the reference's log-scraped metrics).
  *
  * Run standalone (`runMain graft.tools.CdcThroughput`) or embedded —
  * [[graft.Bench]] calls [[measure]] once per bench run and carries
  * the numbers in its JSON artifact, so every BENCH_r{N}.json has a
  * reproducible streaming figure beside the query timings.
  */
object CdcThroughput {

  /** Recursive (bytes, fileCount) of a directory tree. */
  private def dirStats(root: String): (Long, Long) = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(p)) return (0L, 0L)
    var bytes = 0L
    var files = 0L
    val s = java.nio.file.Files.walk(p)
    try s.forEach { f =>
      if (java.nio.file.Files.isRegularFile(f)) {
        bytes += java.nio.file.Files.size(f); files += 1
      }
    } finally s.close()
    (bytes, files)
  }

  /** Count of `.compact` files under a checkpoint subtree — Structured
    * Streaming compacts its file-source and sink logs every
    * `compactInterval` (default 10) batches; the cadence is the
    * evidence that metadata growth is O(batches / interval) rewritten
    * logs, not an ever-growing flat list. */
  private def compactCount(root: String): Long = {
    val p = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(p)) return 0L
    var n = 0L
    val s = java.nio.file.Files.walk(p)
    try s.forEach(f => if (f.toString.endsWith(".compact")) n += 1) finally s.close()
    n
  }

  private def halfAvg(xs: Seq[Long]): (Double, Double) = {
    if (xs.isEmpty) return (0.0, 0.0)
    val (h1, h2) = xs.splitAt(xs.length / 2)
    def avg(a: Seq[Long]) = if (a.isEmpty) 0.0 else a.sum.toDouble / a.length
    (avg(h1), avg(h2))
  }

  /** One measured run; returns flat metric → value pairs. Beyond the
    * throughput figures, reports STATE-GROWTH evidence (r9 verdict ask
    * #7): first-half vs second-half per-batch latency (a steady-state
    * pipeline shows no drift — per-batch work is bounded by the batch,
    * not by history), checkpoint bytes/files + compaction-file count
    * (metadata is compacted on a fixed cadence, so it grows with
    * batches/interval, not batches), and store bytes/files (the store
    * overwrites touched buckets in place, so files track buckets, not
    * merge history). */
  def measure(spark: SparkSession, rows: Long = 20000L,
      batchSize: Int = 1000): Seq[(String, Double)] = {
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_bench").toString

    // dimensions + deterministic order workload (seeded, FK-valid)
    val customers = spark.range(1, 501).toDF("id")
    val products = spark.range(1, 101).toDF("id")
    val orders = Workload.generateOrders(customers, products, rows,
      startId = 1L, seed = 42L, asOf = Date.valueOf("2026-01-01"))
      .localCheckpoint(true) // one materialization; batches filter it

    // ── surface 1: the insert.ps1 batch-apply loop
    val storeA = new KeyedParquetStore(s"$work/store_batch")
    val m = Workload.runBatchedInsert(spark, storeA, "orders", orders, batchSize)
    // count reconciliation — the reference's success criterion
    val applied = storeA.read(spark, "orders").count()
    require(applied == rows, s"reconciliation failed: $applied != $rows")

    // ── surface 2: end-to-end streaming mirror over a file feed
    val schema = orders.schema
    val changes = orders.select(
      col("id").as("lsn"),
      lit(new Timestamp(0)).as("commitTs"),
      lit("I").as("op"),
      lit("orders").as("table"),
      col("id").cast("long").as("key"),
      to_json(struct(schema.fieldNames.map(col).toSeq: _*)).as("after"))
    // one feed file per insert batch; maxFilesPerTrigger=1 makes each
    // micro-batch process exactly one landed batch (the reference's
    // batch pacing), so per-batch latency is comparable to surface 1
    val nFiles = math.ceil(rows.toDouble / batchSize).toInt
    ChangeFeed.publish(changes.repartition(nFiles), s"$work/feed")

    val storeB = new KeyedParquetStore(s"$work/store_stream")
    val metrics = StreamMetrics.attach(spark)
    val t0 = System.nanoTime()
    val q = CdcPipeline.start(
      ChangeFeed.stream(spark, s"$work/feed", maxFilesPerTrigger = 1),
      storeB,
      Map("orders" -> schema),
      Map("orders" -> "id"),
      mirrorName = "cdc_bench_mirror",
      checkpointDir = s"$work/ckpt")
    q.processAllAvailable()
    q.stop()
    val streamWallS = (System.nanoTime() - t0) / 1e9
    val streamed = storeB.read(spark, "orders").count()
    require(streamed == rows, s"stream reconciliation failed: $streamed != $rows")
    val progRows = metrics.progressDf(spark)
      .filter(col("num_input_rows") > 0)
      .orderBy("batch_id")
      .select("duration_ms", "add_batch_ms", "get_batch_ms",
        "latest_offset_ms", "query_planning_ms", "wal_commit_ms",
        "commit_offsets_ms")
      .collect()
    val prog = progRows.map(_.getLong(0)).toSeq
    // WHERE each trigger's time goes (r10 verdict ask #6 — the mirror
    // carried ~2.3× the raw batch-apply latency, unattributed):
    // addBatch is the sink doing the same merge surface 1 does; the
    // rest is streaming machinery (source listing, planning, offset +
    // commit WAL fsyncs) — reported per phase so the overhead has a
    // name instead of a suspicion
    def phaseAvg(i: Int): Double =
      if (progRows.isEmpty) 0.0
      else progRows.map(_.getLong(i)).sum.toDouble / progRows.length
    spark.streams.removeListener(metrics)

    val (baH1, baH2) = halfAvg(m.latenciesMs)
    val (stH1, stH2) = halfAvg(prog)
    val (ckptBytes, ckptFiles) = dirStats(s"$work/ckpt")
    val (storeBytes, storeFiles) = dirStats(s"$work/store_stream")

    Seq(
      "rows" -> rows.toDouble,
      "batch_apply_rows_per_sec" -> m.throughputRowsPerSec,
      "batch_apply_n_batches" -> m.nBatches.toDouble,
      "batch_apply_avg_batch_ms" -> m.avgBatchMs,
      "batch_apply_min_batch_ms" -> m.minBatchMs.toDouble,
      "batch_apply_max_batch_ms" -> m.maxBatchMs.toDouble,
      "batch_apply_avg_batch_ms_h1" -> baH1,
      "batch_apply_avg_batch_ms_h2" -> baH2,
      "streaming_rows_per_sec" -> rows / streamWallS,
      "streaming_n_batches" -> prog.length.toDouble,
      "streaming_min_batch_ms" -> (if (prog.isEmpty) 0.0 else prog.min.toDouble),
      "streaming_avg_batch_ms" ->
        (if (prog.isEmpty) 0.0 else prog.sum.toDouble / prog.length),
      "streaming_max_batch_ms" -> (if (prog.isEmpty) 0.0 else prog.max.toDouble),
      "streaming_avg_batch_ms_h1" -> stH1,
      "streaming_avg_batch_ms_h2" -> stH2,
      "streaming_avg_addbatch_ms" -> phaseAvg(1),
      "streaming_avg_getbatch_ms" -> phaseAvg(2),
      "streaming_avg_latestoffset_ms" -> phaseAvg(3),
      "streaming_avg_planning_ms" -> phaseAvg(4),
      "streaming_avg_walcommit_ms" -> phaseAvg(5),
      "streaming_avg_commitoffsets_ms" -> phaseAvg(6),
      "ckpt_bytes" -> ckptBytes.toDouble,
      "ckpt_files" -> ckptFiles.toDouble,
      "ckpt_compact_files" -> compactCount(s"$work/ckpt").toDouble,
      "store_bytes" -> storeBytes.toDouble,
      "store_files" -> storeFiles.toDouble,
      "reference_ops_per_sec" -> 1.04)
  }

  /** The x40 RETENTION measurement (r11 verdict ask #5): two
    * equal-size streaming phases with FEED PRUNING + CHECKPOINT
    * ROTATION between them ([[ChangeFeed.prune]]). Background: the
    * file-source compact log retains every entry forever
    * (`CompactibleFileStreamLog.shouldRetain` ≡ true in OSS Spark —
    * r11's claim that `maxFileAge` ages entries out was wrong), so
    * WITHOUT rotation checkpoint bytes keep the measured ~520 B/batch
    * linear floor (base/x10/x20 trend). With rotation the phase-2
    * checkpoint re-lists only the surviving feed tail: its final
    * footprint must land at phase-1's O(window) size instead of 2×.
    * The prune watermark deliberately trails the applied watermark by
    * two batches, so the rotated mirror RE-READS two files and the
    * by-PK idempotent merge must absorb them — the rotation-safety
    * claim, exercised at full scale (reconciliation requires
    * exactly-once totals). */
  def measureRotate(spark: SparkSession, halfRows: Long = 400000L,
      batchSize: Int = 1000): Seq[(String, Double)] = {
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_rotate").toString
    val customers = spark.range(1, 501).toDF("id")
    val products = spark.range(1, 101).toDF("id")
    val nFiles = math.ceil(halfRows.toDouble / batchSize).toInt
    def publishPhase(startId: Long): org.apache.spark.sql.types.StructType = {
      val orders = Workload.generateOrders(customers, products, halfRows,
        startId = startId, seed = 42L + startId,
        asOf = Date.valueOf("2026-01-01")).localCheckpoint(true)
      val schema = orders.schema
      val changes = orders.select(
        col("id").as("lsn"),
        lit(new Timestamp(0)).as("commitTs"),
        lit("I").as("op"),
        lit("orders").as("table"),
        col("id").cast("long").as("key"),
        to_json(struct(schema.fieldNames.map(col).toSeq: _*)).as("after"))
      // A real feed lands in COMMIT ORDER: each file is a contiguous
      // LSN window (the decoder drains the WAL sequentially). Range-
      // partition by lsn to reproduce that layout — a round-robin
      // repartition would scatter near-max LSNs into every file and
      // make the watermark prune a no-op (nothing is fully applied).
      ChangeFeed.publish(
        changes.repartitionByRange(nFiles, col("lsn")), s"$work/feed")
      schema
    }
    val store = new KeyedParquetStore(s"$work/store")
    def runPhase(schema: org.apache.spark.sql.types.StructType,
        ckpt: String): Double = {
      val t0 = System.nanoTime()
      val q = CdcPipeline.start(
        ChangeFeed.stream(spark, s"$work/feed", maxFilesPerTrigger = 1),
        store, Map("orders" -> schema), Map("orders" -> "id"),
        mirrorName = "cdc_rotate_mirror", checkpointDir = ckpt)
      q.processAllAvailable()
      q.stop()
      (System.nanoTime() - t0) / 1e9
    }
    val s1 = publishPhase(1L)
    val w1 = runPhase(s1, s"$work/ckpt")
    val (b1, f1) = dirStats(s"$work/ckpt")
    // rotation through the PRODUCT operation (r12 ask #6 — the bench
    // drives CdcPipeline.rotateCheckpoint, not hand-rolled prune
    // choreography): the applied watermark comes from the store's own
    // sidecar, the safety margin holds back two batches so the rotated
    // mirror re-reads those files and the merge must absorb them, and
    // the SAME checkpoint path restarts fresh
    val rotation = CdcPipeline.rotateCheckpoint(spark, store,
      s"$work/feed", "cdc_rotate_mirror", s"$work/ckpt",
      safetyLsns = 2L * batchSize)
    require(rotation.rotated, s"rotation skipped: ${rotation.skipped}")
    val (pruned, kept) = (rotation.prunedFiles, rotation.keptFiles)
    val s2 = publishPhase(halfRows + 1L)
    val w2 = runPhase(s2, s"$work/ckpt")
    val (b2, f2) = dirStats(s"$work/ckpt")
    val applied = store.read(spark, "orders").count()
    require(applied == 2L * halfRows,
      s"rotation reconciliation failed: $applied != ${2L * halfRows}")
    Seq(
      "rows" -> 2.0 * halfRows,
      "batches_per_phase" -> nFiles.toDouble,
      "feed_files_pruned" -> pruned.toDouble,
      "feed_files_replayed" -> kept.toDouble,
      "phase1_wall_s" -> w1,
      "phase2_wall_s" -> w2,
      "phase1_ckpt_bytes" -> b1.toDouble,
      "phase2_ckpt_bytes" -> b2.toDouble,
      "phase1_ckpt_files" -> f1.toDouble,
      "phase2_ckpt_files" -> f2.toDouble,
      // < 1 means the rotated second half ended SMALLER than the
      // first half's footprint; ~2 would mean the linear floor
      "rotate_bytes_ratio" -> (if (b1 == 0) 0.0 else b2.toDouble / b1))
  }

  /** Multi-consumer retention measured END-TO-END (r14): two mirrors
    * tailing ONE feed — the reference's several-slots-one-WAL shape.
    * Phase 1: both consume, A's rotation prunes at the registry
    * intersection (B caught up ⇒ near-full prune). Phase 2 lands while
    * B is DEAD: A's rotation keeps everything B has not committed (the
    * retention drag made measurable), the byte-budget policy then
    * invalidates B (`max_slot_wal_keep_size` analogue), and A's next
    * rotation drains the feed. Throughout: A's store exactly-once at
    * 2×halfRows, B retains exactly phase 1, and B's restart FAILS
    * LOUDLY (asserted). */
  def measureTwoMirrors(spark: SparkSession, halfRows: Long = 100000L,
      batchSize: Int = 1000): Seq[(String, Double)] = {
    val work = java.nio.file.Files
      .createTempDirectory("graft_cdc_two").toString
    val feed = s"$work/feed"
    val customers = spark.range(1, 501).toDF("id")
    val products = spark.range(1, 101).toDF("id")
    val nFiles = math.ceil(halfRows.toDouble / batchSize).toInt
    def publishPhase(startId: Long): org.apache.spark.sql.types.StructType = {
      val orders = Workload.generateOrders(customers, products, halfRows,
        startId = startId, seed = 42L + startId,
        asOf = Date.valueOf("2026-01-01")).localCheckpoint(true)
      val schema = orders.schema
      val changes = orders.select(
        col("id").as("lsn"), lit(new Timestamp(0)).as("commitTs"),
        lit("I").as("op"), lit("orders").as("table"),
        col("id").cast("long").as("key"),
        to_json(struct(schema.fieldNames.map(col).toSeq: _*)).as("after"))
      ChangeFeed.publish(
        changes.repartitionByRange(nFiles, col("lsn")), feed)
      schema
    }
    val storeA = new KeyedParquetStore(s"$work/storeA")
    val storeB = new KeyedParquetStore(s"$work/storeB")
    def run(name: String, ckpt: String, store: KeyedParquetStore,
        schema: org.apache.spark.sql.types.StructType): Double = {
      val t0 = System.nanoTime()
      val q = CdcPipeline.start(
        ChangeFeed.stream(spark, feed, maxFilesPerTrigger = 1),
        store, Map("orders" -> schema), Map("orders" -> "id"),
        mirrorName = name, checkpointDir = ckpt, feedDir = Some(feed))
      q.processAllAvailable(); q.stop()
      (System.nanoTime() - t0) / 1e9
    }
    val s1 = publishPhase(1L)
    val wA1 = run("mirror_a", s"$work/ckptA", storeA, s1)
    val wB1 = run("mirror_b", s"$work/ckptB", storeB, s1)
    // both caught up: the intersection gate prunes near-fully
    val rotBoth = CdcPipeline.rotateCheckpoint(spark, storeA, feed,
      "mirror_a", s"$work/ckptA", safetyLsns = 2L * batchSize)
    require(rotBoth.rotated, s"rotation skipped: ${rotBoth.skipped}")
    run("mirror_a", s"$work/ckptA", storeA, s1) // re-commit survivors
    // phase 2 with B dead: the laggard's drag must hold the feed
    val s2 = publishPhase(halfRows + 1L)
    val wA2 = run("mirror_a", s"$work/ckptA", storeA, s2)
    val bHeld = CdcPipeline.consumerLag(spark, feed)
      .find(_.name == "mirror_b").map(_.heldFiles).getOrElse(-1L)
    val rotLag = CdcPipeline.rotateCheckpoint(spark, storeA, feed,
      "mirror_a", s"$work/ckptA", safetyLsns = 2L * batchSize)
    require(rotLag.rotated, s"rotation skipped: ${rotLag.skipped}")
    run("mirror_a", s"$work/ckptA", storeA, s2)
    // budget invalidation unblocks retention — TWO-STRIKE policy:
    // the first sweep records the strike, the second invalidates
    val strike = CdcPipeline
      .invalidateConsumersOverBudget(spark, feed, maxHeldBytes = 1L)
    require(strike.isEmpty, s"first sweep must only strike: $strike")
    val inv = CdcPipeline
      .invalidateConsumersOverBudget(spark, feed, maxHeldBytes = 1L)
    require(inv.map(_.name) == Seq("mirror_b"), s"invalidated: $inv")
    val rotFree = CdcPipeline.rotateCheckpoint(spark, storeA, feed,
      "mirror_a", s"$work/ckptA", safetyLsns = 2L * batchSize)
    require(rotFree.rotated, s"rotation skipped: ${rotFree.skipped}")
    val rowsA = storeA.read(spark, "orders").count()
    val rowsB = storeB.read(spark, "orders").count()
    require(rowsA == 2L * halfRows && rowsB == halfRows,
      s"exactly-once broken: A=$rowsA B=$rowsB")
    val bRestartFails = scala.util.Try(
      run("mirror_b", s"$work/ckptB", storeB, s2)).isFailure
    require(bRestartFails, "invalidated mirror restart must fail loudly")
    Seq(
      "rows_a" -> rowsA.toDouble,
      "rows_b" -> rowsB.toDouble,
      "batches_per_phase" -> nFiles.toDouble,
      "phase1_pruned_both_live" -> rotBoth.prunedFiles.toDouble,
      "phase1_kept_both_live" -> rotBoth.keptFiles.toDouble,
      "b_held_files_while_dead" -> bHeld.toDouble,
      "phase2_pruned_b_dead" -> rotLag.prunedFiles.toDouble,
      "phase2_kept_b_dead" -> rotLag.keptFiles.toDouble,
      "pruned_after_invalidation" -> rotFree.prunedFiles.toDouble,
      "kept_after_invalidation" -> rotFree.keptFiles.toDouble,
      "b_restart_fails" -> (if (bRestartFails) 1.0 else 0.0),
      "wall_a_phase1_s" -> wA1,
      "wall_b_phase1_s" -> wB1,
      "wall_a_phase2_s" -> wA2)
  }

  /** Replace `key`'s block in an existing CDC_BENCH.json body (blocks
    * are flat — no nested braces) and append the new one. */
  /** Marked-vs-plain apply cost — what the unchanged-TOAST gate
    * actually buys and what the marked path actually costs. Two
    * identical pure-update workloads over the same seeded store, one
    * with a 25% marker share: the plain run must take the
    * expansion-free window-dedup path (the gate working), the marked
    * run pays the per-key aggregate + the store read-back fallback
    * PER BATCH. Batch-apply surface only — the streaming machinery
    * around it is identical and already attributed per phase. */
  def measureToast(spark: SparkSession, rows: Long = 50000L,
      batchSize: Int = 1000): Seq[(String, Double)] = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val work = java.nio.file.Files.createTempDirectory("graft_cdc_toast").toString
    val nKeys = 5000L
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("w", LongType)))
    val keys = spark.range(1, nKeys + 1).toDF("id")
    val seed = spark.range(1, nKeys + 1).select(col("id"),
      concat(lit("wide_"), col("id")).as("v"), lit(0L).as("w"))
    def run(name: String, pToast: Double): Double = {
      val store = new KeyedParquetStore(s"$work/store_$name")
      store.snapshot(spark, "t", seed, "id")
      val changes = Workload.generateChanges(keys, "t", rows,
        startLsn = 1000L, seed = 77L,
        afterJson = (key, lsn) => to_json(struct(key.as("id"),
          concat(lit("v"), lsn).as("v"), lsn.as("w"))),
        mix = (0.0, 0.0), pToast = pToast,
        toastJson = (key, lsn) => to_json(struct(key.as("id"),
          lit(CdcPipeline.UnchangedToast).as("v"), lsn.as("w"))))
        .localCheckpoint(true)
      val nB = math.ceil(rows.toDouble / batchSize).toInt
      val t0 = System.nanoTime()
      (0 until nB).foreach { b =>
        val lo = 1000L + b.toLong * batchSize
        CdcPipeline.applyBatch(
          changes.filter(col("lsn") >= lo && col("lsn") < lo + batchSize),
          store, Map("t" -> schema), Map("t" -> "id"))
      }
      val s = (System.nanoTime() - t0) / 1e9
      val got = store.read(spark, "t").count()
      require(got == nKeys, s"toast run $name: $got != $nKeys")
      rows / s
    }
    val plain = run("plain", 0.0)
    val marked = run("marked", 0.25)
    Seq(
      "toast_plain_rows_per_sec" -> plain,
      "toast_marked_rows_per_sec" -> marked,
      "toast_overhead_pct" -> ((plain / marked - 1.0) * 100.0))
  }

  private def splice(prev: String, key: String, blk: String): String =
    prev.replaceAll(",\"" + key + "\":\\{[^}]*\\}", "")
      .stripSuffix("}") + s""","$key":$blk}"""

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", v)

  private def block(kv: Seq[(String, Double)]): String =
    kv.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")

  /** Standalone: the smoke-scale run (20 k rows / 20 batches, the
    * BENCH "cdc" block's shape), the 10× steady-state run (200 k rows
    * / 200 batches — r9 verdict ask #7), and the 20× retention run
    * (400 k rows / 400 batches — r10 verdict ask #4). Three blocks in
    * CDC_BENCH.json: x10/base shows steady-state throughput, x20/x10
    * shows checkpoint bytes growing ~linearly in input files (the
    * seen-files dedup record) instead of the uncapped
    * O(batches²/interval) — the retention knobs
    * ([[graft.streaming.CdcPipeline.configureCheckpointRetention]])
    * are set by the mirror itself. */
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Rotate-only mode: rerun just the x40 rotation phase and splice
    // its block into the existing CDC_BENCH.json (the throughput
    // blocks are ~30 min; the rotation experiment iterates separately)
    if (sys.env.get("SPARK_GRAFT_CDC_ONLY").contains("rotate")) {
      val x40r = measureRotate(spark, halfRows = 400000L, batchSize = 1000)
      val path = java.nio.file.Paths.get("CDC_BENCH.json")
      val prev = new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      val line = splice(prev, "x40_rotate", block(x40r))
      java.nio.file.Files.write(path,
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(line)
      spark.stop()
      return
    }
    // Scale mode: the base/x10/x20 controlled grain WITHOUT the x40
    // rotation phase — the round-close gate for per-batch hot-path
    // additions (the adjudication policy reads this grain, and the
    // rotation experiment iterates separately)
    if (sys.env.get("SPARK_GRAFT_CDC_ONLY").contains("scale")) {
      val base = measure(spark, rows = 20000L, batchSize = 1000)
      System.err.println(s"[cdc] base done: ${block(base)}")
      val x10 = measure(spark, rows = 200000L, batchSize = 1000)
      System.err.println(s"[cdc] x10 done: ${block(x10)}")
      val x20 = measure(spark, rows = 400000L, batchSize = 1000)
      System.err.println(s"[cdc] x20 done: ${block(x20)}")
      val path = java.nio.file.Paths.get("CDC_BENCH.json")
      val prev = new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      val line = Seq("base" -> block(base), "x10" -> block(x10),
        "x20" -> block(x20))
        .foldLeft(prev) { case (acc, (k, b)) => splice(acc, k, b) }
      java.nio.file.Files.write(path,
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(line)
      spark.stop()
      return
    }
    // Toast mode: marked-vs-plain apply cost, spliced as its own block
    if (sys.env.get("SPARK_GRAFT_CDC_ONLY").contains("toast")) {
      val tm = measureToast(spark, rows = 50000L, batchSize = 1000)
      val path = java.nio.file.Paths.get("CDC_BENCH.json")
      val prev = new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      val line = splice(prev, "toast", block(tm))
      java.nio.file.Files.write(path,
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(line)
      spark.stop()
      return
    }
    // Two-mirror mode: the r14 multi-consumer retention scenario,
    // spliced into CDC_BENCH.json like the rotate-only mode
    if (sys.env.get("SPARK_GRAFT_CDC_ONLY").contains("two_mirrors")) {
      val two = measureTwoMirrors(spark, halfRows = 100000L, batchSize = 1000)
      val path = java.nio.file.Paths.get("CDC_BENCH.json")
      val prev = new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      val line = splice(prev, "two_mirrors", block(two))
      java.nio.file.Files.write(path,
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(line)
      spark.stop()
      return
    }
    // Quiet-box adjudication mode (r14 verdict wrong #2): the in-bench
    // cdc block read −24% vs r13 while the controlled runs improved —
    // this mode reruns the base measurement THREE times back-to-back on
    // an otherwise idle box and splices the readings (throughput + the
    // per-phase attribution) into CDC_BENCH.json, so a box-state dip is
    // distinguishable from a real hot-path regression: if the quiet
    // readings sit at/above the r13 figure with the same per-phase
    // shape, the bench-embedded dip was load (the bench runs the cdc
    // block AFTER ~90 s of query soak); if addBatch carries the delta,
    // the regression is real and attributable.
    if (sys.env.get("SPARK_GRAFT_CDC_ONLY").contains("quiet")) {
      val runs = (1 to 3).map { i =>
        val r = measure(spark, rows = 20000L, batchSize = 1000)
        System.err.println(s"[cdc] quiet run $i: ${block(r)}")
        r
      }
      val keys = Seq("batch_apply_rows_per_sec", "streaming_rows_per_sec",
        "streaming_avg_addbatch_ms", "streaming_avg_latestoffset_ms",
        "streaming_avg_walcommit_ms", "streaming_avg_commitoffsets_ms")
      val agg: Seq[(String, Double)] = keys.flatMap { k =>
        val vs = runs.map(_.toMap.apply(k)).sorted
        Seq(s"${k}_median" -> vs(1), s"${k}_min" -> vs.head,
          s"${k}_max" -> vs.last)
      }
      val path = java.nio.file.Paths.get("CDC_BENCH.json")
      val prev = new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      val line = splice(prev, "quiet_adjudication", block(agg))
      java.nio.file.Files.write(path,
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(line)
      spark.stop()
      return
    }
    val base = measure(spark, rows = 20000L, batchSize = 1000)
    System.err.println(s"[cdc] base done: ${block(base)}")
    val x10 = measure(spark, rows = 200000L, batchSize = 1000)
    System.err.println(s"[cdc] x10 done: ${block(x10)}")
    val x20 = measure(spark, rows = 400000L, batchSize = 1000)
    System.err.println(s"[cdc] x20 done: ${block(x20)}")
    // r12: x40 in two phases with feed pruning + checkpoint rotation —
    // the bytes-plateau measurement (see measureRotate's scaladoc)
    val x40r = measureRotate(spark, halfRows = 400000L, batchSize = 1000)
    // splice into an existing artifact when present — the default run
    // must not drop the separately-measured blocks (two_mirrors,
    // quiet_adjudication)
    val path = java.nio.file.Paths.get("CDC_BENCH.json")
    val fresh = s"""{"metric":"cdc_insert_throughput","base":${block(base)},"x10":${block(x10)},"x20":${block(x20)},"x40_rotate":${block(x40r)}}"""
    val line =
      if (java.nio.file.Files.exists(path)) {
        val prev = new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8)
        Seq("base" -> block(base), "x10" -> block(x10),
          "x20" -> block(x20), "x40_rotate" -> block(x40r))
          .foldLeft(prev) { case (acc, (k, b)) => splice(acc, k, b) }
      } else fresh
    try java.nio.file.Files.write(path,
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
