package graft.gen

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.streaming.{CdcPipeline, KeyedParquetStore}

/** Seeded, deterministic stress-test workload generator — the Spark
  * re-expression of the reference's insert.ps1 batched INSERT driver
  * (defaults 5000 records / batch 500, insert.ps1:11–13; row recipe
  * insert.ps1:271–277: FK ids sampled from existing dimension rows,
  * quantity uniform 1..99, order_date = asOf − uniform 0..29 days).
  *
  * Fully distributed: `spark.range(n)` drives generation; FK sampling
  * is a broadcast join against row_number-indexed dimension keys (the
  * PS script's in-memory array pick, insert.ps1:272–273, re-expressed
  * without a collect). Randomness is row-value-keyed murmur3 — NOT
  * `rand(seed)`, whose per-partition seeding changes results with the
  * partition layout — so a seed reproduces identical rows at any
  * parallelism, local or cluster.
  */
object Workload {

  /** Row-value-keyed uniform draw in [0, bound): murmur3 of
    * (row id, stream, seed). Unlike `rand(seed)` — which seeds per
    * PARTITION and therefore changes with the partition layout /
    * parallelism — this depends only on row values, so the same seed
    * reproduces the same rows on local[4], local[32], or a cluster. */
  private def draw(id: org.apache.spark.sql.Column, stream: Int, seed: Long,
      bound: Long): org.apache.spark.sql.Column =
    pmod(hash(id, lit(stream), lit(seed)), lit(bound))

  /** Generate `n` order rows with ids `startId..startId+n-1`.
    *
    * @param customers dimension DF with an `id` column (FK domain)
    * @param products  dimension DF with an `id` column (FK domain)
    * @param asOf      generation date (insert.ps1 uses "today"; fixed
    *                  here for reproducibility)
    */
  def generateOrders(
      customers: DataFrame,
      products: DataFrame,
      n: Long,
      startId: Long,
      seed: Long,
      asOf: Date): DataFrame = {
    val custIdx = indexed(customers, "customer_idx", "purchaser")
    val prodIdx = indexed(products, "product_idx", "product_id")
    val nCust = custIdx.count()
    val nProd = prodIdx.count()
    require(nCust > 0 && nProd > 0, "dimension tables must be non-empty")

    customers.sparkSession.range(n)
      .select(
        (col("id") + startId).as("id"),
        draw(col("id"), 0, seed, nCust).as("customer_idx"),
        draw(col("id"), 1, seed, nProd).as("product_idx"),
        (draw(col("id"), 2, seed, 99) + 1).cast("int").as("quantity"),
        date_sub(lit(asOf), draw(col("id"), 3, seed, 30).cast("int")).as("order_date"))
      .join(broadcast(custIdx), Seq("customer_idx"))
      .join(broadcast(prodIdx), Seq("product_idx"))
      .select("id", "order_date", "purchaser", "quantity", "product_id")
  }

  /** (idx → key) lookup: dense 0-based index over a dimension's ids.
    * Rank assignment goes through [[graft.operators.Ranks.globalRank]]
    * (bucketed, no single-partition sort) — the index build stays
    * parallel even for a dimension that outgrows one task, and the
    * result is identical to the old global `row_number` spelling. */
  private def indexed(dim: DataFrame, idxName: String, keyName: String): DataFrame =
    graft.operators.Ranks.globalRank(dim.select(col("id").as(keyName)), keyName, idxName)
      .withColumn(idxName, (col(idxName) - 1).cast("int"))
      .drop("_total")

  /** Seeded mixed I/U/D change stream — extends the reference's
    * insert-only stress surface (insert.ps1) to full CDC churn.
    * Insert keys are fresh (maxKey+1+i); update/delete keys are
    * sampled from the existing key domain via the same broadcast
    * indexed-dim pattern. `after` images are built by `afterJson`
    * from (key, lsn); null for deletes.
    *
    * `pKeyChange` carves PRIMARY-KEY-CHANGING updates out of the
    * update share (the REPLICA IDENTITY event the reference's WAL
    * source emits — [[graft.streaming.ChangeEvent.beforeKey]]): the
    * sampled existing key becomes `beforeKey` and the event's `key`
    * is a fresh one from maxKey+n+1+i — disjoint from the insert key
    * range maxKey+1+i, so a generated stream never aliases a move
    * target with an insert. Ordinary events carry beforeKey null.
    *
    * `pToast` carves unchanged-TOAST partial updates out of the PLAIN
    * update share (the Postgres partial-UPDATE event —
    * [[graft.streaming.CdcPipeline.UnchangedToast]]): those events'
    * after-images come from `toastJson` (the caller substitutes the
    * marker for the untouched wide column). Markers never ride
    * key-changing updates or inserts here — a generated stream with
    * deletes or moves can revisit a key after it left the target,
    * which a real decoder cannot do for a partial UPDATE, and the
    * apply path correctly fails LOUDLY on such a marker; keep
    * `mix._2 == 0` and the marker share inside the plain-update share
    * when generating toast streams for differential replay.
    *
    * @param existingKeys one-column DF `id` of current keys
    * @param mix          (pInsert, pDelete) — remainder is updates
    * @param pKeyChange   fraction of ALL events that are key-changing
    *                     updates (taken from the update share; must
    *                     fit inside it)
    * @param pToast       fraction of ALL events that are partial
    *                     (unchanged-TOAST) updates — taken from the
    *                     plain-update share after pKeyChange
    * @param toastJson    after-image builder for toast events
    *                     (required when pToast > 0)
    */
  def generateChanges(
      existingKeys: DataFrame,
      table: String,
      n: Long,
      startLsn: Long,
      seed: Long,
      afterJson: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      mix: (Double, Double) = (0.4, 0.2),
      pKeyChange: Double = 0.0,
      pToast: Double = 0.0,
      toastJson: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column = null): DataFrame = {
    val (pI, pD) = mix
    require(pKeyChange >= 0.0 && pI + pD + pKeyChange <= 1.0,
      s"key-change share $pKeyChange does not fit inside the update share " +
        s"(pI=$pI, pD=$pD)")
    require(pToast >= 0.0 && pI + pD + pKeyChange + pToast <= 1.0,
      s"toast share $pToast does not fit inside the plain-update share")
    require(pToast == 0.0 || toastJson != null,
      "pToast > 0 needs a toastJson after-image builder")
    // same de-funneled rank assignment as [[indexed]]
    val keyIdx = graft.operators.Ranks.globalRank(
        existingKeys.select(col("id").cast("long").as("existing_key")),
        "existing_key", "key_idx")
      .withColumn("key_idx", (col("key_idx") - 1).cast("int"))
      .drop("_total")
    val nKeys = keyIdx.count()
    val maxKey = existingKeys.agg(max(col("id").cast("long"))).collect().head.getLong(0)
    require(nKeys > 0, "change generation needs a non-empty key domain")

    existingKeys.sparkSession.range(n)
      .select(
        (col("id") + startLsn).as("lsn"),
        col("id").as("i"),
        (draw(col("id"), 10, seed, 10000) / 10000.0).as("r"),
        draw(col("id"), 11, seed, nKeys).as("key_idx"))
      .withColumn("op",
        when(col("r") < pI, "I").when(col("r") < pI + pD, "D").otherwise("U"))
      .withColumn("kc",
        col("op") === "U" && col("r") < pI + pD + pKeyChange)
      .withColumn("toast",
        col("op") === "U" && !col("kc") &&
          col("r") < pI + pD + pKeyChange + pToast)
      .join(broadcast(keyIdx), Seq("key_idx"))
      .withColumn("key",
        when(col("op") === "I", lit(maxKey) + 1 + col("i"))
          .when(col("kc"), lit(maxKey) + 1 + n + col("i"))
          .otherwise(col("existing_key")))
      .select(
        col("lsn"),
        lit(new Timestamp(0)).as("commitTs"),
        col("op"),
        lit(table).as("table"),
        col("key"),
        when(col("op") === "D", lit(null).cast("string"))
          .when(col("toast"),
            (if (toastJson == null) lit(null).cast("string")
             else toastJson(col("key"), col("lsn"))))
          .otherwise(afterJson(col("key"), col("lsn"))).as("after"),
        when(col("kc"), col("existing_key")).as("beforeKey"))
  }

  /** Result metrics of one stress run (insert.ps1:336–381's summary). */
  case class RunMetrics(
      totalRows: Long,
      nBatches: Int,
      durationMs: Long,
      avgBatchMs: Double,
      minBatchMs: Long,
      maxBatchMs: Long,
      throughputRowsPerSec: Double,
      logLines: Seq[String],
      // raw per-batch latencies, in order — steady-state analysis
      // (first-half vs second-half drift) needs the sequence, not
      // just the min/avg/max rollup
      latenciesMs: Seq[Long] = Seq.empty)

  /** Run the generated workload as batched CDC inserts against a
    * target store (insert.ps1's batch loop, 250–334): rows are split
    * into ceil(n/batchSize) batches, each applied as one change-set
    * merge, with per-batch latency accounting and stress-log lines in
    * the reference's log format (for LogAnalytics). */
  def runBatchedInsert(
      spark: SparkSession,
      store: KeyedParquetStore,
      table: String,
      orders: DataFrame,
      batchSize: Int,
      lsnStart: Long = 1L): RunMetrics = {
    import org.apache.spark.sql.types._
    val schema = orders.schema
    val (total, minId) = {
      val r = orders.agg(count(lit(1)), min("id")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val nBatches = math.ceil(total.toDouble / batchSize).toInt
    val t0 = System.currentTimeMillis()
    val latencies = (0 until nBatches).map { b =>
      val lo = minId + b.toLong * batchSize
      val batch = orders.filter(col("id") >= lo && col("id") < lo + batchSize)
      val changes = batch
        .select(
          (col("id") + lsnStart).as("lsn"),
          lit(new Timestamp(0)).as("commitTs"),
          lit("I").as("op"),
          lit(table).as("table"),
          col("id").cast("long").as("key"),
          to_json(struct(schema.fieldNames.map(col).toSeq: _*)).as("after"))
      val s = System.currentTimeMillis()
      CdcPipeline.applyBatch(changes, store, Map(table -> schema), Map(table -> "id"))
      System.currentTimeMillis() - s
    }
    val durationMs = System.currentTimeMillis() - t0
    val throughput = total * 1000.0 / math.max(durationMs, 1)
    val log = latencies.zipWithIndex.map { case (ms, i) =>
      f"[${i + 1}%05d] INSERT-BATCH-${i + 1} rows=${math.min(batchSize, total - i.toLong * batchSize)} latency_ms=$ms"
    } ++ Seq(
      s"Successful Operations: $total",
      f"Throughput: $throughput%.2f operations/second")
    RunMetrics(total, nBatches, durationMs,
      if (latencies.nonEmpty) latencies.sum.toDouble / latencies.length else 0.0,
      if (latencies.nonEmpty) latencies.min else 0L,
      if (latencies.nonEmpty) latencies.max else 0L,
      throughput, log, latencies)
  }
}
