package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Batch-expressible projections of the CDC apply semantics
  * (SURVEY.md §2.8), oracle-checked over the `events` table treated as
  * a change feed: `event_id` ≈ LSN (total order), `user_id` ≈ primary
  * key, `event_type='error'` ≈ delete, everything else ≈ upsert.
  *
  * The streaming pipeline itself ([[graft.streaming.CdcPipeline]])
  * applies exactly this logic per micro-batch; these queries pin the
  * semantics against DuckDB.
  */
object CdcQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C1/C3: last-write-wins dedup per key on max(lsn)
    "cdc_last_per_key" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("event_id").desc)))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    },

    // C3: full upsert/delete apply — final converged target state
    "cdc_apply_state" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("event_id").desc)))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select("user_id", "event_id", "value")
        .orderBy("user_id")
    },

    // C4: rows-behind lag metric between the converged state and a
    // stale prefix of the feed (target applied only events with
    // event_id < 5000)
    "cdc_prefix_lag" -> { (s, d) =>
      val ev = Tables.events(s, d)
      def stateOf(feed: DataFrame): DataFrame = feed
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("event_id").desc)))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select("user_id")
      val src = stateOf(ev).agg(count(lit(1)).as("src_rows"))
      val tgt = stateOf(ev.filter(col("event_id") < 5000))
        .agg(count(lit(1)).as("tgt_rows"))
      src.crossJoin(tgt)
        .withColumn("lag", col("src_rows") - col("tgt_rows"))
        .withColumn("sync_status",
          when(col("lag") === 0, "SYNCED")
            .when(abs(col("lag")) <= 5, "NEAR_SYNC")
            .otherwise("LAG"))
    },

    // Incremental materialized-view maintenance
    // ([[graft.streaming.AggMaintenance]]) as a batch projection: the
    // feed splits into two "micro-batches" (event_id prefix / rest);
    // batch 2 folds into batch 1's view via retract(−1, −cents) of
    // each touched key's old image + assert(+1, +cents) of its new
    // one. The oracle recomputes the aggregate DIRECTLY from the
    // converged state — matching hashes prove the delta algebra, in
    // exact integer cents, never rescanning the unchanged keys.
    "cdc_mv_incremental" -> { (s, d) =>
      val ev = Tables.events(s, d)
      def lastPer(feed: DataFrame): DataFrame = feed
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("event_id").desc)))
        .filter(col("rn") === 1)
      val cents = expr("CAST(round(value * 100) AS BIGINT)")
      val state1 = lastPer(ev.filter(col("event_id") < 5000))
        .filter(col("event_type") =!= "error")
      val mv1 = state1.select(col("event_type").as("g"),
        lit(1L).as("dn"), cents.as("ds"))
      val changes2 = lastPer(ev.filter(col("event_id") >= 5000))
      val touched = changes2.select("user_id").distinct()
      val retract = state1.join(touched, Seq("user_id"), "left_semi")
        .select(col("event_type").as("g"), lit(-1L).as("dn"), (-cents).as("ds"))
      val assert_ = changes2.filter(col("event_type") =!= "error")
        .select(col("event_type").as("g"), lit(1L).as("dn"), cents.as("ds"))
      mv1.unionByName(retract).unionByName(assert_)
        .groupBy("g")
        .agg(sum("dn").as("n_rows"), sum("ds").as("sum_cents"))
        .filter(col("n_rows") > 0)
        .select(col("g").as("event_type"), col("n_rows"), col("sum_cents"))
        .orderBy("event_type")
    },

    // ── SCD2 history build — the OTHER standard CDC sink shape beside
    // the converged mirror (cdc_apply_state): instead of keeping only
    // each key's last image, keep EVERY image as a versioned validity
    // interval. An upsert at LSN t opens a version [t, next-change-t);
    // the key's next change of ANY type (new upsert or delete) closes
    // it; a version nothing closes is current (valid_to null). Deletes
    // open nothing — a deleted key simply has no current row, matching
    // the mirror exactly. One lead() window per key and a version
    // counter over the kept rows — a single user_id exchange, integer
    // LSNs and cents end to end.
    "cdc_scd2_history" -> { (s, d) =>
      val byKey = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
        .withColumn("valid_to", lead(col("event_id"), 1).over(byKey))
        .filter(col("event_type") =!= "error")
        .withColumn("version", row_number().over(byKey))
        .select(
          col("user_id"), col("version"),
          col("event_id").as("valid_from"), col("valid_to"),
          col("value_cents"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "version")
    },

    // ── Snapshot reconciliation — the "diff two tables" primitive a
    // migration validates with: the converged state of the LSN-5000
    // prefix ("yesterday") full-outer-joined against the converged
    // state of the whole feed ("today"), every key classified
    // added / removed / updated / unchanged, with a value-change
    // subcount (a key can be touched without its payload moving) and
    // a deterministic sample key per class. One full-outer equi-join
    // on the key + a 4-row rollup — the reconciliation report costs
    // one shuffle regardless of table width, and at 100 TB both
    // inputs are the SAME keyed store read twice, so the join
    // co-locates if the store is bucketed (Tables.saveBucketed).
    "cdc_snapshot_diff" -> { (s, d) =>
      val ev = Tables.events(s, d)
      def state(feed: DataFrame): DataFrame = feed
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("event_id").desc)))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val y = state(ev.filter(col("event_id") < 5000))
        .select(col("user_id"), col("event_id").as("y_lsn"), col("cents").as("y_cents"))
      val t = state(ev)
        .select(col("user_id"), col("event_id").as("t_lsn"), col("cents").as("t_cents"))
      y.join(t, Seq("user_id"), "full_outer")
        .withColumn("change_type",
          when(col("y_lsn").isNull, "added")
            .when(col("t_lsn").isNull, "removed")
            .when(col("t_lsn") =!= col("y_lsn"), "updated")
            .otherwise("unchanged"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n_keys"),
          count(when(col("y_cents").isNotNull && col("t_cents").isNotNull &&
            col("y_cents") =!= col("t_cents"), lit(1))).as("n_value_changed"),
          min("user_id").as("sample_key"))
        .orderBy("change_type")
    },

    // ── Consistent cross-table read AS OF an LSN — the CDC family's
    // capstone (r8 verdict #7): all mirrored tables read at ONE WAL
    // position. The feed here is the events WAL split into TWO tables
    // by key parity (t0/t1) sharing the global LSN sequence; the
    // snapshot is each table's converged state below LSN 1000, the
    // retained stream is [1000, ∞), and the cut is 7000. This query
    // calls the ENGINE's [[graft.streaming.CdcPipeline.asOf]] — the
    // same lastImagePerKey the apply path uses — so the oracle pins
    // the reconstruction semantics, not a parallel spelling. The
    // per-table aggregate (rows, cents, max lsn applied) hash-proves
    // both tables were cut at the same position.
    "cdc_asof_read" -> { (s, d) =>
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      import graft.streaming.CdcPipeline
      val rowSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("cents", LongType)))
      val env = Tables.events(s, d).select(
        col("event_id").as("lsn"),
        concat(lit("t"), (col("user_id") % 2).cast("string")).as("table"),
        col("user_id").cast("string").as("key"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        to_json(struct(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))).as("after"))
      val states = Seq("t0", "t1").map { t =>
        val snap = CdcPipeline
          .lastImagePerKey(
            env.filter(col("lsn") < 1000 && col("table") === t), rowSchema, "user_id")
          .filter(col("op") =!= "D").drop("op")
        CdcPipeline.asOf(snap,
            env.filter(col("table") === t && col("lsn") >= 1000),
            rowSchema, "user_id", 7000L)
          .withColumn("tbl", lit(t))
      }
      states.reduce(_ unionByName _)
        .groupBy("tbl")
        .agg(count(lit(1)).as("n_rows"),
          sum("cents").as("sum_cents"),
          max("event_id").as("max_lsn"))
        .orderBy("tbl")
    },

    // ── PK-CHANGING UPDATE apply (REPLICA IDENTITY semantics): the
    // events feed reinterpreted so every 'purchase' is an UPDATE that
    // MOVES its row to a new primary key (beforeKey = user_id, key =
    // user_id + 100) — the old-tuple event Postgres logical decoding
    // emits so a PK change replicates as delete(old)+upsert(new)
    // (volumes/postgresql.conf:3). This query runs the ENGINE's
    // normalizeKeyChanges expansion through the same lastImagePerKey
    // the apply path uses; the oracle spells the expansion as an
    // explicit UNION ALL of the delete half. Moved-to keys may collide
    // with other users' native keys (user_id+100 overlaps the key
    // domain) — deliberately: both sides resolve the collision by the
    // same max-LSN rule, so the hash pins the semantics under
    // contention too. Converged rows where op != D, ordered by key.
    "cdc_pk_change" -> { (s, d) =>
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      import graft.streaming.CdcPipeline
      val rowSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("cents", LongType)))
      val move = col("event_type") === "purchase"
      val env = Tables.events(s, d).select(
        col("event_id").as("lsn"),
        to_timestamp(lit("2000-01-01 00:00:00")).as("commitTs"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        lit("t").as("table"),
        when(move, col("user_id") + 100).otherwise(col("user_id")).as("key"),
        when(col("event_type") =!= "error", to_json(struct(
          when(move, col("user_id") + 100).otherwise(col("user_id")).as("user_id"),
          col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents")))).as("after"),
        when(move, col("user_id")).as("beforeKey"))
      CdcPipeline.lastImagePerKey(env, rowSchema, "user_id")
        .filter(col("op") =!= "D").drop("op")
        .orderBy("user_id")
    },

    // ── Unchanged-TOAST apply (Postgres partial-UPDATE semantics):
    // logical decoding does NOT re-emit a large out-of-line column an
    // UPDATE left untouched — the WAL record carries a marker and the
    // sink must inherit the previous value (the reference's psql→psql
    // mirrors depend on this, volumes/postgresql.conf:3). The events
    // feed reinterpreted: every non-error event is an UPDATE of a
    // string `payload` column, but events with event_id ≡ 3 (mod 7)
    // arrive with payload UNCHANGED — the marker ships instead of the
    // value. This query runs the ENGINE's lastImageResolvingToast
    // (the same per-key aggregate applyBatch's gated path uses): each
    // key's winner takes its payload from the key's last UNMARKED
    // event; a key whose every event was marked keeps the marker (the
    // store-fallback input — pinned in the hash so the contract is
    // oracle-visible). The oracle spells the inheritance as an
    // explicit arg-max-with-FILTER. Converged non-deleted rows.
    "cdc_toast" -> { (s, d) =>
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      import graft.streaming.CdcPipeline
      val rowSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("payload", StringType)))
      val marked = pmod(col("event_id"), lit(7)) === 3
      val env = Tables.events(s, d).select(
        col("event_id").as("lsn"),
        to_timestamp(lit("2000-01-01 00:00:00")).as("commitTs"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        lit("t").as("table"),
        col("user_id").as("key"),
        when(col("event_type") =!= "error", to_json(struct(
          col("user_id"),
          col("event_id"),
          when(marked, lit(CdcPipeline.UnchangedToast))
            .otherwise(concat(lit("v"),
              expr("CAST(round(value * 100) AS BIGINT)"))).as("payload")))).as("after"))
      CdcPipeline.lastImageResolvingToast(env, rowSchema, "user_id")
        .filter(col("op") =!= "D").drop("op")
        .orderBy("user_id")
    },

    // ── Soft-delete target shape (the PeerDB-documented option: a
    // DELETE marks the warehouse row and stamps the sync position
    // instead of removing it — audit trails and reversible reads).
    // The events feed reinterpreted as usual (error = delete); this
    // query runs the ENGINE's softImagePerKey: EVERY key surfaces,
    // carrying the last non-delete image it died with (cents from the
    // last non-error event — null when the key only ever errored, the
    // "deleted before first sync" tombstone), an is_deleted flag from
    // the winner op, and the winner LSN as the sync stamp. The oracle
    // spells it as winner ⋈ arg-max-with-FILTER — converged, all keys.
    "cdc_soft_delete" -> { (s, d) =>
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      import graft.streaming.CdcPipeline
      val rowSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("cents", LongType)))
      val env = Tables.events(s, d).select(
        col("event_id").as("lsn"),
        to_timestamp(lit("2000-01-01 00:00:00")).as("commitTs"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        lit("t").as("table"),
        col("user_id").as("key"),
        when(col("event_type") =!= "error", to_json(struct(
          col("user_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents")))).as("after"))
      CdcPipeline.softImagePerKey(env, rowSchema, "user_id")
        .select(col("user_id"), col("cents"),
          col(CdcPipeline.SoftDeleteCol).as("is_deleted"),
          col(CdcPipeline.SyncedLsnCol).as("synced_lsn"))
        .orderBy("user_id")
    },

    // ── Log compaction — the Kafka-compacted-topic shape, and what a
    // long-running CDC feed must do to stop growing without losing
    // replayability: below a compaction watermark (LSN 5000), keep
    // only each key's LATEST image and drop superseded images AND
    // tombstones; above it, keep the raw tail verbatim. Replaying
    // baseline + tail converges to exactly the same state as
    // replaying the full feed (pinned by spec against
    // cdc_apply_state): a key whose last old change was a delete has
    // no baseline row and is re-created only if the tail says so.
    // Shape: one user_id-partitioned row_number over the old segment
    // (group-local sort), a verbatim filter for the tail, one union —
    // nothing global anywhere.
    "cdc_compact" -> { (s, d) =>
      val wm = 5000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
      val baseline = ev.filter(col("event_id") < wm)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("event_id").desc)))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value_cents"), lit("baseline").as("segment"))
      val tail = ev.filter(col("event_id") >= wm)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value_cents"), lit("tail").as("segment"))
      baseline.unionByName(tail).orderBy("event_id")
    }
  )

  def oracles: Map[String, String] = Map(
    "cdc_last_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
         ORDER BY user_id""",
    "cdc_apply_state" ->
      """SELECT user_id, event_id, value FROM (
           SELECT user_id, event_id, value, event_type FROM events
           QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
         WHERE event_type <> 'error'
         ORDER BY user_id""",
    "cdc_prefix_lag" ->
      """WITH src AS (
           SELECT COUNT(*) AS src_rows FROM (
             SELECT user_id, event_type FROM events
             QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
           WHERE event_type <> 'error'),
         tgt AS (
           SELECT COUNT(*) AS tgt_rows FROM (
             SELECT user_id, event_type FROM events WHERE event_id < 5000
             QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
           WHERE event_type <> 'error')
         SELECT src_rows, tgt_rows, src_rows - tgt_rows AS lag,
                CASE WHEN src_rows - tgt_rows = 0 THEN 'SYNCED'
                     WHEN ABS(src_rows - tgt_rows) <= 5 THEN 'NEAR_SYNC'
                     ELSE 'LAG' END AS sync_status
         FROM src CROSS JOIN tgt""",
    // the DIRECT recompute over the converged state — the incremental
    // fold on the Spark side must hash-match it exactly
    "cdc_mv_incremental" ->
      """WITH state AS (
           SELECT user_id, event_type, value FROM events
           QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
         SELECT event_type, COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM state WHERE event_type <> 'error'
         GROUP BY 1 ORDER BY event_type""",
    // SCD2 — identical lead-then-filter replay: any next change closes
    // the interval, only upserts open one
    "cdc_scd2_history" ->
      """WITH h AS (
           SELECT user_id, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS value_cents,
             LEAD(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to
           FROM events),
         k AS (
           SELECT user_id, event_id AS valid_from, valid_to, value_cents,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS version
           FROM h WHERE event_type <> 'error')
         SELECT user_id, version, valid_from, valid_to, value_cents,
           (valid_to IS NULL) AS is_current
         FROM k ORDER BY user_id, version""",
    "cdc_snapshot_diff" ->
      """WITH y AS (
           SELECT user_id, event_id AS y_lsn,
             CAST(round(value * 100) AS BIGINT) AS y_cents
           FROM (SELECT * FROM events WHERE event_id < 5000
                 QUALIFY row_number() OVER (PARTITION BY user_id
                   ORDER BY event_id DESC) = 1)
           WHERE event_type <> 'error'),
         t AS (
           SELECT user_id, event_id AS t_lsn,
             CAST(round(value * 100) AS BIGINT) AS t_cents
           FROM (SELECT * FROM events
                 QUALIFY row_number() OVER (PARTITION BY user_id
                   ORDER BY event_id DESC) = 1)
           WHERE event_type <> 'error'),
         j AS (
           SELECT COALESCE(y.user_id, t.user_id) AS user_id,
             y_lsn, y_cents, t_lsn, t_cents
           FROM y FULL OUTER JOIN t ON y.user_id = t.user_id),
         c AS (
           SELECT user_id,
             CASE WHEN y_lsn IS NULL THEN 'added'
                  WHEN t_lsn IS NULL THEN 'removed'
                  WHEN t_lsn <> y_lsn THEN 'updated'
                  ELSE 'unchanged' END AS change_type,
             CASE WHEN y_cents IS NOT NULL AND t_cents IS NOT NULL
                       AND y_cents <> t_cents THEN 1 END AS vc
           FROM j)
         SELECT change_type, COUNT(*) AS n_keys,
           COUNT(vc) AS n_value_changed,
           CAST(MIN(user_id) AS BIGINT) AS sample_key
         FROM c GROUP BY 1 ORDER BY change_type""",
    // the AS OF reconstruction must equal the direct converged replay
    // of the prefix lsn ≤ 7000 — snapshot handoff and all
    "cdc_asof_read" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             't' || CAST(user_id % 2 AS VARCHAR) AS tbl
           FROM events),
         state AS (
           SELECT tbl, user_id, event_id, cents FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY event_id DESC) AS rn
             FROM ev WHERE event_id <= 7000)
           WHERE rn = 1 AND event_type <> 'error')
         SELECT tbl, COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           MAX(event_id) AS max_lsn
         FROM state GROUP BY 1 ORDER BY tbl""",
    // the explicit delete(old)+upsert(new) expansion — the engine's
    // normalizeKeyChanges must converge to exactly this state
    "cdc_pk_change" ->
      """WITH env AS (
           SELECT event_id AS lsn,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             CASE WHEN event_type = 'purchase' THEN user_id + 100
                  ELSE user_id END AS key,
             CASE WHEN event_type <> 'error'
                  THEN CAST(round(value * 100) AS BIGINT) END AS cents
           FROM events),
         expanded AS (
           SELECT lsn, op, key, cents FROM env
           UNION ALL
           SELECT event_id AS lsn, 'D' AS op, user_id AS key,
             CAST(NULL AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
         last AS (
           SELECT * FROM expanded
           QUALIFY row_number() OVER (PARTITION BY key ORDER BY lsn DESC) = 1)
         SELECT key AS user_id, lsn AS event_id, cents
         FROM last WHERE op <> 'D' ORDER BY user_id""",
    // the explicit inherit-last-unmarked-value spelling — the engine's
    // lastImageResolvingToast must converge to exactly this state,
    // including keys where the marker survives (store-fallback input)
    "cdc_toast" ->
      """WITH env AS (
           SELECT event_id AS lsn,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             user_id AS key,
             CASE WHEN event_type = 'error' THEN NULL
                  WHEN event_id % 7 = 3 THEN '__graft_unchanged_toast__'
                  ELSE 'v' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
             END AS payload
           FROM events),
         winner AS (
           SELECT key, lsn, op, payload FROM env
           QUALIFY row_number() OVER (PARTITION BY key ORDER BY lsn DESC) = 1),
         carried AS (
           SELECT key,
             arg_max(payload, lsn) FILTER (WHERE op <> 'D'
               AND payload IS NOT NULL
               AND payload <> '__graft_unchanged_toast__') AS inherited
           FROM env GROUP BY key)
         SELECT w.key AS user_id, w.lsn AS event_id,
           CASE WHEN w.payload = '__graft_unchanged_toast__'
                THEN COALESCE(c.inherited, w.payload)
                ELSE w.payload END AS payload
         FROM winner w LEFT JOIN carried c USING (key)
         WHERE w.op <> 'D'
         ORDER BY user_id""",
    // winner op decides the flag; the retained image is the last
    // non-delete event's — exactly softImagePerKey's aggregate
    "cdc_soft_delete" ->
      """WITH env AS (
           SELECT event_id AS lsn,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             user_id AS key,
             CASE WHEN event_type <> 'error'
                  THEN CAST(round(value * 100) AS BIGINT) END AS cents
           FROM events),
         winner AS (
           SELECT key, lsn, op FROM env
           QUALIFY row_number() OVER (PARTITION BY key ORDER BY lsn DESC) = 1),
         carried AS (
           SELECT key,
             arg_max(cents, lsn) FILTER (WHERE op <> 'D') AS cents
           FROM env GROUP BY key)
         SELECT w.key AS user_id, c.cents,
           w.op = 'D' AS is_deleted, w.lsn AS synced_lsn
         FROM winner w LEFT JOIN carried c USING (key)
         ORDER BY user_id""",
    "cdc_compact" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS value_cents
           FROM events),
         base AS (
           SELECT user_id, event_id, event_type, value_cents,
             'baseline' AS segment
           FROM (SELECT *,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY event_id DESC) AS rn
                 FROM ev WHERE event_id < 5000)
           WHERE rn = 1 AND event_type <> 'error'),
         tl AS (
           SELECT user_id, event_id, event_type, value_cents, 'tail' AS segment
           FROM ev WHERE event_id >= 5000)
         SELECT * FROM base UNION ALL SELECT * FROM tl ORDER BY event_id"""
  )
}
