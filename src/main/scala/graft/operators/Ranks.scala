package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global dense ranking over a UNIQUE numeric column with NO
  * single-partition sort — the building block behind
  * [[CoreQueries.globalNtile]] and the workload generator's
  * dimension-index assignment.
  *
  * Shape: (1) tiny global agg (min/max/count) broadcast to every row;
  * (2) monotone equal-width bucketing on the order column — monotone,
  * so global order ≡ (bucket asc, orderCol asc) and the global rank of
  * a row = its per-bucket `row_number` + the count of rows in earlier
  * buckets; (3) per-bucket window (parallel across `buckets`
  * partitions; the hash exchange on the bucket key is shared with the
  * bucket-count aggregate); (4) offset prefix-sum over the per-bucket
  * counts as a triangular self-join over ≤ buckets² rows (bounded by
  * configuration, NOT data size — and no unpartitioned window node
  * anywhere in the plan).
  *
  * Equal-width bucketing assumes the order column is not pathologically
  * clustered (dense ids here); a skewed distribution still computes
  * correctly, just less evenly — raise `buckets` to spread.
  */
object Ranks {

  /** Adds `rankCol` (1-based global rank by `orderCol` asc, LongType)
    * and `_total` (the global row count — callers that need N, e.g.
    * ntile, read it then drop it). `orderCol` must be numeric and
    * unique for a deterministic ranking. */
  private[graft] def globalRank(
      df: DataFrame, orderCol: String, rankCol: String,
      buckets: Int = 64): DataFrame = {
    val stats = df.agg(
      min(col(orderCol)).as("_mn"), max(col(orderCol)).as("_mx"),
      count(lit(1)).as("_total"))
    val span = (col("_mx") - col("_mn") + lit(1)).cast("double")
    val eb = df.crossJoin(broadcast(stats))
      .withColumn("_bkt",
        least(lit(buckets - 1),
          floor((col(orderCol) - col("_mn")).cast("double") / span * buckets))
          .cast("int"))
    val counts = eb.groupBy("_bkt").agg(count(lit(1)).as("_cnt"))
    val offsets = counts.select(col("_bkt"), col("_cnt"))
      .as("a")
      .join(counts.select(col("_bkt").as("_pb"), col("_cnt").as("_pc")).as("b"),
        col("_pb") < col("a._bkt"), "left")
      .groupBy(col("a._bkt").as("_bkt"))
      .agg(coalesce(sum("_pc"), lit(0L)).as("_off"))
    eb
      .withColumn("_rn",
        row_number().over(Window.partitionBy("_bkt").orderBy(orderCol)))
      .join(broadcast(offsets), "_bkt")
      .withColumn(rankCol, col("_off") + col("_rn"))
      .drop("_mn", "_mx", "_bkt", "_rn", "_off")
  }

  /** Exact `percentile_disc` per group with NO per-group value buffer
    * anywhere — the 100 TB spelling of exact order statistics. The
    * ordered-set aggregate (`percentile_disc` / `percentile`) buffers
    * and sorts EVERY value of a group inside one task, which is the
    * hidden single-task funnel for few-large-group shapes (a global
    * octile pass buffers the whole fact column). This replaces it
    * with the selection-algorithm shape:
    *
    *  1. per-(group, bucket) weighted histogram with in-bucket
    *     min/max under the FIXED monotone log bucketing
    *     ([[graft.functions.HashOps.logBucket]]: bit-length octave ×
    *     7 mantissa bits, sign-reflected — order-preserving for every
    *     long with NO min/max pre-pass, ≤ 16384 buckets) —
    *     partial-aggregated map-side; group totals and cumulative
    *     weights come from windows over the histogram rows themselves
    *     (bounded by the bucket range, never by data), locating for
    *     each requested percentile the bucket containing target rank
    *     ⌈p·W⌉ and the residual in-bucket rank;
    *  2. a bucket whose min = max resolves immediately (covers
    *     massive-duplicate skew — the bucket never needs its rows);
    *     otherwise one selection pass touches ONLY rows of targeted
    *     buckets (one log-octave slice per target) and picks the
    *     crossing row with a bucket-partitioned running-weight window.
    *
    * Percentages are exact rationals `(num, den)` so target ranks are
    * pure integer arithmetic — `⌈num·W / den⌉` — with no float
    * anywhere (use power-of-two dens to mirror the octile/quartile
    * determinism rule). Weighted (`percentile_disc` of each value
    * repeated `weight` times) via `weightCol`; `None` = unweighted.
    * Output: `groupCols`, `_p_idx` (index into `ps`), `valueCol` (the
    * selected value), `_w_total` (the group's total weight — callers
    * needing N/W read it, e.g. the weighted-median report).
    *
    * Values must be integral (LongType); pathological skew within a
    * NON-degenerate bucket is bounded by the log-octave width —
    * recurse with a second bucketing level if a profile ever shows
    * one bucket dominating (not needed at current corpus shapes). */
  private[graft] def groupQuantilesDisc(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      weightCol: Option[String], ps: Seq[(Int, Int)],
      contBrackets: Boolean = false): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (n0, d0) => n0 >= 0 && d0 > 0 })
    // internal uniform group key: real groups, or a constant for the
    // global case (keeps every step below group-generic)
    val (gdf, gcols) =
      if (groupCols.nonEmpty) (df, groupCols)
      else (df.withColumn("_g", lit(1)), Seq("_g"))
    val g = gcols.map(col)
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    val v = col(valueCol)

    val ebkt = gdf.withColumn("_bkt",
      graft.functions.HashExprs.log_bucket(v))
    // Cumulative ranks + group totals over the HISTOGRAM via ONE
    // window exchange partitioned by the group key. The window input
    // is the (group, bucket) histogram — ≤ 16384 rows per group, a
    // bound set by the log-bucket encoding, NEVER by data — so even
    // the global-group case (a constant key folding to a single
    // partition) sorts a literal-bounded frame, the same class as
    // the allowlisted bounded global windows elsewhere. The r13–r17
    // spelling kept every window on a real per-row key (group,
    // octave) at the cost of an octave-offset SELF-join + a separate
    // group-total aggregate: three more references of the caller's
    // whole upstream subtree, which multiplied the logical plan ~4×
    // per call (q3's executed tree reached 2,600 lines / 168
    // exchanges) and dominated planning + codegen, while the runtime
    // exchanges those extra branches deduped into were already AQE
    // stage reuses. One histogram window buys the same exact integers
    // with one upstream reference.
    val hist0 = ebkt.groupBy(g :+ col("_bkt"): _*)
      .agg(sum(w).as("_bw"), min(v).as("_bmin"), max(v).as("_bmax"))
    val wOrd = Window.partitionBy(gcols.map(col): _*).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gcols.map(col): _*).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val hist = hist0
      .withColumn("_cum", sum("_bw").over(wOrd))
      .withColumn("_w_total", sum("_bw").over(wAll))
      .withColumn("_cum0", col("_cum") - col("_bw"))

    // one row per requested percentile (two under `contBrackets`: the
    // LOWER and UPPER order statistics bracketing the continuous
    // index h = p·(W−1), which the caller interpolates in exact
    // integers); ranks in pure integer math
    val his = if (contBrackets) Seq(0L, 1L) else Seq(0L)
    // one LocalRelation leaf (the old per-spec range(1) unionByName
    // fold added |ps|·|his| plan leaves, each duplicated wherever the
    // percentile frame is referenced)
    val specs = for {
      ((n0, d0), i) <- ps.zipWithIndex
      hi <- his
    } yield (i, n0.toLong, d0.toLong, hi)
    val pFrame = df.sparkSession.range(1)
      .select(explode(typedLit(specs)).as("_s"))
      .select(col("_s._1").as("_p_idx"), col("_s._2").as("_pn"),
        col("_s._3").as("_pd"), col("_s._4").as("_hi"))
    // NOT pinned (r13 ask #5, adjudicated r14): the degenerate/live
    // branches below both descend from this frame, but AQE's
    // stage-level reuse already shares the histogram shuffle between
    // them (the a15 dump shows ONE FileScan with both branches reading
    // the same ShuffleQueryStage); an eager localCheckpoint here
    // measured within noise (±5% raw) while hiding the upstream
    // windows from the plan gates.
    val rankExpr =
      if (contBrackets)
        // bracket ranks of h = pn·(W−1)/pd: lower = ⌊h⌋+1, upper one
        // past it, both clamped into [1, W] (a one-row group or an
        // integral h makes them coincide — interpolation then reads
        // the same value twice and the fraction term vanishes)
        expr("LEAST(_w_total, GREATEST(CAST(1 AS BIGINT), " +
          "CAST((_pn * (_w_total - 1)) div _pd + 1 + _hi AS BIGINT)))")
      else // percentile_disc: value at rank ⌈pn·W/pd⌉ (p=0 → minimum)
        expr("GREATEST(CAST(1 AS BIGINT), CAST((_pn * _w_total + _pd - 1) div _pd AS BIGINT))")
    val targets = hist.crossJoin(broadcast(pFrame))
      .withColumn("_rank", rankExpr)
      .filter(col("_cum") >= col("_rank") && col("_cum0") < col("_rank"))
      .withColumn("_lrank", col("_rank") - col("_cum0"))

    val degenerate = targets.filter(col("_bmin") === col("_bmax"))
      .select(g :+ col("_p_idx") :+ col("_hi") :+ col("_bmin").as(valueCol) :+
        col("_w_total"): _*)
    val live = targets.filter(col("_bmin") =!= col("_bmax"))
      .select(g :+ col("_bkt") :+ col("_p_idx") :+ col("_hi") :+
        col("_lrank") :+ col("_w_total"): _*)
    val inBucket = ebkt.select(g :+ col("_bkt") :+ v.as("_v") :+
        w.as("_w"): _*)
      .join(broadcast(live), gcols :+ "_bkt")
      .withColumn("_cw", sum("_w").over(
        Window.partitionBy(gcols.map(col) :+ col("_p_idx") :+ col("_hi") :+
          col("_bkt"): _*)
          .orderBy("_v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_cw") >= col("_lrank") && col("_cw") - col("_w") < col("_lrank"))
      .select(g :+ col("_p_idx") :+ col("_hi") :+ col("_v").as(valueCol) :+
        col("_w_total"): _*)

    val out0 = degenerate.unionByName(inBucket)
    val out = if (contBrackets) out0 else out0.drop("_hi")
    if (groupCols.nonEmpty) out else out.drop("_g")
  }

  /** Grouped CONTINUOUS quartiles (`percentile_cont(0.25/0.5/0.75)`)
    * in EXACT integer arithmetic: the two bracketing order statistics
    * come from the same two-pass histogram machinery as
    * [[groupQuantilesDisc]] (`contBrackets`), and the interpolated
    * value is returned ×4 — `v_lo·4 + r·(v_hi − v_lo)` where
    * `r = (pn·(W−1)) mod 4` is the fraction's numerator — so no
    * IEEE division or rounding exists anywhere on either engine's
    * path. Output: group cols + `_p_idx` (0/1/2 ↔ q1/q2/q3) +
    * `<valueCol>_x4` + `_w_total`. */
  private[graft] def groupQuartilesCont(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val br = groupQuantilesDisc(df, groupCols, valueCol, None,
      Seq((1, 4), (2, 4), (3, 4)), contBrackets = true)
    // pivot the lo/hi bracket rows in ONE aggregation — the old
    // filter-lo ⋈ filter-hi self-join referenced the entire quantile
    // subtree twice, doubling every scan, shuffle and window in the
    // caller's plan (q3 measured ~2× a16's single-call cost on the
    // same machinery); exactly one row exists per (group, _p_idx,
    // _hi), so MAX-of-CASE is the row itself
    val keys = groupCols :+ "_p_idx"
    br.groupBy(keys.map(col): _*)
      .agg(max(when(col("_hi") === 0, col(valueCol))).as("_vlo"),
        max(when(col("_hi") === 1, col(valueCol))).as("_vhi"),
        max("_w_total").as("_w_total"))
      .withColumn("_r", expr("((_p_idx + 1) * (_w_total - 1)) % 4"))
      .select(groupCols.map(col) :+ col("_p_idx") :+
        (col("_vlo") * 4 + col("_r") * (col("_vhi") - col("_vlo")))
          .as(s"${valueCol}_x4") :+ col("_w_total"): _*)
  }

  /** Global running SUM of `weightCol` in `orderCol`-ascending order —
    * the same two-pass monotone-bucket shape as [[globalRank]], for
    * cumulative aggregates (Pareto/ABC shares, cumulative
    * distribution) instead of ranks: per-bucket windowed prefix sums
    * run in parallel, and the cross-bucket offset is a prefix sum
    * over the ≤ `buckets` per-bucket totals. Long→double bucketing is
    * order-preserving (monotone cast + floor of a monotone map), so
    * bucket boundaries can be imprecise at extreme magnitudes without
    * ever mis-ordering a pair — exact ordering within a bucket uses
    * the exact column. `orderCol` must be numeric and unique. */
  private[graft] def globalCumSum(
      df: DataFrame, orderCol: String, weightCol: String, cumCol: String,
      buckets: Int = 64): DataFrame = {
    val stats = df.agg(
      min(col(orderCol)).as("_mn"), max(col(orderCol)).as("_mx"))
    val span = (col("_mx") - col("_mn") + lit(1)).cast("double")
    val eb = df.crossJoin(broadcast(stats))
      .withColumn("_bkt",
        least(lit(buckets - 1),
          floor((col(orderCol) - col("_mn")).cast("double") / span * buckets))
          .cast("int"))
    val sums = eb.groupBy("_bkt").agg(sum(col(weightCol)).as("_wsum"))
    val offsets = sums.as("a")
      .join(sums.select(col("_bkt").as("_pb"), col("_wsum").as("_pw")).as("b"),
        col("_pb") < col("a._bkt"), "left")
      .groupBy(col("a._bkt").as("_bkt"))
      .agg(coalesce(sum("_pw"), lit(0L)).as("_off"))
    eb
      .withColumn("_rs",
        sum(col(weightCol)).over(Window.partitionBy("_bkt").orderBy(orderCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets), "_bkt")
      .withColumn(cumCol, col("_off") + col("_rs"))
      .drop("_mn", "_mx", "_bkt", "_rs", "_off")
  }
}
