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
