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
}
