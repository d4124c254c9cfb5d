package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for the write path — multi-
  * dimensional data layout so that a filter on EITHER clustered
  * dimension prunes most files via parquet min/max footer stats.
  *
  * A single-column sort gives perfect pruning on that column and none
  * on any other: each of N files spans ~1/N of the sort key but the
  * FULL domain of every other column. Interleaving the bits of two
  * bounded dimensions (Morton 1966; the layout behind index-organized
  * spatial stores and lakehouse OPTIMIZE ZORDER) makes range-
  * partitioned files cover compact rectangles in BOTH dimensions —
  * ~1/√N of each domain for N files — so predicates on either column
  * (or both) skip all non-overlapping files before any row is read.
  * At 100 TB the scan cost of a point-ish query drops from "every
  * file" to O(√N) files, with zero read-path changes: the pruning is
  * ordinary parquet footer min/max evaluation.
  *
  * Everything here is plain column arithmetic (shifts, masks, ors) —
  * whole-stage-codegen'd, no UDF, no custom expression needed.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so consecutive input bits land two
    * apart (classic parallel-prefix bit dilation, 4 shift/mask
    * rounds): b15..b0 → 0b15 0b14 … 0b0. */
  def spread16(c: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val s = Seq(8, 4, 2, 1)
    m.zip(s).foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (mask, sh)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }
  }

  /** Morton code of two 16-bit values: bits of `a` on even positions,
    * `b` on odd — a 32-bit z-value whose total order walks the
    * (a, b) plane in nested quadrants. */
  def zvalue16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Scale `c` from its [lo, hi] domain onto the 16-bit grid. */
  def grid16(c: Column, lo: Column, hi: Column): Column =
    when(hi <= lo, lit(0L))
      .otherwise(((c.cast("double") - lo) * 65535.0 / (hi - lo)).cast("long"))

  /** Write `df` as `nFiles` parquet files range-partitioned and sorted
    * by the z-value of (`dimA`, `dimB`). Domain bounds come from one
    * tiny min/max aggregate (4 scalars — not a data collect). The
    * z-value is layout-only scaffolding and is NOT persisted. */
  def writeClustered(
      df: DataFrame, path: String, nFiles: Int,
      dimA: String, dimB: String): Unit = {
    val b = df.agg(
      min(col(dimA)).cast("double").as("a0"), max(col(dimA)).cast("double").as("a1"),
      min(col(dimB)).cast("double").as("b0"), max(col(dimB)).cast("double").as("b1"))
      .collect()(0)
    val (a0, a1, b0, b1) = (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    df.withColumn("_z", zvalue16(
        grid16(col(dimA), lit(a0), lit(a1)),
        grid16(col(dimB), lit(b0), lit(b1))))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
