package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * conversions, required to expose custom Catalyst Expressions through
  * the public Column API (the standard Spark-extension-library
  * pattern; the alternative — session-registered names +
  * `call_function` — forces global registration).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The RDD whose blocks an eager `localCheckpoint()` persisted, if
    * `df` is such a checkpoint result. The public Dataset API offers no
    * handle to it (`df.rdd` wraps a fresh deserializer RDD), and
    * diffing `sc.getPersistentRDDs` around the checkpoint races with
    * concurrent jobs persisting their own blocks — this reads it off
    * the analyzed plan's `LogicalRDD` instead, which is exact and
    * thread-safe. Used to free superseded checkpoint generations in
    * iterative algorithms and per-batch pins. */
  def persistedRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Rows EMITTED by `df`'s file scans in its last execution — i.e.
    * rows surviving parquet row-group/page skipping under the pushed
    * predicates (record-level parquet filtering is off by default, so
    * this measures exactly what the zone maps could not skip). Call
    * AFTER an action on the SAME Dataset instance (`df.collect()` /
    * `df.count()` route through `df.queryExecution`, whose plan
    * retains its metric values); unwraps the AQE root to reach the
    * final plan's leaves. Probe/diagnostic use — powers SweepProbe's
    * measured discovery-reads-O(expired) claim. */
  def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numOutputRows").value
    }.sum
  }

  /** Replace a checkpointed DataFrame's inherited statistics with
    * EXACT ones.
    *
    * `Dataset.localCheckpoint` carries the optimizer's ESTIMATED stats
    * of the producing plan into the resulting `LogicalRDD`
    * (`originStats`). In an iterative algorithm that checkpoints each
    * generation (connected components, PageRank, k-means), generation
    * k+1's estimate is a product of joins over generation k's already-
    * estimated stats — so the size estimate compounds ~×4 per
    * iteration, mis-costs every join after a few rounds, and past ~13
    * iterations overflows Spark's `BigInteger` size arithmetic at
    * planning time (`SizeInBytesOnlyStatsPlanVisitor`), killing the
    * query. The loop, however, KNOWS its invariants (CC: |labels| =
    * |nodes| every iteration) — this injects them, which both fixes
    * the overflow and restores sane broadcast decisions inside the
    * loop. No-op on non-checkpointed frames. */
  def withExactStats(
      df: org.apache.spark.sql.DataFrame, rows: Long, bytesPerRow: Long): org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = BigInt(rows) * bytesPerRow, rowCount = Some(BigInt(rows)))
        val pinned = new org.apache.spark.sql.execution.LogicalRDD(
          l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
          l.isStreaming, l.stream)(session, Some(stats), None)
        org.apache.spark.sql.classic.Dataset.ofRows(session, pinned)
      case _ => df
    }
}
