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
}
