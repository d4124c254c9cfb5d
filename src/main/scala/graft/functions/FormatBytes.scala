package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `format_bytes(bytes BIGINT) -> STRING` — human-readable byte sizes,
  * the engine's `pg_size_pretty` (reference usage:
  * monitoring.ps1:515–516,922,937; KiB relabeling monitoring.ps1:32–47).
  *
  * Semantics (fixed, documented, oracle-checkable):
  *   - < 1024            → "<n> B"
  *   - < 1024²           → one-decimal KiB, round-half-up
  *   - < 1024³           → one-decimal MiB
  *   - else              → one-decimal GiB
  * Rounding is done in exact integer arithmetic
  * (`(bytes*10 + unit/2) / unit`) so results are identical in any
  * engine — no floating point anywhere.
  *
  * Implemented as a native Catalyst Expression with `doGenCode` —
  * inlines into whole-stage codegen (no UDF boxing, null-safe fast
  * path), per the custom-function preference order (SURVEY.md §7.4).
  */
case class FormatBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "format_bytes"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(FormatBytes.format(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fmt = FormatBytes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($fmt.format($c))")
  }

  override protected def withNewChildInternal(newChild: Expression): FormatBytes =
    copy(child = newChild)
}

object FormatBytes {

  private val KiB = 1024L
  private val MiB = KiB * 1024
  private val GiB = MiB * 1024

  /** Exact integer one-decimal rounding: value*10/unit, half-up. */
  private def oneDecimal(bytes: Long, unit: Long): String = {
    val tenths = (bytes * 10 + unit / 2) / unit
    s"${tenths / 10}.${tenths % 10}"
  }

  def format(bytes: Long): String =
    if (bytes < KiB) s"$bytes B"
    else if (bytes < MiB) s"${oneDecimal(bytes, KiB)} KiB"
    else if (bytes < GiB) s"${oneDecimal(bytes, MiB)} MiB"
    else s"${oneDecimal(bytes, GiB)} GiB"

  /** Column API. Input must be BIGINT (cast upstream). */
  def format_bytes(c: Column): Column =
    Bridge.column(FormatBytes(Bridge.expression(c)))

  /** Register `format_bytes` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "format_bytes", exprs => FormatBytes(exprs.head), "built-in")
}
