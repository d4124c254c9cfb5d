package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FormatBytes
import graft.functions.FormatBytes.format_bytes

class FormatBytesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("scalar semantics: unit branches + half-up one-decimal rounding") {
    assert(FormatBytes.format(0L) == "0 B")
    assert(FormatBytes.format(1023L) == "1023 B")
    assert(FormatBytes.format(1024L) == "1.0 KiB")
    assert(FormatBytes.format(1536L) == "1.5 KiB")
    assert(FormatBytes.format(1024L + 51) == "1.0 KiB")   // 1.0498 → 1.0
    assert(FormatBytes.format(1024L + 52) == "1.1 KiB")   // 1.0508 → 1.1
    assert(FormatBytes.format(1048575L) == "1024.0 KiB")
    assert(FormatBytes.format(1048576L) == "1.0 MiB")
    assert(FormatBytes.format(3L * 1024 * 1024 * 1024) == "3.0 GiB")
  }

  test("Column API inlines into the plan and handles null") {
    import spark.implicits._
    val df = Seq(Some(2048L), None).toDF("b")
      .select(format_bytes(col("b")).as("s"))
    val got = df.collect().map(r => Option(r.getString(0))).toSet
    assert(got == Set(Some("2.0 KiB"), None))
  }

  test("SQL registration: usable from spark.sql text") {
    FormatBytes.register(spark)
    val got = spark.sql("SELECT format_bytes(CAST(1572864 AS BIGINT)) AS s")
      .collect().head.getString(0)
    assert(got == "1.5 MiB")
  }

  test("expression participates in whole-stage codegen") {
    import spark.implicits._
    val df = spark.range(10).select(format_bytes(col("id") * 1000).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage; the
    // Project containing format_bytes must carry it
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("format_bytes")),
      s"format_bytes not inside a codegen stage:\n$plan")
    assert(df.count() == 10)
  }
}
