package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data profiling — the audit a pipeline runs before pointing a
  * training job at a corpus: per-column row/null/distinct counts and
  * min/max, as rows (one per column) so downstream checks are data,
  * not schema.
  *
  * Scale shape: ONE scan. All per-column aggregates land in a single
  * `agg` (Spark plans the multi-column COUNT(DISTINCT) set through one
  * Expand — still one pass over the data), producing a single wide
  * row that `stack` pivots into per-column rows driver-free. Profiling
  * N columns costs one table read, not N.
  *
  * At extreme cardinality swap `countDistinct` for
  * [[graft.functions.HllSketch.hll_distinct]] — same query shape, the
  * Expand disappears, and the shuffle carries sketches instead of
  * keys (the exact spelling here is what the oracle can check).
  */
object ProfileQueries {

  /** Per-column profile of `cols`: (column, n, n_null, n_distinct,
    * min_val, max_val) with min/max rendered as strings so mixed-type
    * columns share one output schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__null"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__n`, `${c}__null`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(column_name, n, n_null, n_distinct, min_val, max_val)")
      .orderBy("column_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p7_profile_documents" -> { (s, d) =>
      profile(Tables.load(s, d, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
    }
  )

  private def colProfileSql(c: String): String =
    s"""SELECT '$c' AS column_name, COUNT(*) AS n,
          COUNT(*) - COUNT($c) AS n_null,
          COUNT(DISTINCT $c) AS n_distinct,
          CAST(MIN($c) AS VARCHAR) AS min_val,
          CAST(MAX($c) AS VARCHAR) AS max_val
        FROM documents"""

  def oracles: Map[String, String] = Map(
    "p7_profile_documents" -> (
      Seq("doc_id", "lang", "source", "n_chars")
        .map(colProfileSql).mkString("", " UNION ALL ", " ORDER BY column_name"))
  )
}
