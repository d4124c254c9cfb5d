package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family; each entry
  * has a DuckDB oracle in `oracleSql` (same output column names — the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-per-nation 3-way join-agg (SURVEY.md §7.3). */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreQueries.queries("j4_revenue_per_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.CoreQueries.queries ++
      operators.CdcQueries.queries ++
      operators.TextQueries.queries ++
      operators.DedupQueries.queries ++
      operators.SimilarityQueries.queries ++
      operators.Multimodal.queries ++
      operators.WindowQueries.queries ++
      operators.AnalyticsQueries.queries ++
      operators.AsOfJoin.queries ++
      operators.RangeJoin.queries ++
      operators.CorpusPipeline.queries ++
      operators.SamplingQueries.queries ++
      operators.ProfileQueries.queries ++
      operators.TimeSeriesQueries.queries ++
      operators.GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.CoreQueries.oracles ++
      operators.CdcQueries.oracles ++
      operators.TextQueries.oracles ++
      operators.DedupQueries.oracles ++
      operators.SimilarityQueries.oracles ++
      operators.Multimodal.oracles ++
      operators.WindowQueries.oracles ++
      operators.AnalyticsQueries.oracles ++
      operators.AsOfJoin.oracles ++
      operators.RangeJoin.oracles ++
      operators.CorpusPipeline.oracles ++
      operators.SamplingQueries.oracles ++
      operators.ProfileQueries.oracles ++
      operators.TimeSeriesQueries.oracles ++
      operators.GraphQueries.oracles
}
