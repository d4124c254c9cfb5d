package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.KeyedParquetStore

/** Two-store namespace registration — the reference's `source` /
  * `target` databases (quickstart_prepare_peers.sh:16–19) as SQL
  * namespaces: every table becomes `<ns>_<table>` temp views so the
  * whole monitoring surface is runnable as plain `spark.sql` text
  * across both stores (S2/S4). */
object Namespaces {

  def registerSource(spark: SparkSession, ns: String, tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) => df.createOrReplaceTempView(s"${ns}_$name") }

  def registerTarget(spark: SparkSession, ns: String, store: KeyedParquetStore,
      tables: Seq[String]): Unit =
    tables.foreach { t =>
      if (store.exists(spark, t))
        store.read(spark, t).createOrReplaceTempView(s"${ns}_$t")
    }

  /** The signature lag query as cross-namespace SQL (J2). */
  def lagSql(spark: SparkSession, ns1: String, ns2: String, table: String): DataFrame =
    spark.sql(
      s"""SELECT s.n AS src_rows, t.n AS tgt_rows, s.n - t.n AS lag,
            CASE WHEN s.n - t.n = 0 THEN 'SYNCED'
                 WHEN ABS(s.n - t.n) <= 5 THEN 'NEAR_SYNC'
                 ELSE 'LAG' END AS sync_status
          FROM (SELECT COUNT(*) AS n FROM ${ns1}_$table) s
          CROSS JOIN (SELECT COUNT(*) AS n FROM ${ns2}_$table) t""")
}
