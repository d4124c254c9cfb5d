package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's monitoring thresholds, defined once (they ARE the
  * spec — monitoring.ps1:596–606, 626–637, 807–808). The
  * oracle-checked queries in `operators/` intentionally quote the
  * literals inline (their DuckDB SQL must carry the same constants);
  * every runtime monitoring surface classifies through here.
  */
object Thresholds {

  /** NEAR_SYNC row-lag tolerance (monitoring.ps1:599). */
  val nearSyncLagRows = 5

  /** Replication-efficiency bands (monitoring.ps1:626–637). */
  val efficiencyGreenPct = 95.0
  val efficiencyYellowPct = 80.0

  /** Health bands over a ratio (monitoring.ps1:807–808). */
  val healthGreenPct = 80.0
  val healthYellowPct = 50.0

  /** SYNCED / NEAR_SYNC / LAG from a row-lag column. */
  def syncStatus(lag: Column): Column =
    when(lag === 0, "SYNCED")
      .when(abs(lag) <= nearSyncLagRows, "NEAR_SYNC")
      .otherwise("LAG")

  /** Efficiency band label from an efficiency-% column. */
  def efficiencyBand(pct: Column): Column =
    when(pct >= efficiencyGreenPct, "near real-time")
      .when(pct >= efficiencyYellowPct, "acceptable")
      .otherwise("significant lag")

  /** green / yellow / red from a health-% column. */
  def healthBand(pct: Column): Column =
    when(pct >= healthGreenPct, "green")
      .when(pct >= healthYellowPct, "yellow")
      .otherwise("red")
}
