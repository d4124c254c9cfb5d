package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-table running replication counters via custom keyed state
  * (`flatMapGroupsWithState`) — the engine-native version of the
  * reference's cumulative metrics accounting (insert.ps1:288–308
  * accumulates successful/failed op counts across batches in script
  * variables; here the accumulator is Spark-managed state that
  * survives micro-batches and restarts via the checkpoint).
  *
  * Scale: state is one small record per table (the group key), so the
  * state store stays O(#tables) regardless of stream volume.
  */
object StatefulCounters {

  case class OpCounts(
      table: String,
      inserts: Long,
      updates: Long,
      deletes: Long,
      netRows: Long,
      maxLsn: Long)

  /** Emits the updated cumulative counts for each table present in
    * each micro-batch. */
  def runningOpCounts(events: Dataset[ChangeEvent]): Dataset[OpCounts] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.table)
      .flatMapGroupsWithState[OpCounts, OpCounts](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (table: String, it: Iterator[ChangeEvent], state: GroupState[OpCounts]) =>
          val prev = state.getOption.getOrElse(OpCounts(table, 0, 0, 0, 0, 0))
          var i = 0L; var u = 0L; var d = 0L; var maxLsn = prev.maxLsn
          it.foreach { e =>
            e.op match {
              case "I" => i += 1
              case "U" => u += 1
              case "D" => d += 1
              case _ => ()
            }
            if (e.lsn > maxLsn) maxLsn = e.lsn
          }
          val next = OpCounts(table,
            prev.inserts + i, prev.updates + u, prev.deletes + d,
            prev.netRows + i - d, maxLsn)
          state.update(next)
          Iterator.single(next)
      }
  }
}
