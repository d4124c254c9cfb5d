package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-stratum quota admission — the online face of sp2's
  * fixed-quota sample: admit at most `quota` documents per stratum
  * (language, source, …) across the LIFETIME of the stream, then drop
  * the rest at ingest. This is how a bounded training-mix slice is
  * carved out of an unbounded firehose without ever buffering it.
  *
  * Determinism & replay: admission is FIFO within the stream's arrival
  * order, and the only state is one counter per stratum (state store
  * size O(#strata), independent of volume). Under micro-batch replay
  * the counter is checkpoint-versioned with the batch, so a replayed
  * batch re-admits exactly the same documents — effectively-once
  * admission without content tracking.
  *
  * Within one micro-batch the iterator order is the shuffle's arrival
  * order; callers that need a canonical within-batch choice sort the
  * batch by a key-derived hash BEFORE the groupByKey (sp2's rule) —
  * admission then prefers the same documents on every engine.
  */
object StreamQuota {

  case class Doc(doc_id: Long, lang: String, text: String)
  case class Admitted(doc_id: Long, lang: String, rankInStratum: Long)

  /** Admit up to `quota` docs per lang; emits admitted docs with their
    * 1-based admission rank inside the stratum. */
  def quotaAdmit(docs: Dataset[Doc], quota: Int): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.lang)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[Doc], state: GroupState[Long]) =>
          var admitted = state.getOption.getOrElse(0L)
          val out = Vector.newBuilder[Admitted]
          // deterministic within-batch order: by doc_id (the batch is
          // bounded; the sort is per-group, per-batch)
          it.toVector.sortBy(_.doc_id).foreach { d =>
            if (admitted < quota) {
              admitted += 1
              out += Admitted(d.doc_id, lang, admitted)
            }
          }
          state.update(admitted)
          out.result().iterator
      }
  }
}
