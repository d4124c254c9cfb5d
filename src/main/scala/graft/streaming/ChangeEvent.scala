package graft.streaming

import java.sql.Timestamp

/** CDC change-event envelope (SURVEY.md §1.1 / FIXTURES.md).
  *
  * Models the row-level change stream PeerDB ships from PostgreSQL
  * logical decoding (reference: wal_level=logical
  * volumes/postgresql.conf:3; I/U/D op taxonomy monitoring.ps1:683–686;
  * per-table routing README.md:103). PeerDB's internal wire format is
  * not public — the envelope is synthesized Debezium-style:
  *
  * @param lsn       monotonically increasing log sequence number —
  *                  total order of the WAL; dedup/ordering key
  * @param commitTs  commit timestamp of the source transaction
  * @param op        "I" | "U" | "D"
  * @param table     source table name (one mirror fans out to many
  *                  tables, README.md:103)
  * @param key       primary-key value of the changed row
  *                  (quickstart_prepare_peers.sh:26,34,42)
  * @param after     row image after the change as a JSON object;
  *                  null for deletes. JSON (not a struct) so one
  *                  stream can carry heterogeneous table schemas —
  *                  parsed per-table with from_json at apply time.
  * @param beforeKey the row's key BEFORE the change, when the source
  *                  reports it and it differs from `key` — the old
  *                  tuple Postgres logical decoding emits under
  *                  REPLICA IDENTITY (the reference's WAL source,
  *                  volumes/postgresql.conf:3) precisely so a
  *                  PRIMARY-KEY-CHANGING UPDATE can replicate as
  *                  delete(old) + upsert(new); without it the target
  *                  would upsert the new key and strand the old row
  *                  forever. None/null = key unchanged (the common
  *                  case, and every pre-r15 feed file).
  */
case class ChangeEvent(
    lsn: Long,
    commitTs: Timestamp,
    op: String,
    table: String,
    key: Long,
    after: String,
    beforeKey: Option[Long] = None)
