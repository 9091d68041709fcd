package graft.streaming

import java.sql.Timestamp

/** CDC change-event model (St1/St2, SURVEY §2.9).
  *
  * The reference stops at persisting the binlog coordinates for "a future
  * CDC consumer" (mysql_to_clickhouse_sync.py:175-181). This is that
  * consumer's event shape: one row per binlog row-event, ordered by
  * (ts, seq). `op` follows the usual row-event taxonomy; `payload` holds
  * the after-image as JSON. ReplacingMergeTree-style latest-state
  * application needs only key + after + tombstone, but DELTA consumers
  * (incremental view maintenance: retract the old row, add the new) need
  * what the statement removed too — `payloadBefore` carries the
  * before-image JSON for updates/deletes when the log had one (null for
  * inserts; PK-only under `binlog_row_image=MINIMAL`).
  */
final case class ChangeEvent(
    op: String,        // "insert" | "update" | "delete"
    table: String,
    key: Long,         // primary key of the affected row
    ts: Timestamp,     // commit timestamp (event time)
    seq: Long,         // total order within the log (binlog position analog)
    payload: String,   // after-image JSON; null for deletes
    payloadBefore: String = null) // before-image JSON; null for inserts

object ChangeEvent {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
}

/** Typed view of the harness `events` fixture for typed streaming ops. */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/** State buffer for the running per-user aggregation demo. */
final case class UserRunningState(n: Long, total: Double)

final case class UserRunningOutput(user_id: Long, n: Long, total: Double)

/** A document row as streamed into [[NearDupIngest]]. */
final case class DocRow(doc_id: Long, text: String)
