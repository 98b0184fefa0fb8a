package graft.streaming

import java.sql.Timestamp

/** Record/state shapes for the streaming-parity surface.
  *
  * `KeyedRecord` mirrors the fields samsa actually reads off a Kafka
  * message (key/value utf-8 strings, topic, partition —
  * /root/reference/samsa/kafka/storage.py:179-181,241-246); `ts` is the
  * event-time column Spark adds (samsa has no event time — poll order only).
  */
final case class KeyedRecord(
    key: String,
    value: String,
    topic: String,
    partition: Int,
    ts: Timestamp)

object KeyedRecord {
  /** Deterministic within-batch processing order: event time, then
    * non-null values, then tombstones (null value = delete, so a
    * same-timestamp tombstone wins over the value it deletes). The
    * Boolean term keeps the String term null-safe, and a null ts sorts
    * FIRST (Long.MinValue) — sorting on a raw null field would NPE and
    * kill the streaming query mid-batch (r10: found by the
    * FunnelTracker null-ts spec; every state processor shares this
    * sort). */
  def orderKey(r: KeyedRecord): (Long, Boolean, String) =
    (if (r.ts == null) Long.MinValue else r.ts.getTime,
      r.value == null, if (r.value == null) "" else r.value)
}

/** Output of the change-detection slice — the README's canonical query
  * (/root/reference/README.md:27-52): compare incoming value with stored
  * state, emit initial/changed/unchanged, save. */
final case class ChangeEvent(
    key: String,
    previous: Option[String],
    current: String,
    change: String)

/** One state-store row: samsa's `(key TEXT, value TEXT)` table
  * (/root/reference/samsa/db/sqldb.py:13), latest-wins per key. */
final case class StateEntry(key: String, value: String)
