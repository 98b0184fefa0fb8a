package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

/** One keyed arrival for streaming deduplication. */
final case class DedupEvent(k: String, event_id: Long, ts: java.sql.Timestamp)

/** Native streaming deduplication — the TWELFTH batch/stream parity
  * pair, twin of the batch `dedup_first_by_key` operator
  * (queries/SetOpsQ.scala): keep the first record per key, drop every
  * later duplicate.
  *
  * Like WindowJoin (the eleventh pair) this carries NO custom
  * processor — the point is Structured Streaming's own
  * `dropDuplicatesWithinWatermark` operator: per-key state holds one
  * entry, and the event-time watermark is what BOUNDS it — a key's
  * dedup entry is evicted once the watermark passes its event time
  * plus the delay, so state is O(distinct keys per watermark horizon)
  * rather than O(all keys ever) (plain `dropDuplicates` on a stream is
  * the unbounded-state anti-pattern this operator exists to replace).
  * That horizon IS the semantic contract: a duplicate arriving later
  * than `delay` after the original re-emits — the deduplication window
  * every at-least-once ingest pipeline states explicitly.
  *
  * Parity: "first" in the batch twin is the (o_orderkey) window order;
  * in the stream it is ARRIVAL order. Replaying a bounded slice in
  * event-time order across micro-batches therefore reproduces the
  * batch survivor set exactly — one row per key, the key set equal,
  * and (when a key's first row lands in an earlier micro-batch than
  * its duplicates) the surviving row itself identical.
  * StreamingDedupNativeSpec asserts all three plus the re-emit-after-
  * horizon contract.
  *
  * Reference precedent: samsa dedups by construction on its state key
  * (latest-wins upsert, samsa/db/sqldb.py:40-64); FIRST-wins over an
  * event stream is the ingest-side complement.
  */
object StreamDedup {

  val DefaultDelay = "2 hours"

  def apply(in: Dataset[DedupEvent], delay: String = DefaultDelay): DataFrame =
    in.toDF().withWatermark("ts", delay).dropDuplicatesWithinWatermark("k")
}
