package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** A key's first appearance: emitted exactly once, with its event time
  * (epoch millis). Grouping by day downstream reproduces the batch
  * `evt_cumulative_users` new-user series. */
final case class FirstSeen(key: String, tsMillis: Long)

/** Streaming twin of the batch `evt_cumulative_users` operator
  * (queries/EventsQ.scala): distinct-key first-appearance as keyed
  * state. The first non-null-ts record a key ever shows emits one
  * FirstSeen and pins the key's state; every later record is absorbed
  * silently — the streaming form of `MIN(ts) GROUP BY user_id`, with
  * O(1) state per key instead of a corpus-wide aggregation.
  *
  * Replay parity (StreamingFirstSeenSpec): when micro-batches arrive in
  * event-time order (the tracker sorts WITHIN a batch via the shared
  * boundedBuffer discipline), the emitted tsMillis equals the batch
  * MIN(ts) per key, so day-grouped counts equal `evt_cumulative_users`
  * exactly. Policy under cross-batch late data: the first OBSERVED
  * record wins (state never rewrites) — the deliberate streaming
  * semantics for "new user seen", same divergence-by-policy note as
  * FunnelTracker/TransitionTracker. Null-ts records are skipped.
  *
  * This is the FIFTH batch/stream operator pair sharing one semantics
  * definition (change detection, funnel, transitions, as-of enrich,
  * first-seen) — the samsa keyed-state shape with a set-membership
  * transition function.
  */
class FirstSeenProcessor(
    maxBatchRowsPerKey: Int = ChangeDetector.DefaultMaxBatchRowsPerKey)
    extends StatefulProcessor[String, KeyedRecord, FirstSeen] {

  @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Long](
      "firstSeenTs", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[KeyedRecord],
      timerValues: TimerValues): Iterator[FirstSeen] = {
    if (seen.exists()) { rows.foreach(_ => ()); Iterator.empty }
    else {
      val ordered = ChangeDetector
        .boundedBuffer(key, rows, maxBatchRowsPerKey)
        .sortBy(KeyedRecord.orderKey)
      ordered.find(_.ts != null) match {
        case Some(first) =>
          val ts = first.ts.getTime
          seen.update(ts)
          Iterator.single(FirstSeen(key, ts))
        case None => Iterator.empty
      }
    }
  }
}

object FirstSeenTracker {
  def apply(
      ds: Dataset[KeyedRecord],
      maxBatchRowsPerKey: Int = ChangeDetector.DefaultMaxBatchRowsPerKey)
      : Dataset[FirstSeen] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(
        new FirstSeenProcessor(maxBatchRowsPerKey),
        TimeMode.None(),
        OutputMode.Append())
  }
}
