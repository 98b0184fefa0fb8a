package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues}

/** Per-key dimension timeline, sorted ascending by timestamp: version
  * i is valid from tsMillis(i) (inclusive) until tsMillis(i+1). The
  * whole static side of a stream-static as-of join, held as keyed
  * state. */
final case class DimTimeline(tsMillis: Array[Long], version: Array[String])

/** One enriched fact: `aEvent` (the record's value) at `tsMillis`,
  * joined as-of against the dimension — `bEvent` is the version current
  * at the fact's event time (None before the first version). */
final case class AsofEnriched(
    key: String, aEvent: String, tsMillis: Long, bEvent: Option[String])

/** Stream-side as-of enrichment (r11, VERDICT r10 item 8) — the FOURTH
  * batch/stream operator pair sharing one semantics definition (after
  * change detection, funnels, transitions): "enrich each event with the
  * dimension version current at its event time", the streaming twin of
  * the batch `join_asof` union+window query (queries/JoinsExtQ.scala).
  *
  * The dimension's per-key interval index rides keyed state
  * ([[DimTimeline]] in a ValueState), loaded up front through the
  * initial-state bootstrap (the ChangeDetector.bootstrapped shape) and
  * updatable MID-STREAM: records whose `topic` equals `dimTopic` are
  * dimension-version upserts (inserted into the timeline at their
  * event time — same-ts upsert replaces, the latest-wins store
  * discipline), everything else is a fact looked up by binary search
  * for the greatest version timestamp <= the fact's. Inclusive, so an
  * equal-timestamp version applies — exactly the batch query's "B rows
  * sort before A rows at equal ts".
  *
  * Replay parity (StreamingAsofSpec): bootstrapping the deduped click
  * timeline and streaming the purchase facts of a bounded null-free
  * slice reproduces the batch `join_asof` rows exactly, across
  * micro-batch boundaries. Null-ts and tombstone records are skipped —
  * the same documented policy as FunnelTracker/TransitionTracker (no
  * event time to join as-of). Same-ts dim-update vs fact WITHIN one
  * micro-batch resolves by the deterministic KeyedRecord.orderKey
  * (ts, tombstone, value); across batches the update always lands
  * first.
  *
  * Scale: state per key is the key's OWN version history (bounded by
  * [[AsofEnricher.MaxVersionsPerKey]], fail-loud), facts never buffer
  * beyond one micro-batch's bounded share, and the lookup is
  * O(log versions) per fact. This is the shape that replaces a
  * broadcast temporal join when the dimension exceeds broadcast size:
  * both sides shuffle once on the key, the index lives in RocksDB. */
class AsofEnricherProcessor(
    dimTopic: String,
    maxBatchRowsPerKey: Int = ChangeDetector.DefaultMaxBatchRowsPerKey)
    extends StatefulProcessorWithInitialState[
      String, KeyedRecord, AsofEnriched, DimTimeline] {

  @transient private var timeline
      : org.apache.spark.sql.streaming.ValueState[DimTimeline] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    timeline = getHandle.getValueState[DimTimeline](
      "timeline", Encoders.product[DimTimeline], TTLConfig.NONE)

  override def handleInitialState(
      key: String, initial: DimTimeline, timerValues: TimerValues): Unit =
    if (initial != null && initial.tsMillis.nonEmpty) timeline.update(initial)

  override def handleInputRows(
      key: String,
      rows: Iterator[KeyedRecord],
      timerValues: TimerValues): Iterator[AsofEnriched] = {
    val ordered = ChangeDetector
      .boundedBuffer(key, rows, maxBatchRowsPerKey)
      .sortBy(KeyedRecord.orderKey)
    var tl =
      if (timeline.exists()) timeline.get()
      else DimTimeline(Array.emptyLongArray, Array.empty[String])
    var dirty = false
    val out = scala.collection.mutable.ArrayBuffer[AsofEnriched]()
    ordered.foreach { r =>
      if (r.ts != null && r.value != null) {
        val ts = r.ts.getTime
        if (r.topic == dimTopic) {
          tl = AsofEnricher.upsert(key, tl, ts, r.value)
          dirty = true
        } else {
          val i = AsofEnricher.floorIndex(tl.tsMillis, ts)
          out += AsofEnriched(key, r.value, ts,
            if (i >= 0) Some(tl.version(i)) else None)
        }
      }
    }
    if (dirty) timeline.update(tl)
    out.iterator
  }
}

object AsofEnricher {

  /** Loud ceiling on one key's version history (a dimension key with
    * more versions than this needs compaction upstream, not silent
    * state growth). */
  val MaxVersionsPerKey: Int = 1 << 16

  /** Greatest index with ts(i) <= t, or -1. `ts` sorted ascending. */
  private[streaming] def floorIndex(ts: Array[Long], t: Long): Int = {
    var lo = 0; var hi = ts.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ts(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  /** Insert/replace a version at `t`, keeping the timeline sorted. */
  private[streaming] def upsert(
      key: String, tl: DimTimeline, t: Long, v: String): DimTimeline = {
    val i = floorIndex(tl.tsMillis, t)
    if (i >= 0 && tl.tsMillis(i) == t) {
      val nv = tl.version.clone(); nv(i) = v
      DimTimeline(tl.tsMillis, nv)
    } else {
      require(tl.tsMillis.length < MaxVersionsPerKey,
        s"key=$key exceeds $MaxVersionsPerKey dimension versions — " +
          "compact the dimension stream upstream")
      val at = i + 1
      val nt = new Array[Long](tl.tsMillis.length + 1)
      val nv = new Array[String](tl.version.length + 1)
      System.arraycopy(tl.tsMillis, 0, nt, 0, at)
      System.arraycopy(tl.version, 0, nv, 0, at)
      nt(at) = t; nv(at) = v
      System.arraycopy(tl.tsMillis, at, nt, at + 1, tl.tsMillis.length - at)
      System.arraycopy(tl.version, at, nv, at + 1, tl.version.length - at)
      DimTimeline(nt, nv)
    }
  }

  /** Pure-stream form: the dimension arrives only via `dimTopic`
    * records. */
  def apply(ds: Dataset[KeyedRecord], dimTopic: String = "dim",
      maxBatchRowsPerKey: Int = ChangeDetector.DefaultMaxBatchRowsPerKey)
      : Dataset[AsofEnriched] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(
        new AsofEnricherProcessor(dimTopic, maxBatchRowsPerKey),
        TimeMode.None(),
        OutputMode.Append())
  }

  /** Bootstrapped form: `dim` (a bounded snapshot of the static side —
    * key, event-time, version) loads as the initial per-key timeline;
    * null-ts/tombstone dim rows are dropped, duplicate timestamps keep
    * the orderKey-last row (callers wanting batch join_asof's
    * MAX(event_id) tie rule pre-dedup exactly as the batch query does). */
  def bootstrapped(ds: Dataset[KeyedRecord], dim: Dataset[KeyedRecord],
      dimTopic: String = "dim",
      maxBatchRowsPerKey: Int = ChangeDetector.DefaultMaxBatchRowsPerKey)
      : Dataset[AsofEnriched] = {
    import ds.sparkSession.implicits._
    val timelines = dim
      .filter(r => r.ts != null && r.value != null)
      .groupByKey(_.key)
      .mapGroups { (k, it) =>
        val arr = it.toArray.sortBy(KeyedRecord.orderKey)
        val dedup = new scala.collection.mutable.ArrayBuffer[(Long, String)]
        arr.foreach { r =>
          val t = r.ts.getTime
          if (dedup.nonEmpty && dedup.last._1 == t)
            dedup(dedup.length - 1) = (t, r.value)
          else dedup += ((t, r.value))
        }
        require(dedup.length <= MaxVersionsPerKey,
          s"key=$k exceeds $MaxVersionsPerKey dimension versions")
        (k, DimTimeline(dedup.map(_._1).toArray, dedup.map(_._2).toArray))
      }
    ds.groupByKey(_.key)
      .transformWithState(
        new AsofEnricherProcessor(dimTopic, maxBatchRowsPerKey),
        TimeMode.None(),
        OutputMode.Append(),
        timelines.groupByKey(_._1).mapValues(_._2))
  }
}
