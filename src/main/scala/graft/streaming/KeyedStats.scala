package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** The remaining transformWithState state-variable kinds (SURVEY §2.3
  * "stateful keyed processing ... ValueState/ListState/MapState + TTL"):
  * a bounded per-key history (ListState) and per-key counters by event
  * type (MapState). Both are capability supersets of samsa's single
  * string ValueState store — the reference has no list/map state at all
  * (its table is strictly key->latest value, /root/reference/samsa/db/
  * sqldb.py:13).
  */
final case class KeyHistory(key: String, history: Seq[String])
final case class TypeCount(key: String, value: String, n: Long)

/** Keeps the last `cap` values per key in arrival (event-time) order. */
class HistoryProcessor(cap: Int)
    extends StatefulProcessor[String, KeyedRecord, KeyHistory] {

  @transient private var hist: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hist = getHandle.getListState[String]("history", Encoders.STRING, TTLConfig.NONE)

  override def handleInputRows(
      key: String, rows: Iterator[KeyedRecord], tv: TimerValues): Iterator[KeyHistory] = {
    rows.toSeq.sortBy(r => (r.ts.getTime, r.value))
      .foreach(r => hist.appendValue(r.value))
    val all = hist.get().toSeq
    val trimmed = all.takeRight(cap)
    if (trimmed.size != all.size) { hist.clear(); trimmed.foreach(hist.appendValue) }
    Iterator.single(KeyHistory(key, trimmed))
  }
}

/** Running count per (key, value) via MapState — per-key grouped counters
  * without a second shuffle. */
class TypeCountProcessor
    extends StatefulProcessor[String, KeyedRecord, TypeCount] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String, rows: Iterator[KeyedRecord], tv: TimerValues): Iterator[TypeCount] = {
    val touched = scala.collection.mutable.LinkedHashSet[String]()
    rows.foreach { r =>
      val prev = if (counts.containsKey(r.value)) counts.getValue(r.value) else 0L
      counts.updateValue(r.value, prev + 1)
      touched += r.value
    }
    touched.iterator.map(v => TypeCount(key, v, counts.getValue(v)))
  }
}

object KeyedStats {

  def history(ds: Dataset[KeyedRecord], cap: Int = 5): Dataset[KeyHistory] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new HistoryProcessor(cap), TimeMode.None(), OutputMode.Update())
  }

  def typeCounts(ds: Dataset[KeyedRecord]): Dataset[TypeCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new TypeCountProcessor, TimeMode.None(), OutputMode.Update())
  }
}
