package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One view impression: the left side of the attribution join. */
final case class ViewEvent(user_id: Long, view_id: Long, vts: java.sql.Timestamp)

/** One purchase: the right side of the attribution join. */
final case class PurchaseEvent(p_user: Long, purchase_id: Long, pts: java.sql.Timestamp)

/** Native stream-stream event-time range join — the ELEVENTH
  * batch/stream parity pair, twin of the batch
  * `join_view_purchase_window` operator (queries/JoinsExtQ.scala):
  * every (view, purchase) pair by the same user with the purchase
  * inside [view, view + 1h).
  *
  * Unlike the other pairs this one carries NO custom processor — the
  * point is Structured Streaming's own stream-stream join operator:
  * both sides are watermarked, the equi-key (user) partitions the join
  * state, and the range predicate (`pts` within an hour of `vts`) is
  * what lets the engine BOUND that state — a view can be dropped from
  * the buffer once the purchase-side watermark passes `vts + 1h + delay`,
  * a purchase once the view-side watermark passes `pts + delay`.
  * Without the range condition the buffers would grow with the stream;
  * with it, state is O(events per key per watermark horizon), the same
  * bounded-state discipline the custom trackers enforce by hand.
  *
  * Semantics parity: an INNER stream-stream join in append mode emits a
  * pair in the micro-batch where both rows have arrived; the watermark
  * governs only state eviction (completeness), not the join predicate.
  * A full replay therefore reproduces the batch join's row set exactly
  * — StreamingWindowJoinSpec asserts set equality against
  * `join_view_purchase_window` over a bounded slice, streamed across
  * micro-batch boundaries in event-time order (so no row arrives
  * later than `delay` behind the max watermark and none is evicted
  * early).
  *
  * Reference precedent: samsa has no join operator at all — correlating
  * two topics means hand-wiring two consumers over one state store
  * (samsa/kafka/storage.py:228 consume + :208 query); this is that
  * composition as one declarative operator.
  */
object WindowJoin {

  /** Watermark delay on both sides. Parity replays feed event-time-
    * ordered micro-batches, so any delay works; production sets it to
    * the source's real out-of-orderness bound. */
  val DefaultDelay = "2 hours"

  def apply(
      views: Dataset[ViewEvent],
      purchases: Dataset[PurchaseEvent],
      delay: String = DefaultDelay): DataFrame = {
    val v = views.toDF().withWatermark("vts", delay)
    val p = purchases.toDF().withWatermark("pts", delay)
    v.join(p,
        col("user_id") === col("p_user")
          && col("pts") >= col("vts")
          && col("pts") < col("vts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"))
  }
}
