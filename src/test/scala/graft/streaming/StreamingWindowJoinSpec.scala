package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** WindowJoin: the native stream-stream range join, twin of the batch
  * `join_view_purchase_window` operator. Core claim is REPLAY PARITY —
  * an inner stream-stream join over a full replay emits exactly the
  * batch join's row set, across micro-batch boundaries, including pairs
  * whose two sides arrive in DIFFERENT micro-batches (the buffered-
  * state path). Plus a semantics probe for the window edges.
  */
class StreamingWindowJoinSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("replay parity: streamed pairs == batch join_view_purchase_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf("sf0.01"))
      .orderBy("ts", "event_id").limit(4000).localCheckpoint()
    val dir = tmp("wjoin-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("join_view_purchase_window")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "fixture slice must contain at least one pair")

    val vIn = MemoryStream[ViewEvent]
    val pIn = MemoryStream[PurchaseEvent]
    val out = WindowJoin(vIn.toDS(), pIn.toDS())
      .writeStream.format("memory").queryName("wjoin_out")
      .option("checkpointLocation", tmp("ckpt-wjoin"))
      .outputMode("append")
      .start()
    val views = evs.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("vts"))
      .as[ViewEvent].collect().sortBy(v => (v.vts.getTime, v.view_id))
    val purchases = evs.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("pts"))
      .as[PurchaseEvent].collect().sortBy(p => (p.pts.getTime, p.purchase_id))
    // three micro-batches per side, sides alternating: pairs must match
    // across batch boundaries through the buffered join state
    val vg = views.grouped(math.max(1, views.length / 3 + 1)).toSeq
    val pg = purchases.grouped(math.max(1, purchases.length / 3 + 1)).toSeq
    (0 until math.max(vg.length, pg.length)).foreach { i =>
      if (i < vg.length) vIn.addData(vg(i).toSeq)
      out.processAllAvailable()
      if (i < pg.length) pIn.addData(pg(i).toSeq)
      out.processAllAvailable()
    }
    out.stop()

    val streamed = spark.table("wjoin_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch,
      s"streamed ${streamed.size} pairs != batch ${batch.size}: " +
        s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("join buffers stay watermark-bounded as event time advances") {
    // VERDICT r14 item 5: quantitative state bound. 5 micro-batches of
    // 50 views + 50 purchases for FRESH users, event time advancing 3 h
    // per batch with a 1-minute watermark delay — each batch's rows age
    // out of the 1 h join window + delay before the next arrives, so
    // buffered state must stay ~2 batches deep (eviction lags one
    // trigger) while 500 rows/side stream through. An unwatermarked
    // stream-stream join would buffer all 500 per side forever.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[ViewEvent]
    val pIn = MemoryStream[PurchaseEvent]
    val out = WindowJoin(vIn.toDS(), pIn.toDS(), delay = "1 minute")
      .writeStream.format("memory").queryName("wjoin_bound_out")
      .option("checkpointLocation", tmp("ckpt-wjoin-bound"))
      .outputMode("append")
      .start()
    val base = 1700000000000L
    var maxState = 0L
    (0 until 5).foreach { b =>
      val t = base + b * 3L * 3600000L
      vIn.addData((0 until 50).map(i => ViewEvent(b * 100L + i,
        b * 1000L + i, new java.sql.Timestamp(t))))
      pIn.addData((0 until 50).map(i => PurchaseEvent(b * 100L + i,
        b * 1000L + 500 + i, new java.sql.Timestamp(t + 60000L))))
      out.processAllAvailable()
      val rows = out.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal)
      if (rows.nonEmpty) maxState = math.max(maxState, rows.max)
    }
    out.stop()
    val pairs = spark.table("wjoin_bound_out").count()
    assert(pairs === 250L, s"each user's purchase joins its view: $pairs")
    assert(maxState > 0L && maxState <= 200L,
      s"join state must stay horizon-bounded (<= 2 batches x 100 rows)," +
        s" saw max numRowsTotal=$maxState over 1000 rows streamed")
  }

  test("window edges: t+0 joins, t+1h excluded, cross-user excluded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[ViewEvent]
    val pIn = MemoryStream[PurchaseEvent]
    val out = WindowJoin(vIn.toDS(), pIn.toDS())
      .writeStream.format("memory").queryName("wjoin_edge_out")
      .option("checkpointLocation", tmp("ckpt-wjoin-edge"))
      .outputMode("append")
      .start()
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val base = 1700000000000L
    vIn.addData(Seq(ViewEvent(1L, 10L, ts(base))))
    pIn.addData(Seq(
      PurchaseEvent(1L, 20L, ts(base)),                 // same instant: joins
      PurchaseEvent(1L, 21L, ts(base + 3600000L - 1)),  // last in-window ms
      PurchaseEvent(1L, 22L, ts(base + 3600000L)),      // exactly +1h: excluded
      PurchaseEvent(2L, 23L, ts(base + 60000L)),        // other user: excluded
      PurchaseEvent(1L, 24L, ts(base - 1))))            // before the view: excluded
    out.processAllAvailable()
    out.stop()
    val got = spark.table("wjoin_edge_out").collect()
      .map(r => r.getLong(2)).sorted.toSeq
    assert(got === Seq(20L, 21L), s"expected purchases 20,21 only, got $got")
  }
}
