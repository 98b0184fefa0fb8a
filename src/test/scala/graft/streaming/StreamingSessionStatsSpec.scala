package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** SessionStatsTracker: the streaming twin of the batch
  * `evt_session_stats` operator — the SIXTH batch/stream parity pair.
  * Core claim is REPLAY PARITY: replaying a bounded event slice in
  * event-time order and aggregating the closed sessions per user
  * equals the batch `session_window(ts, gap)` per-user stats, with
  * sessions split both MID-BATCH (>= gap between sorted events in one
  * micro-batch) and ACROSS batches (watermark timer).
  */
class StreamingSessionStatsSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("replay parity: streamed session aggregates == batch evt_session_stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id").limit(600)
      .localCheckpoint()
    val dir = tmp("ss-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("evt_session_stats")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    val input = MemoryStream[KeyedRecord]
    val out = SessionStatsTracker(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 30 * 60 * 1000)
    val q = out.toDF()
      .writeStream.format("memory").queryName("ss_out")
      .option("checkpointLocation", tmp("ckpt-ss"))
      .outputMode("append").start()
    val recs = evs.select(
        col("user_id").cast("string").as("key"),
        col("event_type").as("value"),
        lit("events").as("topic"), lit(0).as("partition"), col("ts"))
      .as[KeyedRecord].collect()
      .sortBy(r => (r.ts.getTime, r.value))
    // three micro-batches: open sessions must bridge batches
    recs.grouped(200).foreach { g => input.addData(g.toSeq); q.processAllAvailable() }
    // sentinel: push the watermark past every open session's last + gap
    // so the final sessions all timer-close
    val maxTs = recs.map(_.ts.getTime).max
    input.addData(Seq(KeyedRecord("__sentinel__", "v", "t", 0,
      new Timestamp(maxTs + 31 * 60 * 1000))))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ss_out").as[ClosedSession].collect()
      .filter(_.key != "__sentinel__")
    val agg = streamed.groupBy(_.key).map { case (k, ss) =>
      k.toLong -> (ss.length.toLong, ss.map(_.nEvents).sum,
        ss.map(_.nEvents).max, ss.map(_.durSec).sum)
    }.toMap
    assert(agg.keySet == batch.keySet,
      s"user sets differ: only-stream=${agg.keySet -- batch.keySet} " +
        s"only-batch=${batch.keySet -- agg.keySet}")
    agg.foreach { case (u, s) =>
      assert(s == batch(u), s"user $u: streamed $s != batch ${batch(u)}")
    }
  }

  test("mid-batch gap splits emit immediately; null-ts rows are skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def rec(k: String, offSec: Long) =
      KeyedRecord(k, "v", "t", 0, new Timestamp(base + offSec * 1000))
    val input = MemoryStream[KeyedRecord]
    val out = SessionStatsTracker(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 60 * 1000)
    val q = out.toDF()
      .writeStream.format("memory").queryName("ss_split_out")
      .option("checkpointLocation", tmp("ckpt-ss-split"))
      .outputMode("append").start()
    // one micro-batch, one key: two events, a 2-minute hole, two more —
    // plus a null-ts record that must not disturb the session
    input.addData(Seq(rec("u", 0), rec("u", 20),
      KeyedRecord("u", "broken", "t", 0, null),
      rec("u", 140), rec("u", 150)))
    q.processAllAvailable()
    // the FIRST session (0s-20s, 2 events) must already be out — split
    // mid-batch, no watermark needed
    val mid = spark.table("ss_split_out").as[ClosedSession].collect()
    assert(mid.length == 1 && mid.head.nEvents == 2 && mid.head.durSec == 20,
      s"mid-batch split: ${mid.mkString(";")}")
    // close the second session via the watermark
    input.addData(Seq(rec("zz", 600)))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("ss_split_out").as[ClosedSession].collect()
      .filter(_.key == "u").sortBy(_.startMs)
    assert(all.length == 2)
    assert(all(1).nEvents == 2 && all(1).startMs == base + 140 * 1000
      && all(1).durSec == 10, s"second session: ${all(1)}")
  }
}
