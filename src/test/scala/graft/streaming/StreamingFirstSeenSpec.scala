package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** FirstSeenTracker: the streaming twin of the batch
  * `evt_cumulative_users` operator. Core claim is REPLAY PARITY — the
  * day-grouped first-seen counts from a time-ordered replay equal the
  * batch MIN(ts)-per-user series — with state bridging micro-batches
  * (a user whose first event is in batch 1 must emit nothing in
  * batches 2 and 3).
  */
class StreamingFirstSeenSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("replay parity: streamed first-seen day counts == batch evt_cumulative_users") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id").limit(600)
      .localCheckpoint()
    val dir = tmp("fs-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("evt_cumulative_users")(spark, dir)
      .collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap

    val input = MemoryStream[KeyedRecord]
    val out = FirstSeenTracker(input.toDS())
      .writeStream.format("memory").queryName("fs_out")
      .option("checkpointLocation", tmp("ckpt-fs"))
      .outputMode("append")
      .start()
    val recs = evs.select(
        col("user_id").cast("string").as("key"),
        col("event_type").as("value"),
        lit("events").as("topic"), lit(0).as("partition"), col("ts"))
      .as[KeyedRecord].collect()
      .sortBy(r => (r.ts.getTime, r.value))
    // three micro-batches: first-seen state must bridge batches
    recs.grouped(200).foreach { g => input.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val streamed = spark.table("fs_out").as[FirstSeen].collect()
    // exactly one emission per distinct key
    assert(streamed.map(_.key).distinct.length == streamed.length)
    assert(streamed.length == recs.map(_.key).distinct.length)
    // per-day new-user counts match the batch series (UTC days)
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val dayCounts = streamed
      .groupBy(f => java.time.Instant.ofEpochMilli(f.tsMillis)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.format(fmt))
      .view.mapValues(_.length.toLong).toMap
    assert(dayCounts === batch.view.mapValues(_._1).toMap,
      s"streamed $dayCounts != batch ${batch.view.mapValues(_._1).toMap}")
    // cumulative series consistency on the batch side itself
    val days = batch.keys.toSeq.sorted
    val running = days.scanLeft(0L)((acc, d) => acc + batch(d)._1).drop(1)
    days.zip(running).foreach { case (d, cum) => assert(batch(d)._2 == cum) }
  }

  test("late re-appearance and null-ts records emit nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRecord]
    val out = FirstSeenTracker(input.toDS())
      .writeStream.format("memory").queryName("fs_null_out")
      .option("checkpointLocation", tmp("ckpt-fs-null"))
      .outputMode("append")
      .start()
    def rec(k: String, v: String, tsMs: java.lang.Long) = KeyedRecord(k, v,
      "events", 0, if (tsMs == null) null else new java.sql.Timestamp(tsMs))
    input.addData(Seq(rec("u1", "broken", null)))
    out.processAllAvailable()
    input.addData(Seq(rec("u1", "view", 5000L), rec("u1", "click", 1000L)))
    out.processAllAvailable()
    input.addData(Seq(rec("u1", "late", 500L), rec("u2", "view", 9000L)))
    out.processAllAvailable()
    out.stop()
    val got = spark.table("fs_null_out").as[FirstSeen].collect()
      .map(f => f.key -> f.tsMillis).toMap
    // u1: the null-ts record did NOT count as first-seen; the in-batch
    // sort makes 1000 (not 5000) the recorded time; the later 500 is
    // absorbed (first OBSERVED wins — documented policy)
    assert(got === Map("u1" -> 1000L, "u2" -> 9000L))
  }
}
