package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** TransitionTracker: the streaming twin of the batch
  * `evt_transition_matrix` operator. Core claim is REPLAY PARITY —
  * streaming a bounded event set and counting (prev, next) steps yields
  * exactly the batch lag-window matrix — with state carried across
  * micro-batch boundaries.
  */
class StreamingTransitionSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("replay parity: streamed transition counts == batch matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id").limit(600)
      .localCheckpoint()
    val dir = tmp("trans-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("evt_transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val input = MemoryStream[KeyedRecord]
    val out = TransitionTracker(input.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .option("checkpointLocation", tmp("ckpt-trans"))
      .outputMode("append")
      .start()
    val recs = evs.select(
        col("user_id").cast("string").as("key"),
        col("event_type").as("value"),
        lit("events").as("topic"), lit(0).as("partition"), col("ts"))
      .as[KeyedRecord].collect()
      .sortBy(r => (r.ts.getTime, r.value))
    // three micro-batches: the stored last-event must bridge batches
    recs.grouped(200).foreach { g => input.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val streamed = spark.table("trans_out").as[TransitionStep].collect()
    val counts = streamed.groupBy(t => (t.prevType, t.nextType))
      .view.mapValues(_.length.toLong).toMap
    assert(counts === batch,
      s"streamed matrix ${counts.toSeq.sorted} != batch ${batch.toSeq.sorted}")
    // per-key step count = events(key) - 1 (every record after the
    // first emits exactly one step)
    val perKey = recs.groupBy(_.key).view.mapValues(_.length).toMap
    streamed.groupBy(_.key).foreach { case (k, ts) =>
      assert(ts.length == perKey(k) - 1, s"key=$k emitted ${ts.length}")
    }
  }

  test("null-ts and tombstone records are skipped, state undisturbed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRecord]
    val out = TransitionTracker(input.toDS())
      .writeStream.format("memory").queryName("trans_null_out")
      .option("checkpointLocation", tmp("ckpt-trans-null"))
      .outputMode("append")
      .start()
    def rec(v: String, tsMs: java.lang.Long) = KeyedRecord("u1", v,
      "events", 0, if (tsMs == null) null else new java.sql.Timestamp(tsMs))
    input.addData(Seq(
      rec("view", 1000L), rec("broken", null), rec(null, 2000L),
      rec("click", 3000L)))
    out.processAllAvailable(); out.stop()
    val steps = spark.table("trans_null_out").as[TransitionStep].collect()
    // view -> click only: the null-ts and tombstone records neither
    // emit a step nor become the stored last event
    assert(steps.toSeq.map(t => (t.prevType, t.nextType)) ===
      Seq(("view", "click")))
  }
}
