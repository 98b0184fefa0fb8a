package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** PathTracker: the streaming twin of the batch `evt_top_paths`
  * operator. Core claim is REPLAY PARITY — grouping each key's final
  * emitted journey and counting paths reproduces the batch first-5
  * report exactly, with the bounded (path, n) state carried across
  * micro-batch boundaries and frozen at 5 steps.
  */
class StreamingPathSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("replay parity: final streamed journeys == batch evt_top_paths") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id")
      .limit(600).localCheckpoint()
    val dir = tmp("path-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("evt_top_paths")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val input = MemoryStream[OrderedRecord]
    val out = PathTracker(input.toDS())
      .writeStream.format("memory").queryName("path_out")
      .option("checkpointLocation", tmp("ckpt-path"))
      .outputMode("append")
      .start()
    val recs = evs.select(col("user_id").cast("string").as("key"),
        col("event_id").as("eventId"), col("event_type").as("value"),
        col("ts"))
      .as[OrderedRecord].collect()
      .sortBy(r => (r.ts.getTime, r.eventId))
    // three micro-batches: journeys must grow across batch boundaries
    recs.grouped(200).foreach { g => input.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val streamed = spark.table("path_out").as[PathPoint].collect()
    val finalPaths = streamed.groupBy(_.key).view
      .mapValues(ps => ps.maxBy(_.n).path).values
    val counts = finalPaths.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(counts === batch,
      s"streamed journeys != batch: ${counts.toSeq.sorted.take(5)} vs ${batch.toSeq.sorted.take(5)}")
    // no journey ever exceeds 5 steps, even for users with more events
    assert(streamed.forall(_.n <= 5))
    val withMore = recs.groupBy(_.key).filter(_._2.length > 5)
    assert(withMore.nonEmpty, "fixture should have users with > 5 events")
  }

  test("journey freezes at 5 steps; null records skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[OrderedRecord]
    val out = PathTracker(input.toDS())
      .writeStream.format("memory").queryName("path_null_out")
      .option("checkpointLocation", tmp("ckpt-path-null"))
      .outputMode("append")
      .start()
    def rec(id: Long, v: String, tsMs: java.lang.Long) =
      OrderedRecord("u1", id, v,
        if (tsMs == null) null else new java.sql.Timestamp(tsMs))
    input.addData((1 to 7).map(i => rec(i.toLong, s"e$i", i * 1000L))
      :+ rec(8L, null, 9000L) :+ rec(9L, "late", null))
    out.processAllAvailable()
    out.stop()
    val pts = spark.table("path_null_out").as[PathPoint].collect().sortBy(_.n)
    assert(pts.length === 5, "exactly five emissions, then frozen")
    assert(pts.last.path === "e1>e2>e3>e4>e5")
  }
}
