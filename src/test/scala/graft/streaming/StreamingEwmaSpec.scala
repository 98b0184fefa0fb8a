package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** EwmaTracker: the streaming twin of the batch `win_ewma` operator.
  * Core claim is REPLAY PARITY at BITWISE precision — the recursion is
  * deterministic IEEE arithmetic applied in the same order with the
  * same literals on both sides, so streamed points equal the batch
  * arrays exactly, with the accumulator carried across micro-batch
  * boundaries.
  */
class StreamingEwmaSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("replay parity: streamed EWMA == batch win_ewma bitwise") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id")
      .limit(600).localCheckpoint()
    val dir = tmp("ewma-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("win_ewma")(spark, dir)
      .select(col("user_id"), col("event_id"), col("ewma"))
      .collect()
      .map(r => (r.getLong(0).toString, r.getLong(1)) -> r.getDouble(2)).toMap

    val input = MemoryStream[NumericRecord]
    val out = EwmaTracker(input.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .option("checkpointLocation", tmp("ckpt-ewma"))
      .outputMode("append")
      .start()
    val recs = evs.filter(col("value").isNotNull)
      .select(col("user_id").cast("string").as("key"),
        col("event_id").as("eventId"), col("value"), col("ts"))
      .as[NumericRecord].collect()
      .sortBy(r => (r.ts.getTime, r.eventId))
    // three micro-batches: the accumulator must bridge batches
    recs.grouped(200).foreach { g => input.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val streamed = spark.table("ewma_out").as[EwmaPoint].collect()
    assert(streamed.length === batch.size,
      s"${streamed.length} streamed points != ${batch.size} batch points")
    streamed.foreach { p =>
      val b = batch((p.key, p.eventId))
      assert(java.lang.Double.compare(b, p.ewma) == 0,
        s"key=${p.key} event=${p.eventId}: batch $b != streamed ${p.ewma}")
    }
  }

  test("null value / null ts skipped; first point seeds the accumulator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NumericRecord]
    val out = EwmaTracker(input.toDS())
      .writeStream.format("memory").queryName("ewma_null_out")
      .option("checkpointLocation", tmp("ckpt-ewma-null"))
      .outputMode("append")
      .start()
    def rec(id: Long, v: java.lang.Double, tsMs: java.lang.Long) =
      NumericRecord("u1", id, v,
        if (tsMs == null) null else new java.sql.Timestamp(tsMs))
    input.addData(Seq(
      rec(1L, 10.0, 1000L), rec(2L, null, 2000L), rec(3L, 99.0, null),
      rec(4L, 20.0, 3000L)))
    out.processAllAvailable()
    out.stop()
    val pts = spark.table("ewma_null_out").as[EwmaPoint].collect()
      .sortBy(_.eventId)
    assert(pts.map(_.eventId).toSeq === Seq(1L, 4L), "null rows must not emit")
    assert(pts(0).ewma === 10.0, "first point seeds acc = x0")
    // the exact IEEE expression with the batch literals (NOT 1 - alpha)
    assert(java.lang.Double.compare(pts(1).ewma, 0.3 * 20.0 + 0.7 * 10.0) == 0)
  }
}
