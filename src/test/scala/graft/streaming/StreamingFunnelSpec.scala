package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** FunnelTracker: the streaming twin of the batch `evt_funnel` operator.
  * The core claim is REPLAY PARITY — streaming a bounded event set
  * through the state machine yields exactly the batch query's step
  * counts — plus the strict-order rules the fixture can't isolate.
  */
class StreamingFunnelSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rec(key: String, v: String, tsMs: Long) =
    KeyedRecord(key, v, "events", 0, new java.sql.Timestamp(tsMs))

  test("replay parity: streamed funnel counts == batch evt_funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a 600-event slice of the fixture, written where the batch query
    // can read it so both sides see the identical input
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id").limit(600)
      .localCheckpoint()
    val dir = tmp("funnel-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("evt_funnel")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

    val input = MemoryStream[KeyedRecord]
    val out = FunnelTracker(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .option("checkpointLocation", tmp("ckpt-funnel"))
      .outputMode("append")
      .start()
    val recs = evs.select(
        col("user_id").cast("string").as("key"),
        col("event_type").as("value"),
        lit("events").as("topic"), lit(0).as("partition"), col("ts"))
      .as[KeyedRecord].collect()
      .sortBy(r => (r.ts.getTime, r.value))
    // three micro-batches: funnel state must carry across batches
    recs.grouped(200).foreach { g => input.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val streamed = spark.table("funnel_out").as[FunnelAdvance].collect()
    val countsByStep = streamed.groupBy(_.step).view.mapValues(_.length.toLong).toMap
    (1 to 3).foreach { s =>
      assert(countsByStep.getOrElse(s, 0L) == batch.getOrElse(s, 0L),
        s"step $s: streamed=${countsByStep.get(s)} batch=${batch.get(s)}")
    }
    // each key advances monotonically: step k emitted at most once
    streamed.groupBy(_.key).foreach { case (k, adv) =>
      val ss = adv.map(_.step).sorted.toSeq
      assert(ss == (1 to ss.length), s"key=$k non-monotone advances: $ss")
    }
  }

  test("strict order: wrong-order and equal-timestamp steps do not advance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRecord]
    val out = FunnelTracker(input.toDS())
      .writeStream.format("memory").queryName("funnel_strict")
      .option("checkpointLocation", tmp("ckpt-funnel-s"))
      .outputMode("append")
      .start()
    input.addData(Seq(
      // u1: full funnel in order
      rec("u1", "view", 1000), rec("u1", "click", 2000), rec("u1", "purchase", 3000),
      // u2: purchase BEFORE click -> stops at step 2
      rec("u2", "view", 1000), rec("u2", "purchase", 2000), rec("u2", "click", 3000),
      // u3: click at the SAME ts as view -> strict > blocks step 2
      rec("u3", "view", 1000), rec("u3", "click", 1000)))
    out.processAllAvailable()
    out.stop()
    val got = spark.table("funnel_strict").as[FunnelAdvance].collect()
      .groupBy(_.key).view.mapValues(_.map(_.step).max).toMap
    assert(got == Map("u1" -> 3, "u2" -> 2, "u3" -> 1), got.toString)
  }
}
