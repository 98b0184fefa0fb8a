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

  test("replay parity at 4 steps: streamed == batch evt_funnel_4step") {
    // VERDICT r9 item 8: the builder and the tracker take the same
    // step list — parity must hold at a step count the old hard-coded
    // cascade never exercised
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "view", "click", "purchase")
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id").limit(800)
      .localCheckpoint()
    val dir = tmp("funnel4-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("evt_funnel_4step")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

    val input = MemoryStream[KeyedRecord]
    val out = FunnelTracker(input.toDS(), steps = steps)
      .writeStream.format("memory").queryName("funnel4_out")
      .option("checkpointLocation", tmp("ckpt-funnel4"))
      .outputMode("append")
      .start()
    val recs = evs.select(
        col("user_id").cast("string").as("key"),
        col("event_type").as("value"),
        lit("events").as("topic"), lit(0).as("partition"), col("ts"))
      .as[KeyedRecord].collect()
      .sortBy(r => (r.ts.getTime, r.value))
    recs.grouped(300).foreach { g => input.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val streamed = spark.table("funnel4_out").as[FunnelAdvance].collect()
    val countsByStep = streamed.groupBy(_.step).view.mapValues(_.length.toLong).toMap
    (1 to 4).foreach { s =>
      assert(countsByStep.getOrElse(s, 0L) == batch.getOrElse(s, 0L),
        s"step $s: streamed=${countsByStep.get(s)} batch=${batch.get(s)}")
    }
  }

  test("funnel stage survives stop + restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmp("ckpt-funnel-r")
    val outDir = tmp("out-funnel-r")
    def sink(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long): Unit =
      batch.toDF().withColumn("batch_id", lit(id))
        .write.mode("append").parquet(outDir)

    val firstHalf = Seq(rec("u1", "view", 1000), rec("u2", "view", 1000))
    // run 1: both users complete step 1, then the query stops
    val in1 = MemoryStream[KeyedRecord]
    val q1 = FunnelTracker(in1.toDS()).toDF()
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    in1.addData(firstHalf); q1.processAllAvailable(); q1.stop()

    // run 2: NEW query, SAME checkpoint (MemoryStream offsets are
    // checkpointed — re-provide batch 0, then the new events)
    val in2 = MemoryStream[KeyedRecord]
    in2.addData(firstHalf)
    val q2 = FunnelTracker(in2.toDS()).toDF()
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    in2.addData(Seq(
      rec("u1", "click", 2000), rec("u1", "purchase", 3000),
      rec("u2", "view", 2000),   // already past step 1 -> no advance
      rec("u3", "view", 2000)))  // fresh key -> step 1
    q2.processAllAvailable(); q2.stop()

    val out2 = spark.read.parquet(outDir)
      .filter(col("batch_id") >= 1).drop("batch_id")
      .as[FunnelAdvance].collect()
    val byKey = out2.groupBy(_.key).view.mapValues(_.map(_.step).sorted.toSeq).toMap
    // u1 resumes from restored stage 1: exactly steps 2 and 3, never a
    // repeated step 1 (that would mean the state store lost the stage)
    assert(byKey.get("u1").contains(Seq(2, 3)), byKey.toString)
    // u2's duplicate 'view' cannot re-advance a completed step
    assert(!byKey.contains("u2"), byKey.toString)
    assert(byKey.get("u3").contains(Seq(1)), byKey.toString)
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

  test("null-ts policy: null-ts records are skipped, never corrupt state") {
    // ADVICE r9: the documented divergence — a user whose only step-1
    // events carry a null event time never enters the stream funnel
    // (batch counts them at step 1 with t1 NULL); a null-ts record in
    // the middle of a real funnel is ignored, not a blocker
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def nullRec(key: String, v: String) =
      KeyedRecord(key, v, "events", 0, null)
    val input = MemoryStream[KeyedRecord]
    val out = FunnelTracker(input.toDS())
      .writeStream.format("memory").queryName("funnel_nullts")
      .option("checkpointLocation", tmp("ckpt-funnel-n"))
      .outputMode("append")
      .start()
    input.addData(Seq(
      // u1: only null-ts views -> never enters
      nullRec("u1", "view"), nullRec("u1", "view"),
      // u2: null-ts click between real view and real click -> the null
      // one is skipped, the real one still advances
      rec("u2", "view", 1000), nullRec("u2", "click"), rec("u2", "click", 2000),
      // u3: null-ts view then a real view -> enters on the real one
      nullRec("u3", "view"), rec("u3", "view", 1000)))
    out.processAllAvailable()
    out.stop()
    val got = spark.table("funnel_nullts").as[FunnelAdvance].collect()
      .groupBy(_.key).view.mapValues(_.map(_.step).sorted.toSeq).toMap
    assert(!got.contains("u1"), got.toString)
    assert(got.get("u2").contains(Seq(1, 2)), got.toString)
    assert(got.get("u3").contains(Seq(1)), got.toString)
  }
}
