package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

/** Processor TIMERS (transformWithState event-time timers): sessions
  * close exactly once when the watermark passes last-event + gap; new
  * input re-arms the timer (so an active key never closes early), and
  * state clears on close so a returning key starts a fresh session. */
class SessionCloserSpec extends SparkSpec {

  private val base = Timestamp.valueOf("2026-01-01 10:00:00").getTime
  private def rec(k: String, offSec: Long) =
    KeyedRecord(k, "v", "t", 0, new Timestamp(base + offSec * 1000))

  test("event-time timers close inactive sessions once, re-arm on activity") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    val out = SessionCloser(
      in.toDS().withWatermark("ts", "0 seconds"), gapMs = 60 * 1000)
    val q = out.toDF()
      .writeStream.format("memory").queryName("sessions")
      .option("checkpointLocation", Files.createTempDirectory("ck-sess").toString)
      .outputMode("append").start()

    // k1: two events; k2: one event
    in.addData(Seq(rec("k1", 0), rec("k1", 30), rec("k2", 10)))
    q.processAllAvailable()
    // k1 stays active at 10:02 (re-arms its timer past the old expiry);
    // the advancing watermark closes k2 (armed at 10:01:10)
    in.addData(Seq(rec("k1", 120)))
    q.processAllAvailable()
    // push the watermark far past k1's re-armed expiry (10:03:00)
    in.addData(Seq(rec("k9", 600)))
    q.processAllAvailable()
    in.addData(Seq(rec("k9", 1200)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions").as[SessionSummary].collect()
      .filter(r => r.key == "k1" || r.key == "k2")
    assert(rows.length == 2, s"each session must close exactly once: ${rows.mkString(";")}")
    val byKey = rows.map(r => r.key -> r).toMap
    assert(byKey("k2").nEvents == 1)
    assert(byKey("k2").closedAtMs == base + 10 * 1000 + 60 * 1000) // last event + gap
    // k1's batch-2 activity re-armed the timer: 3 events in ONE session,
    // closed at 10:02:00 + gap — not at the first batch's 10:00:30 + gap
    assert(byKey("k1").nEvents == 3, s"re-arm failed, session split: ${byKey("k1")}")
    assert(byKey("k1").closedAtMs == base + 120 * 1000 + 60 * 1000)
  }

  test("a returning key starts a fresh session after its close") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    val out = SessionCloser(
      in.toDS().withWatermark("ts", "0 seconds"), gapMs = 60 * 1000)
    val q = out.toDF()
      .writeStream.format("memory").queryName("sessions2")
      .option("checkpointLocation", Files.createTempDirectory("ck-sess2").toString)
      .outputMode("append").start()
    in.addData(Seq(rec("a", 0)))
    q.processAllAvailable()
    in.addData(Seq(rec("zz", 300))) // watermark -> 10:05, closes a's session
    q.processAllAvailable()
    in.addData(Seq(rec("a", 400), rec("a", 410))) // a returns
    q.processAllAvailable()
    in.addData(Seq(rec("zz", 900))) // watermark -> 10:15, closes a's 2nd session
    q.processAllAvailable()
    q.stop()
    val a = spark.table("sessions2").as[SessionSummary].collect()
      .filter(_.key == "a").sortBy(_.closedAtMs)
    assert(a.length == 2, s"expected two separate sessions: ${a.mkString(";")}")
    assert(a(0).nEvents == 1 && a(1).nEvents == 2, a.mkString(";"))
  }
}
