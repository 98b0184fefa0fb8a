package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** SURVEY §2.3 "Streaming" family: watermarks, tumbling/sliding/session
  * windows, watermarked dedup, stream-stream and stream-static joins —
  * driven on MemoryStreams with event-time control.
  */
case class Ev(ts: Timestamp, user: String, value: Double)
case class Click(ts: Timestamp, user: String)
case class Buy(ts: Timestamp, user: String, amt: Double)

class StreamingWindowsSpec extends SparkSpec {

  private def ckpt(p: String) = Files.createTempDirectory(p).toString
  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)

  test("tumbling window agg with watermark drops late data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = in.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("window.start").as("ws"), col("user"), col("n"), col("sv"))
      .writeStream.format("memory").queryName("tumble")
      .option("checkpointLocation", ckpt("ck-tumble"))
      .outputMode("append").start()

    in.addData(Ev(ts(1), "u1", 1.0), Ev(ts(3), "u1", 2.0), Ev(ts(7), "u1", 4.0))
    q.processAllAvailable()
    // advance watermark far past window [0,5): emits it
    in.addData(Ev(ts(30), "u2", 8.0))
    q.processAllAvailable()
    // LATE: event at minute 2 arrives after watermark passed — dropped
    in.addData(Ev(ts(2), "u1", 100.0))
    q.processAllAvailable()
    in.addData(Ev(ts(60), "u2", 16.0)) // push watermark to close [5,10) & [30,35)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tumble").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getDouble(3)))
    // [0,5) u1: the two on-time events only — late 100.0 excluded
    assert(rows.contains((0L, "u1", 2L, 3.0)), rows.mkString(";"))
    assert(rows.contains((5L, "u1", 1L, 4.0)))
    assert(rows.contains((30L, "u2", 1L, 8.0)))
    assert(!rows.exists(_._4 >= 100.0), "late event leaked into a window")
  }

  test("sliding window: event lands in overlapping windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = in.toDS()
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .writeStream.format("memory").queryName("slide")
      .option("checkpointLocation", ckpt("ck-slide"))
      .outputMode("append").start()
    in.addData(Ev(ts(7), "u", 1.0)); q.processAllAvailable()
    in.addData(Ev(ts(60), "u", 1.0)); q.processAllAvailable()
    q.stop()
    val starts = spark.table("slide").collect()
      .map(r => r.getTimestamp(0).getTime / 60000).sorted.toSeq
    assert(starts.contains(0L) && starts.contains(5L), s"minute-7 event should be in [0,10) and [5,15): $starts")
  }

  test("session window merges events within gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = in.toDS()
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"), col("session_window.end").as("se"),
        col("user"), col("n"))
      .writeStream.format("memory").queryName("sess")
      .option("checkpointLocation", ckpt("ck-sess"))
      .outputMode("append").start()
    // one session: 1,4,8 (gaps < 5m); separate session at 20
    in.addData(Ev(ts(1), "u1", 1), Ev(ts(4), "u1", 1), Ev(ts(8), "u1", 1), Ev(ts(20), "u1", 1))
    q.processAllAvailable()
    in.addData(Ev(ts(60), "u2", 1)) // advance watermark to close sessions
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess").collect()
      .filter(_.getString(2) == "u1")
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(3))).sortBy(_._1).toSeq
    assert(sessions == Seq((1L, 3L), (20L, 1L)), sessions.mkString(";"))
  }

  test("dropDuplicatesWithinWatermark dedups keyed events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    case class KEv(id: Long, ts: Timestamp)
    val in = MemoryStream[Ev]
    val q = in.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user")
      .writeStream.format("memory").queryName("dedup")
      .option("checkpointLocation", ckpt("ck-dedup"))
      .outputMode("append").start()
    in.addData(Ev(ts(1), "a", 1), Ev(ts(2), "a", 2), Ev(ts(3), "b", 3))
    q.processAllAvailable()
    in.addData(Ev(ts(4), "a", 4))
    q.processAllAvailable()
    q.stop()
    val users = spark.table("dedup").collect().map(_.getString(1)).toSeq.sorted
    assert(users == Seq("a", "b"), users.mkString(","))
  }

  test("stream-stream inner join within watermark bounds") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = clicks.toDS()
      .withWatermark("ts", "10 minutes").as("c")
      .join(
        buys.toDS().withWatermark("ts", "10 minutes").as("b"),
        expr("c.user = b.user AND b.ts BETWEEN c.ts AND c.ts + INTERVAL 15 minutes"))
      .select(col("c.user").as("user"), col("c.ts").as("click_ts"), col("b.amt"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .option("checkpointLocation", ckpt("ck-ssj"))
      .outputMode("append").start()
    clicks.addData(Click(ts(1), "u1"), Click(ts(2), "u2"))
    buys.addData(Buy(ts(5), "u1", 9.99))    // within 15m of u1's click
    buys.addData(Buy(ts(40), "u2", 5.0))    // outside u2's click window
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj").collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(rows == Seq(("u1", 9.99)), rows.mkString(";"))
  }

  test("stream-stream LEFT OUTER join emits unmatched left rows after watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = clicks.toDS()
      .withWatermark("ts", "10 minutes").as("c")
      .join(
        buys.toDS().withWatermark("ts", "10 minutes").as("b"),
        expr("c.user = b.user AND b.ts BETWEEN c.ts AND c.ts + INTERVAL 15 minutes"),
        "leftOuter")
      .select(col("c.user").as("user"), col("b.amt"))
    val q = joined.writeStream.format("memory").queryName("ssj_left")
      .option("checkpointLocation", ckpt("ck-ssj-left"))
      .outputMode("append").start()
    clicks.addData(Click(ts(1), "u1"), Click(ts(2), "u2"))
    buys.addData(Buy(ts(5), "u1", 9.99)) // matches u1; u2 never matches
    q.processAllAvailable()
    // advance both watermarks far past u2's join window so the engine
    // can declare the match impossible and emit the null-padded row
    clicks.addData(Click(ts(240), "u9"))
    buys.addData(Buy(ts(240), "u9", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_left").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(rows.contains(("u1", Some(9.99))), rows.mkString(";"))
    assert(rows.contains(("u2", None)),
      s"unmatched left row for u2 must surface null-padded after watermark: ${rows.mkString(";")}")
  }

  test("stream-stream RIGHT OUTER join emits unmatched right rows after watermark") {
    // closes the §2.3 streaming-join matrix (VERDICT r8 item 6): the
    // time-interval condition bounds both state stores, so the engine
    // can declare a right row unmatchable once the left watermark passes
    // its join window and emit it null-padded on the left side
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = clicks.toDS()
      .withWatermark("ts", "10 minutes").as("c")
      .join(
        buys.toDS().withWatermark("ts", "10 minutes").as("b"),
        expr("c.user = b.user AND b.ts BETWEEN c.ts AND c.ts + INTERVAL 15 minutes"),
        "rightOuter")
      .select(col("c.user").as("click_user"), col("b.user").as("buy_user"), col("b.amt"))
    val q = joined.writeStream.format("memory").queryName("ssj_right")
      .option("checkpointLocation", ckpt("ck-ssj-right"))
      .outputMode("append").start()
    clicks.addData(Click(ts(1), "u1"))
    buys.addData(Buy(ts(5), "u1", 9.99))  // matches u1's click
    buys.addData(Buy(ts(6), "u2", 5.0))   // no u2 click ever arrives
    q.processAllAvailable()
    // push both watermarks far past u2's buy so the match is impossible
    clicks.addData(Click(ts(240), "u9"))
    buys.addData(Buy(ts(240), "u9", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_right").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getString(0)),
        r.getString(1), r.getDouble(2))).toSet
    assert(rows.contains((Some("u1"), "u1", 9.99)), rows.mkString(";"))
    assert(rows.contains((None, "u2", 5.0)),
      s"unmatched right row for u2 must surface null-padded after watermark: ${rows.mkString(";")}")
  }

  test("stream-stream FULL OUTER join emits both unmatched sides after watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = clicks.toDS()
      .withWatermark("ts", "10 minutes").as("c")
      .join(
        buys.toDS().withWatermark("ts", "10 minutes").as("b"),
        expr("c.user = b.user AND b.ts BETWEEN c.ts AND c.ts + INTERVAL 15 minutes"),
        "fullOuter")
      .select(col("c.user").as("click_user"), col("b.user").as("buy_user"), col("b.amt"))
    val q = joined.writeStream.format("memory").queryName("ssj_full")
      .option("checkpointLocation", ckpt("ck-ssj-full"))
      .outputMode("append").start()
    clicks.addData(Click(ts(1), "u1"), Click(ts(2), "u2")) // u2 never buys
    buys.addData(Buy(ts(5), "u1", 9.99))                   // matches u1
    buys.addData(Buy(ts(6), "u3", 7.5))                    // u3 never clicks
    q.processAllAvailable()
    clicks.addData(Click(ts(240), "u9"))
    buys.addData(Buy(ts(240), "u9", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_full").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows.contains((Some("u1"), Some("u1"), Some(9.99))), rows.mkString(";"))
    assert(rows.contains((Some("u2"), None, None)),
      s"unmatched LEFT row (u2 click) missing: ${rows.mkString(";")}")
    assert(rows.contains((None, Some("u3"), Some(7.5))),
      s"unmatched RIGHT row (u3 buy) missing: ${rows.mkString(";")}")
  }

  test("watermark is monotonic: out-of-order (older) data cannot move it back") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = in.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "5 minutes")).agg(count(lit(1)).as("n"))
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt("ck-wm"))
      .outputMode("append").start()

    def wm(): String = {
      val p = q.lastProgress
      if (p == null) "" else Option(p.eventTime.get("watermark")).getOrElse("")
    }
    in.addData(Ev(ts(60), "u", 1)); q.processAllAvailable()
    in.addData(Ev(ts(61), "u", 1)); q.processAllAvailable() // advance past batch 1
    val wmHigh = wm()
    in.addData(Ev(ts(1), "u", 1)); q.processAllAvailable()  // ancient event
    in.addData(Ev(ts(2), "u", 1)); q.processAllAvailable()
    val wmAfter = wm()
    q.stop()
    assert(wmHigh.nonEmpty)
    assert(wmAfter >= wmHigh, s"watermark regressed: $wmHigh -> $wmAfter")
  }

  test("stream-static join enriches stream against batch table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val static = Seq(("u1", "gold"), ("u2", "basic")).toDF("user", "tier")
    val in = MemoryStream[Ev]
    val q = in.toDS().join(static, "user")
      .writeStream.format("memory").queryName("stj")
      .option("checkpointLocation", ckpt("ck-stj"))
      .outputMode("append").start()
    in.addData(Ev(ts(1), "u1", 1), Ev(ts(2), "u3", 2))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("stj").collect().map(r => (r.getString(0), r.getString(3))).toSeq
    assert(rows == Seq(("u1", "gold")), rows.mkString(";")) // u3 has no static match
  }

  test("streaming heavy hitters: mergeable approx_top_k sketch in a windowed agg") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the 100 TB streaming report shape: per-window top-k via a
    // MERGEABLE sketch aggregate — partials fold across micro-batches
    // and partitions without keeping the full histogram in state
    val in = MemoryStream[Ev]
    val q = in.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(expr("approx_top_k(user, 2)").as("top"))
      .select(col("window.start").as("ws"), to_json(col("top")).as("top"))
      .writeStream.format("memory").queryName("hh")
      .option("checkpointLocation", ckpt("ck-hh"))
      .outputMode("append").start()

    // u1 x3 and u2 x2 in window [0,5), split ACROSS micro-batches so the
    // sketch must merge state, plus a singleton u3
    in.addData(Ev(ts(1), "u1", 1), Ev(ts(2), "u2", 1), Ev(ts(3), "u1", 1))
    q.processAllAvailable()
    in.addData(Ev(ts(4), "u1", 1), Ev(ts(4), "u2", 1), Ev(ts(4), "u3", 1))
    q.processAllAvailable()
    in.addData(Ev(ts(30), "u9", 1)) // advance watermark: close [0,5)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("hh").collect()
      .map(r => r.getTimestamp(0).getTime / 60000 -> r.getString(1)).toMap
    val top = rows(0L)
    assert(top.contains(""""item":"u1","count":3"""), s"window [0,5) top: $top")
    assert(top.contains(""""item":"u2","count":2"""), s"window [0,5) top: $top")
    assert(!top.contains("u3"), s"k=2 must exclude the singleton: $top")
  }
}
