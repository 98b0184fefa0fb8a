package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral checks for the event-analytics family (the oracle
  * hash-match is the primary gate; these pin the ORDER semantics the
  * oracle fixture can't isolate: out-of-order steps must not count).
  */
class EventsSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, String, java.sql.Timestamp)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evt").toString
    rows.toDF("user_id", "event_type", "ts")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(day: Int, hour: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("evt_funnel: only strictly-ordered step sequences count") {
    // u1 completes view->click->purchase in order; u2 has all three but
    // purchase BEFORE click (counts through step 2 only); u3 views only.
    val dir = writeEvents(Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      (3L, "view", ts(5))))
    val out = graft.SparkEntry.queries("evt_funnel")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("evt_funnel_windowed: conversions beyond the 24h window don't count") {
    // u1 clicks 1h after view (inside window); u2 clicks 2 days after
    // view (outside) — the unbounded funnel would count both at step 2
    val dir = writeEvents(Seq(
      (1L, "view", ts(1)), (1L, "click", ts(1, 1)),
      (2L, "view", ts(1)), (2L, "click", ts(3))))
    val wq = graft.SparkEntry.queries("evt_funnel_windowed")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(wq === Map(1 -> 2L, 2 -> 1L, 3 -> 0L))
    val uq = graft.SparkEntry.queries("evt_funnel")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(uq(2) === 2L, "unbounded funnel counts the late click")
  }

  test("evt_retention_cohort: offsets count distinct active users") {
    // two users first-seen in week of Jan 1 (Mon); one returns two weeks
    // later twice in the same week (distinct!), the other never returns.
    val dir = writeEvents(Seq(
      (1L, "view", ts(2)), (1L, "view", ts(16)), (1L, "click", ts(17)),
      (2L, "view", ts(3))))
    val out = graft.SparkEntry.queries("evt_retention_cohort")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L))
  }
}
