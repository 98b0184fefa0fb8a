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

  private def tsm(day: Int, hour: Int, min: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$min%02d:00")

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

  test("evt_stickiness: WAU is the trailing 7-day distinct-user union") {
    // day 1: u1+u2 active (dau 2, wau 2); day 3: u2 only, but u1's day-1
    // activity is inside the trailing window (wau 2, stickiness 0.5);
    // day 10: u1 only, day-3 activity has aged out (wau 1, stickiness 1)
    val dir = writeEvents(Seq(
      (1L, "view", ts(1)), (2L, "view", ts(1)),
      (2L, "view", ts(3)),
      (1L, "view", ts(10))))
    val out = graft.SparkEntry.queries("evt_stickiness")(spark, dir)
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      "2024-01-01" -> ((2L, 2L, 1.0)),
      "2024-01-03" -> ((1L, 2L, 0.5)),
      "2024-01-10" -> ((1L, 1L, 1.0))))
  }

  test("evt_rfm_segments: quintile scores and segment cut-offs") {
    // user i: i events on day i, value 1.0 each -> recency, frequency,
    // and monetary all order 1 < 2 < ... < 5, so scores are (i, i, i)
    // and totals 3i hit every segment boundary
    val dir = writeEvents((1 to 5).flatMap(i =>
      (0 until i).map(j => (i.toLong, "view", ts(i, j)))))
    val out = graft.SparkEntry.queries("evt_rfm_segments")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    (1 to 5).foreach(i =>
      assert(out(i.toLong)._1 == i && out(i.toLong)._2 == i
        && out(i.toLong)._3 == i, s"user $i scores: ${out(i.toLong)}"))
    assert(out(1L)._4 === "at_risk")   // total 3
    assert(out(2L)._4 === "regular")   // total 6
    assert(out(3L)._4 === "regular")   // total 9
    assert(out(4L)._4 === "loyal")     // total 12
    assert(out(5L)._4 === "champion")  // total 15
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

  test("evt_cumulative_users: counts first-seen days, monotone to-date total") {
    // u1 first on day 1 (re-appears day 5 — must not recount),
    // u2 on day 2, u3 on day 2, u4 on day 7
    val dir = writeEvents(Seq(
      (1L, "view", ts(1)), (1L, "view", ts(5)),
      (2L, "view", ts(2)), (3L, "click", ts(2)),
      (4L, "view", ts(7))))
    val out = graft.SparkEntry.queries("evt_cumulative_users")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 1L, 1L), ("2024-01-02", 2L, 3L), ("2024-01-07", 1L, 4L)))
  }

  test("evt_transition_matrix: per-user ordered pairs, rows normalize to 1") {
    // u1: view->click->view ; u2: view->click — transitions:
    // view->click ×2, click->view ×1. No cross-user transition.
    val dir = writeEvents(Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "view", ts(3)),
      (2L, "view", ts(5)), (2L, "click", ts(6))))
    val out = graft.SparkEntry.queries("evt_transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      ("view", "click") -> ((2L, 1.0)),
      ("click", "view") -> ((1L, 1.0))))
    // probabilities per prev_type row sum to 1 on real data too
    val p = graft.SparkEntry.queries("evt_transition_matrix")(spark, sf())
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(3)).sum)
    p.foreach { case (prev, s) =>
      assert(math.abs(s - 1.0) < 1e-9, s"row $prev sums to $s") }
  }

  test("evt_session_stats: 30-minute gap splits sessions, durations floor-exact") {
    // u1: events at 10:00, 10:10 (one session, 600 s) then 11:00
    // (gap 50 min -> new single-event session, 0 s)
    val dir = writeEvents(Seq(
      (1L, "view", ts(1, 10)), (1L, "click", tsm(1, 10, 10)),
      (1L, "view", ts(1, 11))))
    val out = graft.SparkEntry.queries("evt_session_stats")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((2L, 3L, 2L, 600L)))
  }
}
