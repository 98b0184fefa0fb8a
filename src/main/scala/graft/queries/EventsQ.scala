package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Event/product analytics over the events stream: ordered funnels and
  * cohort retention — the two queries every telemetry pipeline serves
  * (and the batch twins of the streaming sessionization family).
  *
  * Scale shape: both operators only ever shuffle on `user_id` (funnel)
  * or on the week-truncated keys (retention counts). Per-user state is a
  * handful of timestamps; no windows over the full stream, no driver
  * state. At 100 TB user-count grows with the data so the user_id
  * shuffle stays balanced; the step joins are node-sized frames (users
  * who reached step k-1), always smaller than the raw event scan.
  *
  * Reference precedent: samsa's README pitches change detection over a
  * user event stream (README.md:27-52); funnels/retention are the batch
  * analytics the same stream feeds.
  */
object EventsQ {

  val all: Seq[QueryDef] = Seq(

    // Strictly-ordered 3-step funnel (view -> click -> purchase): a user
    // counts at step k only with an event AFTER their earliest step-k-1
    // completion. One min-aggregate per step over a semi-joined slice;
    // every shuffle keyed by user_id.
    QueryDef(
      "evt_funnel",
      """WITH u1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |u2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN u1 ON e.user_id = u1.user_id AND e.ts > u1.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |u3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN u2 ON e.user_id = u2.user_id AND e.ts > u2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_users FROM u1
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', CAST(COUNT(*) AS BIGINT) FROM u2
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', CAST(COUNT(*) AS BIGINT)
        |FROM u3""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("user_id", "event_type", "ts")
      def firstAfter(step: String, prev: org.apache.spark.sql.DataFrame,
          prevT: String, outT: String) =
        e.filter(col("event_type") === step)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(prevT))
          .groupBy("user_id").agg(min("ts").as(outT))
      val u1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val u2 = firstAfter("click", u1.select("user_id", "t1"), "t1", "t2")
      val u3 = firstAfter("purchase", u2.select("user_id", "t2"), "t2", "t3")
      def stepRow(n: Int, name: String,
          df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).cast("long").as("n_users"))
          .select(lit(n).cast("int").as("step"),
            lit(name).as("event_type"), col("n_users"))
      stepRow(1, "view", u1)
        .unionAll(stepRow(2, "click", u2))
        .unionAll(stepRow(3, "purchase", u3))
    },

    // The funnel with a CONVERSION WINDOW: step k counts only within 24h
    // of the step-k-1 completion (the form product analytics actually
    // ships — unbounded funnels overcount). Same join shape; the window
    // bound is exact timestamp arithmetic on both engines.
    QueryDef(
      "evt_funnel_windowed",
      """WITH u1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |u2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN u1 ON e.user_id = u1.user_id
        |    AND e.ts > u1.t1 AND e.ts <= u1.t1 + INTERVAL 24 HOUR
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |u3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN u2 ON e.user_id = u2.user_id
        |    AND e.ts > u2.t2 AND e.ts <= u2.t2 + INTERVAL 24 HOUR
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_users FROM u1
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', CAST(COUNT(*) AS BIGINT) FROM u2
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', CAST(COUNT(*) AS BIGINT)
        |FROM u3""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("user_id", "event_type", "ts")
      val win = expr("INTERVAL 24 HOURS")
      def within(step: String, prev: org.apache.spark.sql.DataFrame,
          prevT: String, outT: String) =
        e.filter(col("event_type") === step)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(prevT) && col("ts") <= col(prevT) + win)
          .groupBy("user_id").agg(min("ts").as(outT))
      val u1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val u2 = within("click", u1.select("user_id", "t1"), "t1", "t2")
      val u3 = within("purchase", u2.select("user_id", "t2"), "t2", "t3")
      def stepRow(n: Int, name: String,
          df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).cast("long").as("n_users"))
          .select(lit(n).cast("int").as("step"),
            lit(name).as("event_type"), col("n_users"))
      stepRow(1, "view", u1)
        .unionAll(stepRow(2, "click", u2))
        .unionAll(stepRow(3, "purchase", u3))
    },

    // Weekly cohort retention: users grouped by the ISO week of their
    // first event; one cell per (cohort_week, week_offset) counting the
    // distinct users of that cohort active in that week. Week-truncated
    // keys divide exactly (both engines truncate to Monday), so the
    // offset is an exact integer — no interpolation or TZ seam.
    QueryDef(
      "evt_retention_cohort",
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        |SELECT f.cohort_week,
        |       CAST(date_diff('day', f.cohort_week, a.w) / 7 AS INT)
        |         AS week_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM f JOIN a ON a.user_id = f.user_id
        |GROUP BY f.cohort_week, week_offset""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("user_id", "ts")
      // DuckDB's date_trunc('week', ts) yields DATE; mirror that exactly
      // (the driver's hash is type-sensitive — the r8 HUGEINT lesson)
      val f = e.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).cast("date").as("cohort_week"))
      val a = e.select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("w"))
        .distinct()
      f.join(a, "user_id")
        .select(col("cohort_week"),
          (datediff(col("w"), col("cohort_week")) / 7).cast("int")
            .as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).cast("long").as("n_users"))
    }
  )
}
