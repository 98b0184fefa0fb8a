package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import graft.ext.Checkpoints.CutOps

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
    // every shuffle keyed by user_id. r10: the cascade (and its oracle
    // SQL) is generated from the step list by ext.Funnels — the same
    // Seq[String] the streaming FunnelTracker takes.
    QueryDef(
      "evt_funnel",
      graft.ext.Funnels.oracleSql(Seq("view", "click", "purchase"))) { (s, d) =>
      graft.ext.Funnels.report(Tables.events(s, d),
        Seq("view", "click", "purchase"))
    },

    // The funnel with a CONVERSION WINDOW: step k counts only within 24h
    // of the step-k-1 completion (the form product analytics actually
    // ships — unbounded funnels overcount). Same join shape; the window
    // bound is exact timestamp arithmetic on both engines.
    QueryDef(
      "evt_funnel_windowed",
      graft.ext.Funnels.oracleSql(Seq("view", "click", "purchase"),
        windowHours = Some(24))) { (s, d) =>
      graft.ext.Funnels.report(Tables.events(s, d),
        Seq("view", "click", "purchase"),
        window = Some(expr("INTERVAL 24 HOURS")))
    },

    // 4-step variant (VERDICT r9 item 8): signup -> view -> click ->
    // purchase, exercising the builder at a step count the r9 queries
    // hard-coded away. Same generated-oracle pairing; replay parity at
    // 4 steps is asserted against the streaming FunnelTracker in
    // StreamingFunnelSpec.
    QueryDef(
      "evt_funnel_4step",
      graft.ext.Funnels.oracleSql(
        Seq("signup", "view", "click", "purchase"))) { (s, d) =>
      graft.ext.Funnels.report(Tables.events(s, d),
        Seq("signup", "view", "click", "purchase"))
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
    },

    // Cumulative distinct users ("users to date"): the growth metric
    // every telemetry dashboard plots. The naive form windows a
    // COUNT(DISTINCT) over the full stream; the scale-safe identity is
    // cumulative_distinct(day) = |{users whose FIRST event <= day}| —
    // one min-aggregate per user, a per-day count, and a running sum
    // over the DAY SERIES (30 rows here, span-bounded always). Also
    // emits per-day new-user counts. No window ever touches raw data.
    QueryDef(
      "evt_cumulative_users",
      """WITH firstseen AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY user_id),
        |daily AS (
        |  SELECT day, COUNT(*) AS new_users FROM firstseen GROUP BY day)
        |SELECT day, CAST(new_users AS BIGINT) AS new_users,
        |       CAST(SUM(new_users) OVER (ORDER BY day
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS users_to_date
        |FROM daily ORDER BY day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy("user_id").agg(min(col("ts").cast("date")).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      // the running sum's window is over the aggregated day series —
      // |span days| rows — so the single partition is by construction
      // tiny, not a data-scale sink
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("day"), col("new_users").cast("long").as("new_users"),
          sum("new_users").over(w).cast("long").as("users_to_date"))
        .orderBy("day")
    },

    // Markov transition matrix over per-user event sequences: count
    // (prev_type -> next_type) steps and the outgoing-probability row
    // normalization — the path-discovery twin of the fixed-step funnel
    // (which transitions dominate tells you WHICH funnel to define).
    // Scale shape: one lag window partitioned by user_id (bounded
    // per-user groups, the funnel family's shuffle key), then the
    // count collapses to |event types|² rows — the probability window
    // runs on ~25 rows regardless of corpus size. p = n/Σn is an
    // exact-integer double division, identical IEEE on both engines.
    QueryDef(
      "evt_transition_matrix",
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |t AS (
        |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        |  FROM seq WHERE prev_type IS NOT NULL
        |  GROUP BY prev_type, event_type)
        |SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
        |       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
        |FROM t ORDER BY prev_type, next_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("prev_type"), col("next_type"),
          col("cnt").cast("long").as("n"),
          (col("cnt").cast("double") /
            sum(col("cnt")).over(Window.partitionBy("prev_type"))).as("p"))
        .orderBy("prev_type", "next_type")
    },

    // Per-user session statistics over 30-minute-gap sessions: Spark's
    // native session_window does the merge (the same operator the
    // streaming twin uses); the oracle rebuilds sessions with the
    // classic gaps-and-islands cumulative-sum. Durations compare on
    // floor-second boundaries on BOTH engines (date_diff('second')
    // counts boundary crossings == difference of floored epochs — an
    // exact integer either way, immune to the sub-second seam).
    // Scale: session_window groups shuffle on user_id; per-user output
    // is one row.
    QueryDef(
      "evt_session_stats",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |              OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (
        |  SELECT user_id, ts,
        |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |ses AS (
        |  SELECT user_id, sid, COUNT(*) AS n_ev,
        |         date_diff('second', MIN(ts), MAX(ts)) AS dur_s
        |  FROM y GROUP BY user_id, sid)
        |SELECT user_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |       CAST(MAX(n_ev) AS BIGINT) AS max_session_events,
        |       CAST(SUM(dur_s) AS BIGINT) AS total_session_seconds
        |FROM ses GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val tl = col("ts").cast("timestamp").cast("long")
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          (max(tl) - min(tl)).as("dur_s"))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_sessions"),
          sum(col("n_ev")).cast("long").as("n_events"),
          max(col("n_ev")).cast("long").as("max_session_events"),
          sum(col("dur_s")).cast("long").as("total_session_seconds"))
        .orderBy("user_id")
    },

    // Last-touch attribution (r11): credit each purchase to the most
    // recent same-user click at or before it (the join_asof semantics),
    // reported as purchases per attributed-click hour-of-day — the
    // marketing/conversion report shape; NULL hour = purchases with no
    // prior click. Same scalable union + ordered-window trick as
    // join_asof (one shuffle on user_id, |A|+|B| intermediate rows, no
    // pairwise blow-up); DuckDB's native ASOF LEFT JOIN is the oracle.
    QueryDef(
      "evt_attribution_last_touch",
      """WITH b AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS bts
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |a AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ats
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT a.user_id, a.event_id, b.bts
        |  FROM a ASOF LEFT JOIN b
        |    ON a.user_id = b.user_id AND a.ats >= b.bts)
        |SELECT CAST(EXTRACT(hour FROM bts) AS INT) AS click_hour,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases
        |FROM j GROUP BY 1
        |ORDER BY click_hour NULLS FIRST""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val b = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts")).distinct()
        .select(col("user_id"), col("ts"), lit(0).as("is_a"),
          col("ts").as("bts"))
      val a = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("is_a"),
          lit(null).cast("timestamp").as("bts"))
      // B rows sort before A at equal ts (is_a asc): ats >= bts includes
      // the equal-timestamp click — identical to the ASOF condition
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_a"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      a.unionByName(b)
        .withColumn("lbts", last(col("bts"), ignoreNulls = true).over(w))
        .filter(col("is_a") === 1)
        .groupBy(hour(col("lbts")).cast("int").as("click_hour"))
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy(col("click_hour").asc_nulls_first)
    },

    // Top user journeys (r14): each user's first 5 events in
    // (ts, event_id) order joined into a path string, then the count
    // of users per path — the product-analytics "common paths" report.
    // Order determinism: Spark's collect_list is collection-order-
    // unstable, so the path is array_join(transform(array_sort(
    // collect_list(struct(rn, type))))) — sort on the in-struct rank
    // rebuilds the deterministic order AFTER collection; DuckDB's
    // in-aggregate ORDER BY states the same contract directly. Two
    // node-keyed shuffles (user window, path count); path cardinality
    // is bounded by |event_type|^5, not user count.
    QueryDef(
      "evt_top_paths",
      """WITH r AS (
        |  SELECT user_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |         string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val r = Tables.events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .filter(col("rn") <= 5)
      r.groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")),
          ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    },

    // DAU/WAU stickiness (r14, part 2): per day, the distinct active
    // users that day (DAU), the distinct users over the trailing 7-day
    // window (WAU), and their ratio — the engagement metric every
    // product-analytics stack reports. COUNT(DISTINCT) over a sliding
    // window can't ride a window frame, so the trailing membership is
    // materialized by CONTRIBUTION: each (user, active-day) pair
    // contributes itself to the 7 window-end days it belongs to (a
    // fixed 7× expansion of the already-deduped day×user frame — NOT
    // of the raw stream), then WAU is a plain distinct count per day.
    // All shuffles keyed by user/day; stickiness is a ratio of exact
    // integers (IEEE-identical cross-engine).
    QueryDef(
      "evt_stickiness",
      """WITH du AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day),
        |con AS (
        |  SELECT du.user_id, du.day + CAST(t.i AS INTEGER) AS day
        |  FROM du, unnest(range(0, 7)) AS t(i)),
        |wau AS (
        |  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM con GROUP BY day)
        |SELECT dau.day, dau.dau, wau.wau,
        |       CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
        |FROM dau JOIN wau USING (day)
        |ORDER BY dau.day""".stripMargin) { (s, d) =>
      val du = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = du.groupBy("day").agg(count(lit(1)).cast("long").as("dau"))
      val wau = du
        .select(col("user_id"), col("day"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select(col("user_id"),
          date_add(col("day"), col("i").cast("int")).as("day"))
        .groupBy("day").agg(countDistinct("user_id").cast("long").as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          (col("dau").cast("double") / col("wau")).as("stickiness"))
        .orderBy("day")
    },

    // RFM segmentation (r14, part 3): per user, recency (latest event
    // second), frequency (event count), and monetary (exact-decimal
    // value sum) each quintile-scored with NTILE(5), then bucketed
    // into named segments — the standard customer-value report.
    // Determinism: every NTILE orders by (metric, user_id) — the
    // monetary metric is compared on its exact DECIMAL form, never
    // double — and the segment CASE is integer arithmetic on scores.
    // Scale: the ORACLE spells NTILE as the global window; the Spark
    // side runs three GlobalRank two-passes + closed-form ntileFromRn
    // over the user-sized frame — NO single-partition window ever
    // (the doc_quality_threshold discipline; PlanSpec pins it).
    QueryDef(
      "evt_rfm_segments",
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS recency,
        |         CAST(COUNT(*) AS BIGINT) AS frequency,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS monetary
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |sc AS (
        |  SELECT user_id, recency, frequency,
        |         CAST(monetary AS DOUBLE) AS monetary,
        |         NTILE(5) OVER (ORDER BY recency, user_id) AS r_score,
        |         NTILE(5) OVER (ORDER BY frequency, user_id) AS f_score,
        |         NTILE(5) OVER (ORDER BY monetary, user_id) AS m_score
        |  FROM u)
        |SELECT user_id, recency, frequency, monetary,
        |       CAST(r_score AS INTEGER) AS r_score,
        |       CAST(f_score AS INTEGER) AS f_score,
        |       CAST(m_score AS INTEGER) AS m_score,
        |       CASE WHEN r_score + f_score + m_score >= 13 THEN 'champion'
        |            WHEN r_score + f_score + m_score >= 10 THEN 'loyal'
        |            WHEN r_score + f_score + m_score <= 5 THEN 'at_risk'
        |            ELSE 'regular' END AS segment
        |FROM sc ORDER BY user_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      import graft.operators.GlobalRank
      val u = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy("user_id")
        .agg(floor(unix_timestamp(max(col("ts")))).cast("long").as("recency"),
          count(lit(1)).cast("long").as("frequency"),
          sum(col("value").cast(DecimalType(18, 2))).as("monetaryd"))
        .cutLineage()
      def score(df: org.apache.spark.sql.DataFrame, metric: String,
          out: String) = {
        val (ranked, n) = GlobalRank.withGlobalRowNumber(
          df, Seq(col(metric), col("user_id")), "_rn")
        ranked.withColumn(out, GlobalRank.ntileFromRn(col("_rn"), n, 5))
          .drop("_rn")
      }
      val sc = score(score(score(u, "recency", "r_score"),
        "frequency", "f_score"), "monetaryd", "m_score")
      val tot = col("r_score") + col("f_score") + col("m_score")
      sc.select(col("user_id"), col("recency"), col("frequency"),
          col("monetaryd").cast("double").as("monetary"),
          col("r_score").cast("int").as("r_score"),
          col("f_score").cast("int").as("f_score"),
          col("m_score").cast("int").as("m_score"),
          when(tot >= 13, "champion").when(tot >= 10, "loyal")
            .when(tot <= 5, "at_risk").otherwise("regular").as("segment"))
        .orderBy("user_id")
    },

    // Gini concentration of per-user event volume (r15): the
    // inequality summary every abuse/engagement dashboard carries —
    // G = (2·Σ rn·x − (n+1)·Σx) / (n·Σx) over counts ranked ascending
    // (the closed rank form of the Lorenz-curve integral). Every term
    // is an exact BIGINT sum; the 2·Σrnx − (n+1)·Σx COMBINATION runs
    // in DOUBLE on both engines (the raw BIGINT form overflows once
    // n²·x̄ nears 9e18 — ~2e9 users at this fixture's rates; the sums
    // themselves stay exact far beyond that), so the only rounding is
    // the same pointwise IEEE expression cross-engine, on the u6 grid. The ORACLE
    // spells the rank as the global ROW_NUMBER window; the Spark side
    // rides the GlobalRank two-pass — no single-partition window
    // (the rfm/quality_threshold discipline).
    QueryDef(
      "evt_gini",
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY user_id),
        |rk AS (
        |  SELECT cnt,
        |         CAST(ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS BIGINT) AS rn
        |  FROM u),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |         CAST(SUM(cnt) AS BIGINT) AS total_events,
        |         CAST(SUM(rn * cnt) AS BIGINT) AS rnx
        |  FROM rk)
        |SELECT n_users, total_events,
        |       CAST(FLOOR((2 * CAST(rnx AS DOUBLE)
        |                   - (CAST(n_users AS DOUBLE) + 1) * CAST(total_events AS DOUBLE))
        |                  / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))
        |                  * 1e6 + 0.5) AS BIGINT) AS gini6u
        |FROM ag""".stripMargin) { (s, d) =>
      import graft.operators.GlobalRank
      val u = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("cnt"))
      val (ranked, _) = GlobalRank.withGlobalRowNumber(
        u, Seq(col("cnt"), col("user_id")), "_rn")
      ranked.agg(
          count(lit(1)).cast("long").as("n_users"),
          sum(col("cnt")).cast("long").as("total_events"),
          sum(col("_rn") * col("cnt")).cast("long").as("rnx"))
        .select(col("n_users"), col("total_events"),
          floor((lit(2.0) * col("rnx").cast("double")
              - (col("n_users").cast("double") + 1) * col("total_events").cast("double"))
            / (col("n_users").cast("double") * col("total_events").cast("double"))
            * lit(1e6) + lit(0.5)).cast("long").as("gini6u"))
    }
  )
}
