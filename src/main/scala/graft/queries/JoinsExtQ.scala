package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended join operators beyond plain equi/theta joins (SURVEY §2.3
  * "Joins"): the as-of join composite and a banded range join.
  *
  * The as-of join is built with the scalable union + last_value(ignore
  * nulls) window pattern: one shuffle on the key, a single ordered pass per
  * key — no pairwise blow-up. At 100 TB this beats join+dedup because the
  * intermediate never exceeds |A| + |B| rows. DuckDB's native ASOF JOIN is
  * the oracle.
  *
  * Ref: ABSENT in /root/reference (reachable only via the user-callback
  * escape hatch, samsa/kafka/storage.py:237).
  */
object JoinsExtQ {

  val all: Seq[QueryDef] = Seq(
    // For each purchase event: the most recent click of the same user at or
    // before the purchase. B side pre-deduped to one row per (user, ts)
    // (greatest event_id wins) so as-of tie semantics are well-defined in
    // both engines.
    QueryDef(
      "join_asof",
      """WITH b AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS bts,
        |         MAX(event_id) AS b_event
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |a AS (
        |  SELECT user_id, event_id AS a_event, CAST(ts AS TIMESTAMP) AS ats
        |  FROM events WHERE event_type = 'purchase')
        |SELECT a.user_id, a.a_event, b.b_event
        |FROM a ASOF LEFT JOIN b
        |  ON a.user_id = b.user_id AND a.ats >= b.bts""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val b = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max("event_id").as("b_event"))
        .select(col("user_id"), col("ts"), lit(0).as("is_a"),
          lit(null).cast("bigint").as("a_event"), col("b_event"))
      val a = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("is_a"),
          col("event_id").as("a_event"), lit(null).cast("bigint").as("b_event"))
      // B rows sort before A rows at equal ts (is_a asc) so ats >= bts
      // includes the equal-timestamp click.
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_a"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      a.unionByName(b)
        .withColumn("b_event", last(col("b_event"), ignoreNulls = true).over(w))
        .filter(col("is_a") === 1)
        .select("user_id", "a_event", "b_event")
    },

    // NEAREST as-of join (r10 part 3): for every error event, the
    // same-user purchase closest in time within a 1-hour tolerance —
    // sensor/event alignment semantics that backward-only as-of can't
    // express. Two passes of the union+ordered-window trick (backward:
    // running MAX of purchase times; forward: the same on the reversed
    // order), then the winner by absolute distance, ties to the earlier
    // (backward) side. MAX/MIN over CASE replaces LAST_VALUE IGNORE
    // NULLS (engines spell that differently; purchase times are
    // monotone within the window order, so the extremum IS the nearest
    // — the gap-fill portability discipline), and distances compare on
    // floor-second boundaries on both engines. Scale: two windows over
    // the user-keyed union plus two node-sized joins back to the
    // deduped purchase frame — every shuffle on user_id.
    QueryDef(
      "join_asof_nearest",
      """WITH b0 AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS bts, MAX(event_id) AS b_event
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |a0 AS (
        |  SELECT user_id, event_id AS a_event, CAST(ts AS TIMESTAMP) AS ats
        |  FROM events WHERE event_type = 'error'),
        |u AS (
        |  SELECT user_id, ats AS ts, 1 AS is_a, a_event FROM a0
        |  UNION ALL
        |  SELECT user_id, bts AS ts, 0 AS is_a, CAST(NULL AS BIGINT) FROM b0),
        |w AS (
        |  SELECT user_id, ts, is_a, a_event,
        |         MAX(CASE WHEN is_a = 0 THEN ts END) OVER wb AS bwd_ts,
        |         MIN(CASE WHEN is_a = 0 THEN ts END) OVER wf AS fwd_ts
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, is_a
        |                ROWS UNBOUNDED PRECEDING),
        |         wf AS (PARTITION BY user_id ORDER BY ts DESC, is_a
        |                ROWS UNBOUNDED PRECEDING)),
        |j AS (
        |  SELECT s.user_id, s.a_event,
        |         date_diff('second', s.bwd_ts, s.ts) AS bd,
        |         date_diff('second', s.ts, s.fwd_ts) AS fd,
        |         bb.b_event AS bwd_event, fb.b_event AS fwd_event
        |  FROM (SELECT * FROM w WHERE is_a = 1) s
        |  LEFT JOIN b0 bb ON bb.user_id = s.user_id AND bb.bts = s.bwd_ts
        |  LEFT JOIN b0 fb ON fb.user_id = s.user_id AND fb.bts = s.fwd_ts)
        |SELECT user_id, a_event,
        |       CASE WHEN bwd_event IS NOT NULL AND bd <= 3600
        |                 AND (fwd_event IS NULL OR fd > 3600 OR bd <= fd)
        |            THEN bwd_event
        |            WHEN fwd_event IS NOT NULL AND fd <= 3600
        |            THEN fwd_event END AS near_event,
        |       CASE WHEN bwd_event IS NOT NULL AND bd <= 3600
        |                 AND (fwd_event IS NULL OR fd > 3600 OR bd <= fd)
        |            THEN CAST(bd AS BIGINT)
        |            WHEN fwd_event IS NOT NULL AND fd <= 3600
        |            THEN CAST(fd AS BIGINT) END AS near_dist_s
        |FROM j ORDER BY user_id, a_event""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val b0 = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("bts"))
        .agg(max("event_id").as("b_event"))
      val a0 = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("a_event"), col("ts").as("ats"))
      val u = a0.select(col("user_id"), col("ats").as("ts"),
          lit(1).as("is_a"), col("a_event"))
        .unionByName(b0.select(col("user_id"), col("bts").as("ts"),
          lit(0).as("is_a"), lit(null).cast("bigint").as("a_event")))
      val wb = Window.partitionBy("user_id").orderBy(col("ts"), col("is_a"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy(col("ts").desc, col("is_a"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bOnly = when(col("is_a") === 0, col("ts"))
      val sel = u
        .withColumn("bwd_ts", max(bOnly).over(wb))
        .withColumn("fwd_ts", min(bOnly).over(wf))
        .filter(col("is_a") === 1)
      val j = sel
        .join(b0.select(col("user_id"), col("bts").as("bwd_ts"),
          col("b_event").as("bwd_event")), Seq("user_id", "bwd_ts"), "left")
        .join(b0.select(col("user_id"), col("bts").as("fwd_ts"),
          col("b_event").as("fwd_event")), Seq("user_id", "fwd_ts"), "left")
        // events.ts is TIMESTAMP_NTZ, which Spark won't cast straight to
        // BIGINT — hop through LTZ (identity under the UTC session)
        .withColumn("bd", col("ts").cast("timestamp").cast("long") -
          col("bwd_ts").cast("timestamp").cast("long"))
        .withColumn("fd", col("fwd_ts").cast("timestamp").cast("long") -
          col("ts").cast("timestamp").cast("long"))
      val pickBwd = col("bwd_event").isNotNull && col("bd") <= 3600 &&
        (col("fwd_event").isNull || col("fd") > 3600 || col("bd") <= col("fd"))
      val pickFwd = col("fwd_event").isNotNull && col("fd") <= 3600
      j.select(col("user_id"), col("a_event"),
          when(pickBwd, col("bwd_event")).when(pickFwd, col("fwd_event"))
            .as("near_event"),
          when(pickBwd, col("bd")).when(pickFwd, col("fd"))
            .cast("long").as("near_dist_s"))
        .orderBy("user_id", "a_event")
    },

    // Banded (range) join: suppliers to customers of the same nation whose
    // balances are within 100 of each other. Equi part (nation) carries the
    // shuffle; the band is a post-join filter — Catalyst plans SMJ on the
    // equi key, the scalable shape.
    QueryDef(
      "join_range_band",
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey
        | AND c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .join(Tables.customer(s, d),
          col("s_nationkey") === col("c_nationkey")
            && col("c_acctbal").between(col("s_acctbal") - 100, col("s_acctbal") + 100))
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
    },

    // INTERVAL OVERLAP join (time-range correlation): pairs of users
    // whose activity sessions overlap, counted per user pair. The naive
    // form is a pure theta join (no equi key -> quadratic in sessions);
    // the Spark side uses the GRID-BUCKET technique: explode each
    // interval to the hour cells it spans (sessions are gap-bounded, so
    // the fan-out is small and bounded), equi-join on the cell — two
    // overlapping intervals ALWAYS share the cell containing
    // [max(starts), min(ends)], so recall is exact — re-verify the real
    // overlap predicate, distinct the session pair (it may share many
    // cells). The shuffle key is the time cell, whose cardinality grows
    // with the data span: no quadratic blow-up, no skew pile-up. The
    // oracle runs the honest quadratic theta join. Sessions derive from
    // the proven session_window <-> lag-gap CTE equivalence
    // (win_sessionize); strict < on both bounds = half-open windows,
    // touching sessions do NOT overlap.
    //
    // SCOPED TO ONE DAY: co-activity pair OUTPUT is inherently
    // quadratic in concurrently-active users (measured: 17 s -> 290 s
    // at 10x users on the unsliced form — SCALE.md caveat); the
    // production shape runs per day/shard exactly like this row, and
    // the grid join keeps each slice cell-bounded.
    QueryDef(
      "join_interval_overlap",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |           WHERE CAST(ts AS DATE) = DATE '2024-01-15'),
        |x AS (SELECT user_id, ts,
        |        CASE WHEN LAG(ts) OVER w IS NULL
        |             OR ts - LAG(ts) OVER w >= INTERVAL 60 MINUTE THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, ts,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x),
        |iv AS (SELECT user_id, MIN(ts) AS s_start,
        |              MAX(ts) + INTERVAL 60 MINUTE AS s_end
        |       FROM y GROUP BY user_id, sid),
        |p AS (SELECT a.user_id AS user_a, b.user_id AS user_b
        |      FROM iv a JOIN iv b ON a.user_id < b.user_id
        |        AND a.s_start < b.s_end AND b.s_start < a.s_end)
        |SELECT user_a, user_b, CAST(COUNT(*) AS BIGINT) AS n_overlaps
        |FROM p GROUP BY user_a, user_b""".stripMargin) { (s, d) =>
      val iv = Tables.events(s, d)
        .filter(col("ts").cast("date") === lit("2024-01-15").cast("date"))
        .groupBy(session_window(col("ts"), "60 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("w.start").as("s_start"),
          col("w.end").as("s_end"))
      val cells = iv.withColumn("cell", explode(sequence(
        floor(unix_timestamp(col("s_start")) / 3600).cast("long"),
        floor(unix_timestamp(col("s_end")) / 3600).cast("long"))))
      val a = cells.select(col("user_id").as("user_a"),
        col("s_start").as("sa"), col("s_end").as("ea"), col("cell"))
      val b = cells.select(col("user_id").as("user_b"),
        col("s_start").as("sb"), col("s_end").as("eb"), col("cell"))
      a.join(b, Seq("cell"))
        .filter(col("user_a") < col("user_b") &&
          col("sa") < col("eb") && col("sb") < col("ea"))
        .select("user_a", "user_b", "sa", "sb").distinct()
        .groupBy("user_a", "user_b")
        .agg(count(lit(1)).cast("long").as("n_overlaps"))
    },

    // Bucketed co-located join (r14, part 3): both fact tables written
    // bucketBy(8) on the join key, then joined WITHOUT a shuffle —
    // Catalyst matches the bucket spec to the join's required
    // distribution and plans a SortMergeJoin whose only Exchange is
    // the downstream aggregate's (PlanSpec pins exactly that). This is
    // THE 100 TB fact-fact join technique: pre-bucketing amortizes the
    // big shuffle into the write path once, and every subsequent join
    // on the key is map-side. The oracle computes the same
    // aggregate-over-join from the raw tables — values must be
    // identical whether or not the physical layout is bucketed.
    QueryDef(
      "join_bucketed_colocated",
      """SELECT o_orderpriority,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      // idempotent per (session, sf dir): rewrite the bucketed copies
      // only when the source dir changes. A FRESH session can inherit a
      // stale warehouse directory from an earlier JVM without the
      // catalog entry (in-memory catalog), where saveAsTable refuses
      // the existing location — drop the table AND its physical dir
      // before rewriting.
      val marker = s"graft.bucketed.src"
      if (s.conf.getOption(marker).forall(_ != d)) {
        def reset(name: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $name")
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), name)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true): Unit
        }
        reset("graft_li_bucketed")
        reset("graft_orders_bucketed")
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("graft_li_bucketed")
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable("graft_orders_bucketed")
        s.conf.set(marker, d)
      }
      s.table("graft_li_bucketed")
        .join(s.table("graft_orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(graft.Det.dsum2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).cast("long").as("n_items"))
    },

    // Event-time range join (r15): every (view, purchase) pair by the
    // same user with the purchase inside [view, view + 1h) — the
    // click-attribution join shape, and the batch twin of the native
    // stream-stream interval join (streaming/WindowJoin, ELEVENTH
    // batch/stream parity pair — there the same key+range condition
    // runs with two watermarked streams and bounded join state). Batch
    // plan: one shuffle of each filtered side on user_id, SMJ on the
    // equi-key with the time band as a post-filter; per-user fan-out is
    // views x purchases within an hour, never |events|². Pushed
    // filters prune each scan to one event_type.
    QueryDef(
      "join_view_purchase_window",
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) < CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |ORDER BY view_id, purchase_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("vts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts").as("pts"))
      v.join(p, col("user_id") === col("p_user")
          && col("pts") >= col("vts")
          && col("pts") < col("vts") + expr("INTERVAL 1 HOUR"))
        .select("user_id", "view_id", "purchase_id")
        .orderBy("view_id", "purchase_id")
    },

    // SALTED skew join (r16, VERDICT r15 item 5): the hand-rolled
    // hot-key treatment for when AQE's OptimizeSkewedJoin can't help —
    // a shuffle-HASH join (no sort to split) or a key so hot one
    // partition exceeds every split threshold. A deterministic remap
    // plants the skew (30% of events collapse onto user 7 — the
    // one-mega-customer shape), then the dim side REPLICATES over 8
    // salt values while the fact side scatters each hot key across
    // salts by event_id — the (uid, salt) exchange spreads the hot
    // key's rows over 8 reduce tasks instead of one straggler. Salt
    // values never reach the output, so the oracle is the PLAIN
    // join+aggregate: salting must be invisible to semantics. PlanSpec
    // pins the salted exchange + shuffle-hash join; the AQE
    // OptimizeSkewedJoin twin (sort-merge splits, no manual salt) is
    // pinned in PlanSpec on a forced-threshold plan. SCALE.md carries
    // the straggler-vs-salted curve.
    QueryDef(
      "join_skew_salted",
      """WITH ev AS (
        |  SELECT CASE WHEN event_id % 10 < 3 THEN 7 ELSE user_id END AS uid,
        |         value
        |  FROM events)
        |SELECT c_mktsegment,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM ev JOIN customer ON c_custkey = uid
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val salts = 8
      val ev = Tables.events(s, d).select(
        when(col("event_id") % 10 < 3, lit(7L))
          .otherwise(col("user_id")).as("uid"),
        pmod(col("event_id"), lit(salts)).cast("int").as("salt"),
        col("value"))
      val users = Tables.customer(s, d)
        .select(col("c_custkey").as("uid"), col("c_mktsegment"))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      // SHUFFLE_HASH pins the scenario: the dim is small enough to
      // broadcast here (where salting would be moot), but the planted
      // shape is the 100 TB one where BOTH sides shuffle on the key
      ev.join(users.hint("SHUFFLE_HASH"), Seq("uid", "salt"))
        .groupBy("c_mktsegment")
        .agg(graft.Det.dsum2(col("value")).as("revenue"),
          count(lit(1)).cast("long").as("n_events"))
        .orderBy("c_mktsegment")
    }
  )
}
