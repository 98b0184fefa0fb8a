package graft.queries

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, sorts/limits/top-k. All orderings carry a unique
  * tiebreak so ranks and limits are deterministic across engines
  * (SURVEY §7.4 risk 5). The change-detection query is samsa's README
  * slice (/root/reference/README.md:27-52) expressed as lag() —
  * query(key)-then-compare is lag in disguise (SURVEY §2.3).
  */
object WindowsQ {

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "win_rank",
      """SELECT o_custkey, o_orderkey,
        |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |       CAST(RANK() OVER w2 AS BIGINT) AS rnk,
        |       CAST(DENSE_RANK() OVER w2 AS BIGINT) AS drnk
        |FROM orders
        |WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderkey),
        |       w2 AS (PARTITION BY o_custkey ORDER BY o_orderstatus, o_orderkey)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus", "o_orderkey")
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("bigint").as("rn"),
        rank().over(w2).cast("bigint").as("rnk"),
        dense_rank().over(w2).cast("bigint").as("drnk"))
    },

    QueryDef(
      "win_ntile_percent",
      """SELECT c_custkey,
        |       CAST(NTILE(4) OVER w AS INT) AS quartile,
        |       PERCENT_RANK() OVER w AS pr,
        |       CUME_DIST() OVER w AS cd
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)""".stripMargin) { (s, d) =>
      // Scale-safe two-pass global rank (VERDICT r5/r6 item 3): a bare
      // Window.orderBy would sink the whole table into ONE partition.
      // The ordering is total (c_custkey tiebreak), so ntile/pr/cd are
      // closed-form from (rn, n) — see GlobalRank scaladoc.
      import graft.operators.GlobalRank
      val (ranked, n) = GlobalRank.withGlobalRowNumber(
        Tables.customer(s, d), Seq(col("c_acctbal"), col("c_custkey")), "_rn")
      ranked.select(
        col("c_custkey"),
        GlobalRank.ntileFromRn(col("_rn"), n, 4).as("quartile"),
        GlobalRank.percentRankFromRn(col("_rn"), n).as("pr"),
        GlobalRank.cumeDistFromRn(col("_rn"), n).as("cd"))
    },

    QueryDef(
      "win_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |       LAG(o_orderkey) OVER w AS prev_order,
        |       LEAD(o_orderkey) OVER w AS next_order,
        |       LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"))
    },

    QueryDef(
      "win_running",
      // Running sum over doubles is order-dependent only in *which* rows are
      // included; with a total order per frame both engines accumulate the
      // same prefix in the same order => identical IEEE result.
      """SELECT l_orderkey, l_linenumber,
        |       SUM(l_quantity) OVER w AS run_qty,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS run_n,
        |       MIN(l_extendedprice) OVER w AS run_min,
        |       MAX(l_extendedprice) OVER w AS run_max
        |FROM lineitem WHERE l_orderkey < 2000
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d).filter(col("l_orderkey") < 2000).select(
        col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity")).over(w).as("run_qty"),
        count(lit(1)).over(w).cast("bigint").as("run_n"),
        min(col("l_extendedprice")).over(w).as("run_min"),
        max(col("l_extendedprice")).over(w).as("run_max"))
    },

    QueryDef(
      // Value window functions over an explicit whole-partition frame:
      // first/last/nth (nth yields NULL when the frame is shorter).
      "win_value_fns",
      """SELECT l_orderkey, l_linenumber,
        |       first_value(l_extendedprice) OVER w AS first_price,
        |       last_value(l_extendedprice) OVER w AS last_price,
        |       nth_value(l_extendedprice, 2) OVER w AS second_price
        |FROM lineitem WHERE l_orderkey < 2000
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.lineitem(s, d).filter(col("l_orderkey") < 2000).select(
        col("l_orderkey"), col("l_linenumber"),
        first(col("l_extendedprice")).over(w).as("first_price"),
        last(col("l_extendedprice")).over(w).as("last_price"),
        nth_value(col("l_extendedprice"), 2).over(w).as("second_price"))
    },

    QueryDef(
      "win_range_frame",
      """SELECT p_partkey, p_size,
        |       CAST(COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_close
        |FROM part""".stripMargin) { (s, d) =>
      // Scale-safe range frame (VERDICT r5/r6 item 3): the frame only
      // reads the ORDER BY value, and p_size has a small discrete
      // domain — so aggregate counts per value (map-side combinable),
      // band-self-join the TINY per-value table (broadcast), and join
      // back. No global window, no single-partition sink; the n²
      // band join is over |distinct sizes| rows, not |part|. (For a
      // continuous domain see win_range_frame_cont below —
      // GlobalRank.withRangeFrameAgg's range-repartition with
      // boundary-overlap replication.)
      val parts = Tables.part(s, d)
      val bySize = parts.groupBy("p_size").agg(count(lit(1)).as("c"))
      val band = bySize.select(col("p_size").as("s"), col("c"))
      val nClose = band.as("x")
        .join(broadcast(band.as("y")),
          col("y.s").between(col("x.s") - 2, col("x.s")))
        .groupBy(col("x.s").as("p_size"))
        .agg(sum(col("y.c")).cast("bigint").as("n_close"))
      parts.select("p_partkey", "p_size")
        .join(broadcast(nClose), "p_size")
        .select("p_partkey", "p_size", "n_close")
    },

    // CONTINUOUS-domain global range frame (r8, VERDICT item 6): a
    // price band of +/-100.0 around every row over the WHOLE table.
    // The discrete trick above (aggregate per distinct value) dies on
    // a continuous key, and the naive Window.orderBy plans Exchange
    // SinglePartition — so this rides GlobalRank.withRangeFrameAgg:
    // range-repartition on the key, replicate rows into the partitions
    // whose band their frame overlaps, per-partition RANGE window
    // (P-way), keep home copies. PlanSpec asserts no SinglePartition;
    // the oracle is the plain global range window (the oracle only
    // needs to be correct, not scale). Decimal band sum => exact in
    // both engines; the count is integral.
    QueryDef(
      "win_range_frame_cont",
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_band,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS qty_band
        |FROM lineitem WHERE l_orderkey < 2000
        |WINDOW w AS (ORDER BY l_extendedprice
        |             RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING)""".stripMargin) { (s, d) =>
      import graft.operators.GlobalRank
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 2000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      GlobalRank.withRangeFrameAgg(li, col("l_extendedprice"),
          before = 100.0, after = 100.0,
          aggs = Map(
            "n_band" -> "count(1)",
            "qty_band" -> "sum(CAST(l_quantity AS DECIMAL(18,2)))"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("n_band").cast("bigint").as("n_band"),
          col("qty_band").cast("double").as("qty_band"))
    },

    QueryDef(
      "win_first_last_frame",
      """SELECT o_custkey, o_orderkey,
        |       FIRST_VALUE(o_orderkey) OVER w AS first_ok,
        |       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(wFull).as("last_ok"))
    },

    // Batch sessionization: Spark's session_window aggregation (the same
    // operator Structured Streaming uses) against a lag+cumsum oracle.
    // Session boundary: gap >= 5 min; session end = last event + gap
    // (Spark's session_window convention, mirrored in the oracle).
    QueryDef(
      "win_sessionize",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |x AS (SELECT user_id, ts,
        |        CASE WHEN LAG(ts) OVER w IS NULL
        |             OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, ts,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x)
        |SELECT user_id,
        |       MIN(ts) AS s_start,
        |       MAX(ts) + INTERVAL 5 MINUTE AS s_end,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM y GROUP BY user_id, sid""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("w.start").as("s_start"),
          col("w.end").as("s_end"), col("n"))
    },

    // samsa's README change-detection (query state, compare, save —
    // README.md:43-52) as a single batch window: lag() per key.
    QueryDef(
      "win_change_detection",
      """SELECT user_id, event_id, event_type, prev_type,
        |       CASE WHEN prev_type IS NULL THEN 'initial'
        |            WHEN prev_type <> event_type THEN 'changed'
        |            ELSE 'unchanged' END AS change
        |FROM (
        |  SELECT user_id, event_id, event_type,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        |  FROM events)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .withColumn("change",
          when(col("prev_type").isNull, "initial")
            .when(col("prev_type") =!= col("event_type"), "changed")
            .otherwise("unchanged"))
    },

    QueryDef(
      "sort_multi_limit",
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        |FROM customer
        |ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
        |LIMIT 50""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy(col("c_mktsegment").asc, col("c_acctbal").desc, col("c_custkey").asc)
        .limit(50)
    },

    QueryDef(
      "sort_nulls_last",
      """SELECT o_orderkey, c_name
        |FROM orders LEFT JOIN customer
        |  ON o_custkey = c_custkey AND c_acctbal > 9000
        |ORDER BY c_name ASC NULLS LAST, o_orderkey ASC
        |LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey") && col("c_acctbal") > 9000, "left")
        .select("o_orderkey", "c_name")
        .orderBy(col("c_name").asc_nulls_last, col("o_orderkey").asc)
        .limit(100)
    },

    // Top-k per group: the scalable pattern (single shuffle on the group
    // key, rank inside the partition — no global sort).
    QueryDef(
      "topk_per_group",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("bigint").as("rn"))
        .filter(col("rn") <= 3)
    },

    QueryDef(
      "win_running_revenue",
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id
        |         ORDER BY CAST(ts AS TIMESTAMP), event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_value
        |FROM events""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double").as("run_value"))
    },

    // EWMA (alpha = 0.3, seeded at the first observation) — the classic
    // time-series smoothing feature. A sequential recurrence, so it
    // cannot ride a plain SQL window; both engines run the IDENTICAL
    // IEEE op sequence: sort the per-key series once, then fold
    // 0.3*x + 0.7*acc left-to-right. Spark side is a compiled O(n) scan
    // per key (one groupBy shuffle, series bounded per key — same
    // per-key-list contract as agg_listagg); the oracle re-derives each
    // prefix with DuckDB's list_reduce (same fold order => bit-equal).
    QueryDef(
      "win_ewma",
      """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |            FROM events WHERE value IS NOT NULL),
        |rn AS (SELECT user_id, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |       FROM ev),
        |ls AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        |       FROM ev GROUP BY user_id)
        |SELECT r.user_id AS user_id, r.event_id AS event_id,
        |       list_reduce(l.vals[1:r.rn],
        |         (acc, x) -> CAST(0.3 AS DOUBLE)*x + CAST(0.7 AS DOUBLE)*acc) AS ewma
        |FROM rn r JOIN ls l ON l.user_id = r.user_id
        |ORDER BY r.user_id, r.event_id""".stripMargin) { (s, d) =>
      val scan = udf { (vals0: Seq[Double]) =>
        val vals = vals0.toArray // linear-indexed UDF Seq — copy once
        val out = new Array[Double](vals.length)
        var acc = 0.0
        var i = 0
        while (i < vals.length) {
          acc = if (i == 0) vals(0) else 0.3 * vals(i) + 0.7 * acc
          out(i) = acc
          i += 1
        }
        out
      }
      Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy("user_id")
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("value")))).as("xs"))
        .select(col("user_id"),
          expr("transform(xs, e -> e.event_id)").as("ids"),
          scan(expr("transform(xs, e -> e.value)")).as("ew"))
        .select(col("user_id"),
          posexplode(arrays_zip(col("ids"), col("ew"))).as(Seq("i", "z")))
        .select(col("user_id"), col("z.ids").as("event_id"),
          col("z.ew").as("ewma"))
        .orderBy("user_id", "event_id")
    },

    // SCD2 interval build from a change stream: compress consecutive
    // same-value runs per key (the lag != current filter), then validity
    // intervals [valid_from, valid_to) via lead; open interval = current
    // row. The standard CDC -> dimension-table recipe; two windows on
    // the SAME (user_id | ts, event_id) partitioning, so one shuffle
    // serves both.
    QueryDef(
      "win_scd2_intervals",
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              CAST(ts AS TIMESTAMP) AS ts,
        |              LAG(event_type) OVER (PARTITION BY user_id
        |                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        |            FROM events),
        |chg AS (SELECT user_id, event_id, event_type, ts FROM ev
        |        WHERE prev_type IS NULL OR prev_type <> event_type),
        |iv AS (SELECT user_id, event_id, event_type, ts AS valid_from,
        |         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |       FROM chg)
        |SELECT user_id, event_id, event_type, valid_from, valid_to,
        |       valid_to IS NULL AS is_current
        |FROM iv ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val chg = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      chg.select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w2).as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("user_id", "valid_from", "event_id")
    }
  )
}
