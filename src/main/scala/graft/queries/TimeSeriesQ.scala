package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.Checkpoints.CutOps

/** Time-series + incremental-ETL operators (round 10): calendar
  * gap-fill with LOCF / linear interpolation, OHLC downsampling, and
  * the batch CDC merge that is the batch twin of the streaming
  * latest-wins upsert store (`streaming/StatefulStore.scala` — samsa's
  * R4/R17–R22 store semantics, /root/reference/samsa/kafka/storage.py).
  *
  * Scale posture shared by all three: the heavy input (raw events) is
  * reduced FIRST by a map-side-combinable aggregate keyed by the
  * series/entity key; windows and joins then run on the aggregated,
  * bounded series — never a data-scale Window. Gap-fill's calendar
  * explode is bounded by the series span (hours), not the row count.
  */
object TimeSeriesQ {

  /** Cutoff splitting the events log into "snapshot" and "changes" for
    * the CDC merge (fixture events span 2024-01-01..2024-01-30). */
  private val mergeCutoff = "2024-01-21 00:00:00"

  val all: Seq[QueryDef] = Seq(

    // Calendar gap-fill + imputation: densify the hourly per-type value
    // series to EVERY hour in its span, then fill gaps two ways —
    // last-observation-carried-forward and linear interpolation between
    // the bracketing anchors. The gaps-and-islands form (a running
    // count of non-null anchors names, for every row, the group that
    // shares its previous/next anchor) is engine-portable — no
    // IGNORE NULLS, which DuckDB and Spark spell differently. All
    // arithmetic on the anchors is the same IEEE expression tree on
    // both engines; outputs land on the u6 half-up grid (graft.Det).
    // Scale: hourly is a map-side-combinable aggregate over the scan;
    // everything after runs on |types| × |span hours| rows. For
    // multi-year spans the per-type sequence() array is the only
    // span-sized allocation (730 entries/month — chunk by day first if
    // a series spans decades).
    QueryDef(
      "ts_gapfill_interp",
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
        |span AS (
        |  SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1
        |  FROM hourly GROUP BY event_type),
        |cal AS (
        |  SELECT event_type,
        |         UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM span),
        |j AS (
        |  SELECT c.event_type, c.hr, h.v
        |  FROM cal c LEFT JOIN hourly h
        |    ON h.event_type = c.event_type AND h.hr = c.hr),
        |m AS (
        |  SELECT event_type, hr, v,
        |         COUNT(v) OVER (PARTITION BY event_type ORDER BY hr) AS gp,
        |         COUNT(v) OVER (PARTITION BY event_type ORDER BY hr DESC) AS gn
        |  FROM j),
        |a AS (
        |  SELECT event_type, hr, v,
        |         MAX(CASE WHEN v IS NOT NULL THEN hr END)
        |           OVER (PARTITION BY event_type, gp) AS pd,
        |         MAX(CASE WHEN v IS NOT NULL THEN v END)
        |           OVER (PARTITION BY event_type, gp) AS pv,
        |         MIN(CASE WHEN v IS NOT NULL THEN hr END)
        |           OVER (PARTITION BY event_type, gn) AS nd,
        |         MAX(CASE WHEN v IS NOT NULL THEN v END)
        |           OVER (PARTITION BY event_type, gn) AS nv
        |  FROM m)
        |SELECT event_type, hr, (v IS NULL) AS is_gap,
        |       CAST(FLOOR(COALESCE(v, pv) * 1e6 + 0.5) AS BIGINT) AS locf_u6,
        |       CAST(FLOOR(COALESCE(v,
        |              pv + (nv - pv) *
        |                (CAST(date_diff('hour', pd, hr) AS DOUBLE) /
        |                 CAST(date_diff('hour', pd, nd) AS DOUBLE))) * 1e6 + 0.5)
        |            AS BIGINT) AS interp_u6
        |FROM a
        |ORDER BY event_type, hr""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(sum(col("value").cast(DecimalType(18, 6))).cast("double").as("v"))
      val cal = hourly.groupBy("event_type")
        .agg(min("hr").as("h0"), max("hr").as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr"))
      val wUp = Window.partitionBy("event_type").orderBy("hr")
      val wDn = Window.partitionBy("event_type").orderBy(col("hr").desc)
      val m = cal.join(hourly, Seq("event_type", "hr"), "left")
        .withColumn("gp", count("v").over(wUp))
        .withColumn("gn", count("v").over(wDn))
      val wp = Window.partitionBy("event_type", "gp")
      val wn = Window.partitionBy("event_type", "gn")
      val anchorHr = when(col("v").isNotNull, col("hr"))
      val anchorV = when(col("v").isNotNull, col("v"))
      val a = m
        .withColumn("pd", max(anchorHr).over(wp))
        .withColumn("pv", max(anchorV).over(wp))
        .withColumn("nd", min(anchorHr).over(wn))
        .withColumn("nv", max(anchorV).over(wn))
      // hour distances as exact integer-valued doubles (timestamps are
      // whole hours, so the second diff is a multiple of 3600)
      val dh = (col("hr").cast("long") - col("pd").cast("long")) / lit(3600L)
      val dn = (col("nd").cast("long") - col("pd").cast("long")) / lit(3600L)
      a.select(
        col("event_type"), col("hr"), col("v").isNull.as("is_gap"),
        floor(coalesce(col("v"), col("pv")) * lit(1.0e6) + lit(0.5))
          .cast("long").as("locf_u6"),
        floor(coalesce(col("v"),
            col("pv") + (col("nv") - col("pv")) * (dh / dn)) * lit(1.0e6) + lit(0.5))
          .cast("long").as("interp_u6"))
        .orderBy("event_type", "hr")
    },

    // OHLC downsampling: collapse the event stream into daily bars per
    // type — open/close by event time, high/low, volume. Pure full
    // aggregate (min_by/max_by on the unique-in-group ts — FIXTURES:
    // (event_type, ts) is unique at every sf), map-side combinable, no
    // Window over raw data: the shape that survives any scale-up.
    QueryDef(
      "ts_resample_ohlc",
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |       ARG_MIN(value, ts) AS open,
        |       MAX(value) AS high,
        |       MIN(value) AS low,
        |       ARG_MAX(value, ts) AS close,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vsum
        |FROM events
        |GROUP BY event_type, CAST(ts AS DATE)
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(
          min_by(col("value"), col("ts")).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), col("ts")).as("close"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("vsum"))
        .orderBy("event_type", "day")
    },

    // Batch CDC merge — the batch twin of the streaming latest-wins
    // upsert store (streaming/StatefulStore.scala; samsa R4/R17–R22,
    // /root/reference/samsa/kafka/storage.py:86-130): compact a
    // snapshot (latest pre-cutoff event per user) with a changelog
    // (latest post-cutoff event per user) via ONE full-outer join.
    // 'error' events are tombstones: a tombstoned key is absent from
    // the merged state, and a change over a tombstoned base is an
    // INSERT, not an update — exactly log-compaction semantics, and
    // merge(snapshot(pre), compact(post)) == snapshot(full log) (the
    // invariant TimeSeriesSpec asserts). Both aggregates shuffle on
    // user_id, so the join is co-partitioned — compaction's standard
    // cluster shape; values are picked (arg_max), never summed, so no
    // decimal discipline is needed.
    QueryDef(
      "etl_merge_upsert",
      s"""WITH base AS (
         |  SELECT user_id, ARG_MAX(value, ts) AS bv,
         |         ARG_MAX(event_type, ts) AS bet, MAX(ts) AS bt
         |  FROM events WHERE ts < TIMESTAMP '$mergeCutoff'
         |  GROUP BY user_id),
         |chg AS (
         |  SELECT user_id, ARG_MAX(value, ts) AS cv,
         |         ARG_MAX(event_type, ts) AS cet, MAX(ts) AS ct
         |  FROM events WHERE ts >= TIMESTAMP '$mergeCutoff'
         |  GROUP BY user_id),
         |m AS (
         |  SELECT COALESCE(b.user_id, c.user_id) AS user_id,
         |         b.bv, b.bet, b.bt, c.cv, c.cet, c.ct
         |  FROM base b FULL JOIN chg c ON b.user_id = c.user_id)
         |SELECT user_id,
         |       CASE WHEN ct IS NOT NULL THEN cv ELSE bv END AS cur_value,
         |       CASE WHEN ct IS NOT NULL THEN cet ELSE bet END AS cur_type,
         |       CASE WHEN ct IS NOT NULL THEN ct ELSE bt END AS cur_ts,
         |       CASE WHEN ct IS NULL THEN 'keep'
         |            WHEN bt IS NULL OR bet = 'error' THEN 'insert'
         |            ELSE 'update' END AS op
         |FROM m
         |WHERE (CASE WHEN ct IS NOT NULL THEN cet ELSE bet END) <> 'error'
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      def compact(side: org.apache.spark.sql.DataFrame, p: String) =
        side.groupBy("user_id").agg(
          max_by(col("value"), col("ts")).as(p + "v"),
          max_by(col("event_type"), col("ts")).as(p + "et"),
          max(col("ts")).as(p + "t"))
      val cut = lit(mergeCutoff).cast("timestamp")
      val base = compact(ev.filter(col("ts") < cut), "b")
      val chg = compact(ev.filter(col("ts") >= cut), "c")
      val isChg = col("ct").isNotNull
      base.join(chg, Seq("user_id"), "full")
        .select(col("user_id"),
          when(isChg, col("cv")).otherwise(col("bv")).as("cur_value"),
          when(isChg, col("cet")).otherwise(col("bet")).as("cur_type"),
          when(isChg, col("ct")).otherwise(col("bt")).as("cur_ts"),
          when(!isChg, lit("keep"))
            .when(col("bt").isNull || col("bet") === "error", lit("insert"))
            .otherwise(lit("update")).as("op"))
        .filter(col("cur_type") =!= "error")
        .orderBy("user_id")
    },

    // Holt's LINEAR (double-exponential) smoothing per type over the
    // hourly series — level + trend, one step beyond win_ewma's
    // level-only recursion, closing the classical smoothing family.
    // The recursion l' = αx + (1−α)(l+b); b' = β(l'−l) + (1−β)b is
    // inherently ordered, so both engines run the SAME index-order fold
    // (Spark `aggregate` HOF / DuckDB `list_reduce` over a struct
    // accumulator carrying (v, l, b, k), k=1 marking the init step:
    // l₂=v₂, b₂=v₂−v₁) with identical IEEE expression shapes; outputs
    // land on the u6 grid. Scale: the fold runs per SERIES — |types|
    // driver-of-nothing rows of span-bounded arrays (720/month) after
    // the map-side-combinable hourly aggregate; a series long enough to
    // blow an array (decades of hours) needs chunked re-init, not this
    // row. Smoothing constants α=0.5, β=0.3.
    QueryDef(
      "ts_holt_linear",
      // Oracle note: a struct-accumulator list_reduce would be the
      // natural twin of Spark's aggregate() fold, but DuckDB 1.0.0
      // ALIASES the accumulator in place from the second combine on
      // (field reads see already-written new values — found live here),
      // and the behavior is version-dependent. The recursive CTE below
      // is the lambda-free formulation: one row per (type, t) step,
      // identical IEEE expression shapes to the Spark fold.
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
        |idx AS (
        |  SELECT event_type, v,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS i
        |  FROM hourly),
        |nn AS (SELECT event_type, COUNT(*) AS n FROM hourly
        |       GROUP BY event_type HAVING COUNT(*) >= 2),
        |it AS (
        |  SELECT a.event_type, 2 AS t, b2.v AS l, b2.v - b1.v AS b
        |  FROM nn a
        |  JOIN idx b1 ON b1.event_type = a.event_type AND b1.i = 1
        |  JOIN idx b2 ON b2.event_type = a.event_type AND b2.i = 2
        |  UNION ALL
        |  SELECT it.event_type, it.t + 1,
        |         0.5 * x.v + 0.5 * (it.l + it.b),
        |         0.3 * ((0.5 * x.v + 0.5 * (it.l + it.b)) - it.l)
        |           + 0.7 * it.b
        |  FROM it JOIN idx x
        |    ON x.event_type = it.event_type AND x.i = it.t + 1)
        |SELECT it.event_type, CAST(nn.n AS BIGINT) AS n_points,
        |       CAST(FLOOR(it.l * 1e6 + 0.5) AS BIGINT) AS level_u6,
        |       CAST(FLOOR(it.b * 1e6 + 0.5) AS BIGINT) AS trend_u6,
        |       CAST(FLOOR((it.l + it.b) * 1e6 + 0.5) AS BIGINT) AS forecast_u6
        |FROM it JOIN nn ON nn.event_type = it.event_type AND it.t = nn.n
        |ORDER BY it.event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(sum(col("value").cast(DecimalType(18, 6))).cast("double").as("v"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("hr"), col("v")))).as("hv"))
        .filter(size(col("hv")) >= 2)
        .select(col("event_type"),
          expr("transform(hv, p -> p.v)").as("vals"))
        .select(col("event_type"), size(col("vals")).as("np"),
          expr("""aggregate(
            slice(vals, 2, size(vals) - 1),
            named_struct('v', element_at(vals, 1),
              'l', cast(0.0 as double), 'b', cast(0.0 as double), 'k', 1),
            (acc, x) -> IF(acc.k = 1,
              named_struct('v', x, 'l', x, 'b', x - acc.v, 'k', 2),
              named_struct('v', x,
                'l', 0.5D * x + 0.5D * (acc.l + acc.b),
                'b', 0.3D * ((0.5D * x + 0.5D * (acc.l + acc.b)) - acc.l)
                     + 0.7D * acc.b,
                'k', acc.k + 1)))""").as("st"))
        .select(col("event_type"),
          col("np").cast("long").as("n_points"),
          floor(col("st.l") * lit(1.0e6) + lit(0.5)).cast("long").as("level_u6"),
          floor(col("st.b") * lit(1.0e6) + lit(0.5)).cast("long").as("trend_u6"),
          floor((col("st.l") + col("st.b")) * lit(1.0e6) + lit(0.5))
            .cast("long").as("forecast_u6"))
        .orderBy("event_type")
    },

    // TPC-H Q5 shape (local-supplier volume): the 6-table snowflake —
    // region → nation → (customer, supplier) → orders → lineitem with
    // the c_nationkey = s_nationkey localization predicate — through
    // the raw spark.sql() surface. Catalyst broadcasts the four dims,
    // pushes the date/region filters to the scans, AQE orders the two
    // fact joins; nothing hand-scheduled. Revenue on the exact decimal
    // grid; (revenue DESC, n_name) is a total order.
    QueryDef(
      "sql_tpch_q5",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(t => Tables.load(s, d, t).createOrReplaceTempView(t))
      s.sql(
        """SELECT n_name,
          |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          |GROUP BY n_name
          |ORDER BY revenue DESC, n_name""".stripMargin)
    },

    // Classical seasonal decomposition of the hourly event-count series
    // (r12): trend = centered 24-point moving average (full windows
    // only), seasonal = per hour-of-day mean deviation, residual = the
    // rest. Partitioned by event_type so every window/aggregate shuffles
    // on a key (no SinglePartition) and the series length is bounded by
    // the TIME SPAN, not the event volume — the raw 100 TB never flows
    // through a window, only the pre-aggregated hourly counts do.
    // Exactness: integer window sums / 24.0 (IEEE-identical), seasonal
    // means over 1e-6-floor-quantized deviations (exact decimal sums).
    QueryDef(
      "ts_seasonal_decompose",
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, hr, cnt,
        |         CAST(SUM(cnt) OVER w AS DOUBLE) / 24.0 AS trend,
        |         COUNT(*) OVER w AS wn
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
        |dt AS (SELECT event_type, hr, cnt, trend, cnt - trend AS detr
        |       FROM t WHERE wn = 24),
        |seas AS (
        |  SELECT event_type, hour(hr) AS hod,
        |         CAST(SUM(CAST(FLOOR(detr * 1e6) AS DECIMAL(38,0))) AS DOUBLE)
        |           / 1e6 / COUNT(*) AS seasonal
        |  FROM dt GROUP BY 1, 2)
        |SELECT d.event_type, d.hr, d.cnt, d.trend, s.seasonal,
        |       (d.cnt - d.trend) - s.seasonal AS resid
        |FROM dt d JOIN seas s
        |  ON s.event_type = d.event_type AND s.hod = hour(d.hr)""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(-11, 12)
      val dt = hourly
        .withColumn("trend", sum("cnt").over(w).cast("double") / lit(24.0))
        .withColumn("wn", count(lit(1)).over(w))
        .filter(col("wn") === 24)
        .withColumn("detr", col("cnt") - col("trend"))
      val seas = dt
        .groupBy(col("event_type").as("et2"), hour(col("hr")).as("hod"))
        .agg((sum(floor(col("detr") * lit(1e6)).cast(DecimalType(38, 0)))
          .cast("double") / lit(1e6) / count(lit(1))).as("seasonal"))
      dt.join(seas,
          col("event_type") === col("et2") && col("hod") === hour(col("hr")))
        .select(col("event_type"), col("hr"), col("cnt"), col("trend"),
          col("seasonal"), (col("detr") - col("seasonal")).as("resid"))
    },

    // Z-order layout audit (r12): interleave 16 bits of customer key and
    // order day into a Morton code, bucket on its top 10 bits, and report
    // each bucket's row count + min/max extent in BOTH dimensions. This
    // is the write-side data-layout primitive for 100 TB scan pruning:
    // sorting/range-partitioning by zval before writing gives files whose
    // per-column min/max stats are TIGHT in custkey AND orderdate
    // simultaneously, so predicate pushdown on either column skips most
    // files (single-column sort only prunes one). The output IS the
    // audit a layout job logs: narrow extents per bucket = skippable
    // files. Pure integer bit arithmetic — identical in both engines.
    QueryDef(
      "etl_zorder_layout",
      zorderSql(spark = false)) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_zorder")
      s.sql(zorderSql(spark = true).replace("FROM orders", "FROM orders_zorder"))
    },

    // CUSUM changepoint detection (r14) — per event type, the hour
    // where the cumulative sum of mean-deviations of the hourly count
    // series peaks in magnitude (Page 1954; the level-shift detector
    // every ingest-monitoring pipeline runs). Determinism: the mean
    // is an exact decimal-sum / n double (bit-identical both engines),
    // deviations are floor-quantized to 1e-6 integers BEFORE the
    // cumulative sum, so the running sum is exact integer arithmetic —
    // a windowed double cumsum would be accumulation-order-dependent.
    // One narrow scan -> two-phase hourly aggregate -> per-type
    // windows; ~n_types rows out.
    QueryDef(
      "ts_cusum_changepoint",
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(cnt AS DECIMAL(38,0))) AS DOUBLE)
        |           / COUNT(*) AS mu,
        |         COUNT(*) AS n_hours
        |  FROM hourly GROUP BY 1),
        |cs AS (
        |  SELECT h.event_type, h.hr, m.n_hours,
        |         SUM(CAST(FLOOR((h.cnt - m.mu) * 1e6) AS BIGINT))
        |           OVER (PARTITION BY h.event_type ORDER BY h.hr) AS cq
        |  FROM hourly h JOIN m ON m.event_type = h.event_type),
        |rk AS (
        |  SELECT event_type, hr, n_hours, cq,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY ABS(cq) DESC, hr) AS rn
        |  FROM cs)
        |SELECT event_type, hr AS cp_hr,
        |       CAST(cq AS DOUBLE) / 1e6 AS cusum,
        |       CAST(CASE WHEN cq >= 0 THEN 1 ELSE -1 END AS INT) AS direction,
        |       CAST(n_hours AS BIGINT) AS n_hours
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val m = hourly.groupBy("event_type").agg(
        (sum(col("cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / count(lit(1))).as("mu"),
        count(lit(1)).as("n_hours"))
      val cs = hourly.join(m, "event_type")
        .withColumn("cq", sum(floor((col("cnt") - col("mu")) * lit(1e6))
          .cast("long")).over(
            Window.partitionBy("event_type").orderBy("hr")))
      cs.withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(abs(col("cq")).desc, col("hr"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("hr").as("cp_hr"),
          (col("cq").cast("double") / lit(1e6)).as("cusum"),
          when(col("cq") >= 0, 1).otherwise(-1).cast("int").as("direction"),
          col("n_hours"))
        .orderBy("event_type")
    },

    // Maximum drawdown of the cumulative per-user value series (r14) —
    // running-peak minus running-sum, the canonical "worst dip" window
    // composition. Same integer discipline as the CUSUM row: event
    // values floor-quantize to 1e-6 longs BEFORE the cumulative sum
    // (ties in the event order broken by event_id), so cumsum, running
    // max, and their difference are exact; only the final report
    // divides back to double. Per-user windows — node-keyed, no
    // SinglePartition anywhere.
    QueryDef(
      "ts_max_drawdown",
      """WITH q AS (
        |  SELECT user_id, ts, event_id,
        |         CAST(FLOOR(value * 1e6) AS BIGINT) AS vq
        |  FROM events WHERE value IS NOT NULL),
        |c1 AS (
        |  SELECT user_id, ts, event_id,
        |         SUM(vq) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS csum
        |  FROM q),
        |c AS (
        |  SELECT user_id, csum,
        |         MAX(csum) OVER (PARTITION BY user_id
        |                         ORDER BY ts, event_id) AS peak
        |  FROM c1),
        |d AS (
        |  SELECT user_id, MAX(peak - csum) AS ddq, COUNT(*) AS n_events
        |  FROM c GROUP BY user_id)
        |SELECT user_id, CAST(ddq AS DOUBLE) / 1e6 AS max_drawdown,
        |       CAST(n_events AS BIGINT) AS n_events
        |FROM d ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val q = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * lit(1e6)).cast("long").as("vq"))
      q.withColumn("csum", sum(col("vq")).over(w))
        .withColumn("peak", max(col("csum")).over(w))
        .groupBy("user_id")
        .agg(max(col("peak") - col("csum")).as("ddq"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"),
          (col("ddq").cast("double") / lit(1e6)).as("max_drawdown"),
          col("n_events"))
        .orderBy("user_id")
    },

    // Autocorrelation function (r14, part 2) of the hourly event-count
    // series at lags 1–3, per event_type — the seasonality/burstiness
    // probe run before picking ts_seasonal_decompose's period or an
    // anomaly window. Sample-ACF definition (biased, Box–Jenkins):
    // r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)². Exactness: the mean is a
    // ratio of exact integers; deviations/products are pure IEEE; both
    // numerator and denominator ride 1e-6-floor quantized decimal sums,
    // so the final ratio is derived from exact integers on both
    // engines. Like the decompose row, only the pre-aggregated hourly
    // series (bounded by TIME SPAN, not event volume) flows through the
    // lag windows — the raw corpus contributes one count shuffle.
    QueryDef(
      "ts_acf",
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS tot,
        |         COUNT(*) AS n
        |  FROM hourly GROUP BY event_type),
        |dv AS (
        |  SELECT h.event_type, h.hr,
        |         CAST(h.cnt AS DOUBLE) - CAST(st.tot AS DOUBLE) / st.n AS dev
        |  FROM hourly h JOIN st USING (event_type)),
        |lg AS (
        |  SELECT event_type, dev,
        |         LEAD(dev, 1) OVER (PARTITION BY event_type ORDER BY hr) AS d1,
        |         LEAD(dev, 2) OVER (PARTITION BY event_type ORDER BY hr) AS d2,
        |         LEAD(dev, 3) OVER (PARTITION BY event_type ORDER BY hr) AS d3
        |  FROM dv),
        |ag AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(FLOOR(dev * dev * 1e6) AS BIGINT)) AS BIGINT) AS den,
        |         CAST(SUM(CASE WHEN d1 IS NOT NULL THEN CAST(FLOOR(dev * d1 * 1e6) AS BIGINT) END) AS BIGINT) AS n1,
        |         CAST(SUM(CASE WHEN d2 IS NOT NULL THEN CAST(FLOOR(dev * d2 * 1e6) AS BIGINT) END) AS BIGINT) AS n2,
        |         CAST(SUM(CASE WHEN d3 IS NOT NULL THEN CAST(FLOOR(dev * d3 * 1e6) AS BIGINT) END) AS BIGINT) AS n3
        |  FROM lg GROUP BY event_type),
        |un AS (
        |  SELECT event_type, CAST(1 AS INTEGER) AS lag, n1 AS num, den FROM ag
        |  UNION ALL
        |  SELECT event_type, CAST(2 AS INTEGER) AS lag, n2 AS num, den FROM ag
        |  UNION ALL
        |  SELECT event_type, CAST(3 AS INTEGER) AS lag, n3 AS num, den FROM ag)
        |SELECT event_type, lag,
        |       CASE WHEN den = 0 OR num IS NULL THEN CAST(0 AS BIGINT)
        |            ELSE CAST(FLOOR(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |                            * 1e6 + 0.5) AS BIGINT)
        |       END AS acf6u
        |FROM un""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("hr")
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val st = hourly.groupBy("event_type")
        .agg(sum("cnt").cast("long").as("tot"), count(lit(1)).as("n"))
      val lg = hourly.join(st, "event_type")
        .withColumn("dev",
          col("cnt").cast("double") - col("tot").cast("double") / col("n"))
        .withColumn("d1", lead(col("dev"), 1).over(w))
        .withColumn("d2", lead(col("dev"), 2).over(w))
        .withColumn("d3", lead(col("dev"), 3).over(w))
      def numq(c: org.apache.spark.sql.Column) =
        sum(when(c.isNotNull, floor(col("dev") * c * lit(1e6))
          .cast(DecimalType(38, 0)))).cast("long")
      val ag = lg.groupBy("event_type").agg(
        sum(floor(col("dev") * col("dev") * lit(1e6))
          .cast(DecimalType(38, 0))).cast("long").as("den"),
        numq(col("d1")).as("n1"), numq(col("d2")).as("n2"),
        numq(col("d3")).as("n3"))
      ag.selectExpr("event_type", "den",
          "stack(3, CAST(1 AS INT), n1, CAST(2 AS INT), n2, CAST(3 AS INT), n3) AS (lag, num)")
        .select(col("event_type"), col("lag"),
          when(col("den") === 0 || col("num").isNull, lit(0L))
            .otherwise(floor(col("num").cast("double") / col("den").cast("double")
              * lit(1e6) + lit(0.5)).cast("long")).as("acf6u"))
    },

    // Cross-correlation (r14, part 2) between the hourly series of
    // every ordered event-type pair at lags -3..+3 — "does metric A
    // lead metric B, and by how much": the diagnostic behind
    // alert-correlation and leading-indicator hunts. Pearson form with
    // each series' own full mean/variance; the numerator runs over the
    // hour-ALIGNED overlap (b at a's hour + lag). All three moments
    // ride the 1e-6-floor grid (the shared scale cancels in the
    // ratio), alignment is integer epoch-hour arithmetic, and the only
    // non-rational op is IEEE sqrt — deterministic on both engines.
    // Series length is bounded by the time span; the pair×lag fan-out
    // is |types|²·7 aggregates over hour-keyed equi-joins.
    QueryDef(
      "ts_cross_corr",
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS n
        |  FROM hourly GROUP BY event_type),
        |dv AS (
        |  SELECT h.event_type,
        |         CAST(FLOOR(epoch(h.hr) / 3600) AS BIGINT) AS hb,
        |         CAST(h.cnt AS DOUBLE) - CAST(st.tot AS DOUBLE) / st.n AS dev
        |  FROM hourly h JOIN st USING (event_type)),
        |den AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(FLOOR(dev * dev * 1e6) AS BIGINT)) AS BIGINT) AS den
        |  FROM dv GROUP BY event_type),
        |lg AS (SELECT CAST(t.k - 3 AS INTEGER) AS lag FROM unnest(range(0, 7)) AS t(k)),
        |num AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, lg.lag,
        |         CAST(SUM(CAST(FLOOR(a.dev * b.dev * 1e6) AS BIGINT)) AS BIGINT) AS num
        |  FROM dv a CROSS JOIN lg JOIN dv b
        |    ON b.event_type > a.event_type AND b.hb = a.hb + lg.lag
        |  GROUP BY 1, 2, 3)
        |SELECT n.type_a, n.type_b, n.lag,
        |       CASE WHEN da.den = 0 OR db.den = 0 THEN CAST(0 AS BIGINT)
        |            ELSE CAST(FLOOR(CAST(n.num AS DOUBLE)
        |                   / (sqrt(CAST(da.den AS DOUBLE)) * sqrt(CAST(db.den AS DOUBLE)))
        |                   * 1e6 + 0.5) AS BIGINT)
        |       END AS xcorr6u
        |FROM num n
        |JOIN den da ON da.event_type = n.type_a
        |JOIN den db ON db.event_type = n.type_b""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val st = hourly.groupBy("event_type")
        .agg(sum("cnt").cast("long").as("tot"), count(lit(1)).as("n"))
      val dv = hourly.join(st, "event_type")
        .select(col("event_type"),
          floor(unix_timestamp(col("hr")) / lit(3600)).cast("long").as("hb"),
          (col("cnt").cast("double")
            - col("tot").cast("double") / col("n")).as("dev"))
        .cutLineage()
      val den = dv.groupBy("event_type")
        .agg(sum(floor(col("dev") * col("dev") * lit(1e6))
          .cast(DecimalType(38, 0))).cast("long").as("den"))
      val a = dv.withColumn("lag",
        explode(array((-3 to 3).map(k => lit(k)): _*)))
        .select(col("event_type").as("type_a"), col("hb"), col("dev").as("deva"),
          col("lag"))
      val b = dv.select(col("event_type").as("type_b"), col("hb").as("hbb"),
        col("dev").as("devb"))
      val num = a.join(b,
          col("type_b") > col("type_a") && col("hbb") === col("hb") + col("lag"))
        .groupBy("type_a", "type_b", "lag")
        .agg(sum(floor(col("deva") * col("devb") * lit(1e6))
          .cast(DecimalType(38, 0))).cast("long").as("num"))
      num
        .join(den.select(col("event_type").as("type_a"), col("den").as("dena")),
          "type_a")
        .join(den.select(col("event_type").as("type_b"), col("den").as("denb")),
          "type_b")
        .select(col("type_a"), col("type_b"), col("lag"),
          when(col("dena") === 0 || col("denb") === 0, lit(0L))
            .otherwise(floor(col("num").cast("double")
              / (sqrt(col("dena").cast("double")) * sqrt(col("denb").cast("double")))
              * lit(1e6) + lit(0.5)).cast("long")).as("xcorr6u"))
    },

    // Theil–Sen robust trend (r15): the median of all pairwise slopes
    // of the hourly count series, per event type — the breakdown-point-
    // 29% trend estimator a monitoring loop prefers over least squares
    // (one crawler outage hour cannot move it). The pair join is over
    // the HOURLY series, whose length is span-bounded (~720 points on
    // this fixture) and invariant to event volume — the same constant-
    // series law as ts_acf/ts_cross_corr — so the C(n,2) pair mass is a
    // fixed ~260k rows per type at ANY corpus scale. Slopes quantize to
    // the 1e-6 integer grid BEFORE the median (integer Δcnt over
    // integer Δhr is one IEEE division, identical cross-engine), and
    // the median is percentile_disc over BIGINTs — an actual data
    // element, exact on both engines (the evt_anomaly_mad discipline).
    QueryDef(
      "ts_theil_sen",
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |hb AS (
        |  SELECT event_type,
        |         CAST(FLOOR(epoch(hr) / 3600) AS BIGINT) AS hb, cnt
        |  FROM hourly),
        |pr AS (
        |  SELECT i.event_type,
        |         CAST(FLOOR(CAST(j.cnt - i.cnt AS DOUBLE)
        |                    / CAST(j.hb - i.hb AS DOUBLE) * 1e6 + 0.5)
        |              AS BIGINT) AS slope_u
        |  FROM hb i JOIN hb j
        |    ON i.event_type = j.event_type AND i.hb < j.hb)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_u)
        |            AS BIGINT) AS sen_slope_u
        |FROM pr GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val hb = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .select(col("event_type"),
          floor(unix_timestamp(col("hr")) / lit(3600)).cast("long").as("hb"),
          col("cnt"))
      val i = hb.select(col("event_type"), col("hb").as("hi"), col("cnt").as("ci"))
      val j = hb.select(col("event_type").as("et_j"), col("hb").as("hj"),
        col("cnt").as("cj"))
      i.join(j, col("event_type") === col("et_j") && col("hi") < col("hj"))
        .select(col("event_type"),
          floor((col("cj") - col("ci")).cast("double")
            / (col("hj") - col("hi")).cast("double") * lit(1e6) + lit(0.5))
            .cast("long").as("slope_u"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_u)")
            .cast("long").as("sen_slope_u"))
        .orderBy("event_type")
    }
  )

  /** The z-order audit SQL for either engine — ONE generator, so the
    * 32-term bit-interleave formula cannot drift between the Spark
    * query and its DuckDB oracle. Spark spells shifts as
    * shiftleft/shiftright functions; DuckDB as << / >> operators. */
  private def zorderSql(spark: Boolean): String = {
    val shl = if (spark) (e: String, n: Int) => s"shiftleft($e, $n)"
              else (e: String, n: Int) => s"($e << $n)"
    val shr = if (spark) (e: String, n: Int) => s"shiftright($e, $n)"
              else (e: String, n: Int) => s"($e >> $n)"
    val day =
      if (spark) "datediff(o_orderdate, DATE '1970-01-01')"
      else "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
    val x = "(o_custkey % 65536)"
    val y = s"($day % 65536)"
    val z = (0 until 16).map { i =>
      shl(s"(${shr(x, i)} & 1)", 2 * i) + " + " +
        shl(s"(${shr(y, i)} & 1)", 2 * i + 1)
    }.mkString(" + ")
    s"""SELECT ${shr(s"($z)", 16)} AS bucket,
       |       CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       CAST(MIN(o_custkey) AS BIGINT) AS min_cust,
       |       CAST(MAX(o_custkey) AS BIGINT) AS max_cust,
       |       CAST(MIN($day) AS BIGINT) AS min_day,
       |       CAST(MAX($day) AS BIGINT) AS max_day
       |FROM orders GROUP BY 1""".stripMargin
  }
}
