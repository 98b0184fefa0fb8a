package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling + robust-statistics operators (round 9).
  *
  * A 100 TB ingest pipeline's first job against a new drop is a PROFILE
  * (per-column null/distinct/range report) and its monitoring loop is
  * robust outlier detection (median/MAD, not mean/stddev — crawl metrics
  * are heavy-tailed). Both are declared here as oracle-paired operators:
  *
  *   - `profile_columns` derives its aggregate list from the SCHEMA at
  *     plan time (works on any table) and computes the whole report in
  *     ONE scan: a single multi-aggregate pass, then a `stack` unpivot
  *     of the one result row. No per-column scans, no collect.
  *   - `doc_source_quota` is the per-source token-budget cap (each
  *     source capped at a token quota, best-first) — the group-local
  *     sibling of `doc_token_budget_head`'s global budget. A plain
  *     window partitioned by `source` shuffles once on the natural key;
  *     at 100 TB the source cardinality grows with the corpus so no
  *     partition collapses (contrast the GLOBAL budget, which needs the
  *     GlobalRank two-pass because it has no partition key at all).
  *   - `evt_anomaly_mad` flags |x − median| > 3·1.4826·MAD per event
  *     type. Discrete percentiles (`percentile_disc` ↔ `quantile_disc`)
  *     on BOTH engines return actual data elements — sidestepping the
  *     interpolated-double hash seam documented at Core.agg_median_
  *     quantity. Two aggregate passes + one broadcast join of the
  *     3-row stats table; never a per-row sort.
  *
  * Reference precedent: samsa exposes no profiling surface (the callback
  * owns all computation, samsa/kafka/storage.py:237); these are the
  * engine-side operators a corpus team needs on day one.
  */
object ProfileQ {

  private def toks = split(col("text"), "\\s+")

  val all: Seq[QueryDef] = Seq(

    // Schema-driven one-pass table profile. The Spark side enumerates
    // t.schema at plan time — point it at ANY table and the same code
    // emits the report; the oracle spells the same aggregates by hand
    // for the documents table. min/max aggregate in the column's native
    // type and cast AFTER (numeric order, not lexicographic).
    QueryDef(
      "profile_columns",
      """WITH a AS (
        |  SELECT COUNT(*) AS n_rows,
        |         COUNT(doc_id) AS nn_doc_id, COUNT(DISTINCT doc_id) AS nd_doc_id,
        |         CAST(MIN(doc_id) AS VARCHAR) AS mn_doc_id, CAST(MAX(doc_id) AS VARCHAR) AS mx_doc_id,
        |         COUNT(text) AS nn_text, COUNT(DISTINCT text) AS nd_text,
        |         CAST(MIN(text) AS VARCHAR) AS mn_text, CAST(MAX(text) AS VARCHAR) AS mx_text,
        |         COUNT(lang) AS nn_lang, COUNT(DISTINCT lang) AS nd_lang,
        |         CAST(MIN(lang) AS VARCHAR) AS mn_lang, CAST(MAX(lang) AS VARCHAR) AS mx_lang,
        |         COUNT(source) AS nn_source, COUNT(DISTINCT source) AS nd_source,
        |         CAST(MIN(source) AS VARCHAR) AS mn_source, CAST(MAX(source) AS VARCHAR) AS mx_source,
        |         COUNT(n_chars) AS nn_n_chars, COUNT(DISTINCT n_chars) AS nd_n_chars,
        |         CAST(MIN(n_chars) AS VARCHAR) AS mn_n_chars, CAST(MAX(n_chars) AS VARCHAR) AS mx_n_chars
        |  FROM documents)
        |SELECT 'doc_id' AS column_name, n_rows, n_rows - nn_doc_id AS n_nulls,
        |       nd_doc_id AS n_distinct, mn_doc_id AS min_str, mx_doc_id AS max_str FROM a
        |UNION ALL
        |SELECT 'text', n_rows, n_rows - nn_text, nd_text, mn_text, mx_text FROM a
        |UNION ALL
        |SELECT 'lang', n_rows, n_rows - nn_lang, nd_lang, mn_lang, mx_lang FROM a
        |UNION ALL
        |SELECT 'source', n_rows, n_rows - nn_source, nd_source, mn_source, mx_source FROM a
        |UNION ALL
        |SELECT 'n_chars', n_rows, n_rows - nn_n_chars, nd_n_chars, mn_n_chars, mx_n_chars
        |FROM a""".stripMargin) { (s, d) =>
      profile(Tables.documents(s, d))
    },

    // Per-source token quota: within each source, best-first (longest,
    // doc_id tiebreak), keep while the tokens BEFORE this doc are under
    // the source's budget — the straddling doc is kept (may truncate
    // downstream), identical policy to doc_token_budget_head's global
    // form. Rides the GROUPED two-pass prefix sum (GlobalRank
    // .withGroupedCumSumBefore): `source` is LOW-cardinality, so a
    // plain Window.partitionBy(source) would put a whole source's share
    // of a 100 TB corpus in ONE task — the range partition over
    // (source, order) spreads a mega-source across partitions instead.
    QueryDef(
      "doc_source_quota",
      """WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (
        |           PARTITION BY source ORDER BY n_chars DESC, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |           AS cum_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_before, cum_before < 5000 AS keep
        |FROM c""".stripMargin) { (s, d) =>
      val quota = 5000L
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(toks).cast("long").as("n_tokens"))
      graft.operators.GlobalRank
        .withGroupedCumSumBefore(t, col("source"),
          Seq(col("n_chars").desc, col("doc_id")), col("n_tokens"),
          "cum_before")
        .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"),
          (col("cum_before") < quota).as("keep"))
    },

    // Robust per-type outlier report: median + MAD (both DISCRETE
    // quantiles → actual elements, hash-stable), outliers = values
    // beyond 3 robust sigmas (MAD·1.4826 ≈ σ for a normal tail).
    QueryDef(
      "evt_anomaly_mad",
      """WITH m AS (
        |  SELECT event_type, QUANTILE_DISC(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |j AS (
        |  SELECT e.event_type, e.value, m.med
        |  FROM events e JOIN m ON e.event_type = m.event_type),
        |st AS (
        |  SELECT event_type, med, QUANTILE_DISC(abs(value - med), 0.5) AS mad
        |  FROM j GROUP BY event_type, med)
        |SELECT j.event_type, st.med, st.mad,
        |       CAST(SUM(CASE WHEN abs(j.value - st.med) > 3.0 * 1.4826 * st.mad
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM j JOIN st ON j.event_type = st.event_type
        |GROUP BY j.event_type, st.med, st.mad""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"), col("value"))
      val m = e.groupBy("event_type")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("med"))
      val j = e.join(broadcast(m), "event_type")
      val st = j.groupBy("event_type", "med")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(value - med))")
          .as("mad"))
      j.drop("med").join(broadcast(st), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(sum(when(abs(col("value") - col("med")) >
          lit(3.0) * lit(1.4826) * col("mad"), 1L).otherwise(0L))
          .cast("long").as("n_outliers"))
    },

    // Distribution DRIFT between two snapshots (r10 part 3): the
    // population-stability index per event type over `value`, reference
    // slice = pre-cutoff events, current = post-cutoff — the monitoring
    // check a production pipeline runs before trusting a new batch
    // (PSI > 0.2 is the conventional "investigate" line). 10 equal-width
    // bins over the type's global [min, max]; Laplace-0.5-smoothed
    // shares over the PRESENT bins; PSI = Σ (q−p)·ln(q/p). Cross-engine
    // discipline: ln is transcendental, so each bin's term is
    // floor-quantized to 1e-12 LONG units BEFORE the cross-bin sum
    // (exact, order-free — the pageRank pattern) and the final PSI
    // lands on the u6 half-up grid. Scale: two full aggregates (bounds,
    // bin counts) + arithmetic on |types|·10 rows — nothing else.
    // ADVICE r10 (accepted residual risk, same class as the ln-based
    // ext_tfidf_topterms oracle): cross-engine exactness assumes JVM
    // Math.log and DuckDB ln agree to the ulp at every evaluated point —
    // both delegate to the platform libm here and the gate is green;
    // a ulp divergence could only flip a term by one 1e-12 unit, which
    // the /1e6 half-up rounding absorbs except exactly at a psi_u6
    // boundary.
    QueryDef(
      "profile_drift_psi",
      """WITH b AS (
        |  SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
        |  FROM events GROUP BY event_type),
        |e AS (
        |  SELECT ev.event_type,
        |         CASE WHEN b.vmax = b.vmin THEN 0
        |              ELSE LEAST(CAST(FLOOR((ev.value - b.vmin) /
        |                     ((b.vmax - b.vmin) / 10.0)) AS INT), 9) END AS bin,
        |         (ev.ts < TIMESTAMP '2024-01-21 00:00:00') AS is_ref
        |  FROM events ev JOIN b ON ev.event_type = b.event_type),
        |c AS (
        |  SELECT event_type, bin,
        |         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nr,
        |         SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS nc
        |  FROM e GROUP BY event_type, bin),
        |t AS (
        |  SELECT event_type, SUM(nr) AS tr, SUM(nc) AS tcur
        |  FROM c GROUP BY event_type),
        |terms AS (
        |  SELECT c.event_type,
        |         CAST(FLOOR((((c.nc + 0.5) / (t.tcur + 5.0)) -
        |                     ((c.nr + 0.5) / (t.tr + 5.0))) *
        |                    ln(((c.nc + 0.5) / (t.tcur + 5.0)) /
        |                       ((c.nr + 0.5) / (t.tr + 5.0))) * 1e12)
        |              AS BIGINT) AS u
        |  FROM c JOIN t ON c.event_type = t.event_type)
        |SELECT event_type,
        |       CAST(FLOOR(CAST(SUM(u) AS DOUBLE) / 1e6 + 0.5) AS BIGINT)
        |         AS psi_u6
        |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val b = ev.groupBy("event_type")
        .agg(min("value").as("vmin"), max("value").as("vmax"))
      val cut = lit("2024-01-21 00:00:00").cast(ev.schema("ts").dataType)
      val e = ev.join(b, "event_type")
        .select(col("event_type"),
          when(col("vmax") === col("vmin"), 0)
            .otherwise(least(floor((col("value") - col("vmin")) /
              ((col("vmax") - col("vmin")) / lit(10.0))).cast("int"), lit(9)))
            .as("bin"),
          (col("ts") < cut).as("is_ref"))
      val c = e.groupBy("event_type", "bin")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("nr"),
          sum(when(col("is_ref"), 0L).otherwise(1L)).as("nc"))
      val t = c.groupBy("event_type")
        .agg(sum("nr").as("tr"), sum("nc").as("tcur"))
      val q = (col("nc") + lit(0.5)) / (col("tcur") + lit(5.0))
      val p = (col("nr") + lit(0.5)) / (col("tr") + lit(5.0))
      c.join(t, "event_type")
        .select(col("event_type"),
          floor((q - p) * log(q / p) * lit(1.0e12)).cast("long").as("u"))
        .groupBy("event_type")
        .agg(floor(sum("u").cast("double") / lit(1.0e6) + lit(0.5))
          .cast("long").as("psi_u6"))
        .orderBy("event_type")
    },

    // Data-quality expectation suite (r14, part 3): the declarative
    // check battery (Great-Expectations shape) a pipeline gates a
    // snapshot on before publishing — range, positivity, null-rate,
    // calendar-bound, and referential-integrity checks, each reported
    // as (n_rows, n_violations, pass). One conditional-aggregation
    // scan per table plus ONE anti-join for the FK check — never a
    // per-check scan; every count exact integers.
    QueryDef(
      "profile_expectations",
      """WITH li AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 60 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
        |  FROM lineitem),
        |o AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
        |                         OR o_orderdate >= TIMESTAMP '2003-01-01 00:00:00'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_date
        |  FROM orders),
        |fk AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS v_fk
        |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |cu AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT) AS v_null
        |  FROM customer)
        |SELECT chk, n_rows, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'lineitem.quantity_in_1_60' AS chk, li.n AS n_rows, li.v_qty AS n_violations FROM li
        |  UNION ALL SELECT 'lineitem.discount_in_0_0.1', li.n, li.v_disc FROM li
        |  UNION ALL SELECT 'orders.totalprice_positive', o.n, o.v_price FROM o
        |  UNION ALL SELECT 'orders.orderdate_in_calendar', o.n, o.v_date FROM o
        |  UNION ALL SELECT 'orders.custkey_fk_customer', o.n, fk.v_fk FROM o, fk
        |  UNION ALL SELECT 'customer.acctbal_not_null', cu.n, cu.v_null FROM cu)
        |ORDER BY chk""".stripMargin) { (s, d) =>
      def cnt(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L)).cast("long")
      val li = Tables.lineitem(s, d).agg(
        count(lit(1)).cast("long").as("n"),
        cnt(col("l_quantity") < 1 || col("l_quantity") > 60).as("v_qty"),
        cnt(col("l_discount") < 0 || col("l_discount") > 0.1).as("v_disc"))
      val orders = Tables.orders(s, d)
      val o = orders.agg(
        count(lit(1)).cast("long").as("n"),
        cnt(col("o_totalprice") <= 0).as("v_price"),
        cnt(col("o_orderdate") < lit("1992-01-01").cast("timestamp")
          || col("o_orderdate") >= lit("2003-01-01").cast("timestamp"))
          .as("v_date"))
      val vFk = orders.join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).cast("long").as("v_fk"))
      val cu = Tables.customer(s, d).agg(
        count(lit(1)).cast("long").as("n"),
        (count(lit(1)) - count(col("c_acctbal"))).cast("long").as("v_null"))
      def row(name: String, one: org.apache.spark.sql.DataFrame,
          viol: String, nCol: String = "n") =
        one.select(lit(name).as("chk"), col(nCol).as("n_rows"),
          col(viol).as("n_violations"))
      row("lineitem.quantity_in_1_60", li, "v_qty")
        .unionAll(row("lineitem.discount_in_0_0.1", li, "v_disc"))
        .unionAll(row("orders.totalprice_positive", o, "v_price"))
        .unionAll(row("orders.orderdate_in_calendar", o, "v_date"))
        .unionAll(row("orders.custkey_fk_customer",
          o.crossJoin(vFk), "v_fk"))
        .unionAll(row("customer.acctbal_not_null", cu, "v_null"))
        .withColumn("pass", col("n_violations") === 0)
        .orderBy("chk")
    },

    // Equi-DEPTH histogram (r15): decile summary of o_totalprice — the
    // quantile sibling of agg_histogram_equi's fixed-width bins, and
    // the statistic a query optimizer or drift monitor actually wants
    // (equal mass per bucket, data-driven edges). The ORACLE spells
    // NTILE(10) as the global window; the Spark side derives the SAME
    // bucket ids from a GlobalRank two-pass + the closed-form
    // ntileFromRn (first n%k buckets one row larger — the standard
    // NTILE law) — no single-partition window touches the row-scaled
    // frame (the rfm/gini discipline). Ordering is total via the
    // (price, orderkey) tiebreak; sums on the exact decimal grid.
    QueryDef(
      "profile_histogram_eqdepth",
      """WITH b AS (
        |  SELECT o_totalprice AS x,
        |         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        |  FROM orders)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       MIN(x) AS lo, MAX(x) AS hi,
        |       CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sum_x
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      import graft.operators.GlobalRank
      val o = Tables.orders(s, d)
        .select(col("o_totalprice").as("x"), col("o_orderkey"))
      val (ranked, n) = GlobalRank.withGlobalRowNumber(
        o, Seq(col("x"), col("o_orderkey")), "_rn")
      ranked
        .withColumn("bucket", GlobalRank.ntileFromRn(col("_rn"), n, 10))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          min(col("x")).as("lo"), max(col("x")).as("hi"),
          graft.Det.dsum2(col("x")).as("sum_x"))
        .orderBy("bucket")
    },

    // Winsorized summary (r15): cap event values at the per-type
    // P05/P95 before aggregating — the outlier-capping sibling of
    // evt_anomaly_mad's outlier FLAGGING (a metrics pipeline winsorizes
    // before averaging so one hot row cannot own the mean). Percentiles
    // are percentile_disc — actual data elements, exact on both engines
    // (the MAD discipline); the cap is pointwise LEAST/GREATEST, and
    // the capped sum rides the exact decimal grid. Plan shape: one
    // partial-aggregable percentile pass producing a |event types|-row
    // stats table, broadcast back over one more scan — never a per-row
    // sort or global window.
    QueryDef(
      "profile_winsorize",
      """WITH st AS (
        |  SELECT event_type,
        |         percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS lo,
        |         percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS hi
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN e.value < st.lo THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_low,
        |       CAST(SUM(CASE WHEN e.value > st.hi THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_high,
        |       CAST(SUM(CAST(LEAST(GREATEST(e.value, st.lo), st.hi)
        |                     AS DECIMAL(18,2))) AS DOUBLE) AS wsum
        |FROM events e JOIN st USING (event_type)
        |WHERE e.value IS NOT NULL
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      val st = e.groupBy("event_type").agg(
        expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").as("lo"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").as("hi"))
      e.join(broadcast(st), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("value") < col("lo"), 1L).otherwise(0L))
            .cast("long").as("n_low"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L))
            .cast("long").as("n_high"),
          graft.Det.dsum2(least(greatest(col("value"), col("lo")), col("hi")))
            .as("wsum"))
        .orderBy("event_type")
    }
  )

  /** One-pass, schema-driven profile of any DataFrame: for every column,
    * (n_rows, n_nulls, n_distinct, min, max as string). Single
    * multi-aggregate scan (count-distincts plan as one Expand) unpivoted
    * with `stack` — no per-column jobs, nothing collected.
    *
    * Identifier-safe (ADVICE r9): source column names reach the plan
    * only as backtick-escaped Column references and literal labels —
    * never interpolated into parsed SQL — and the intermediate
    * aggregate aliases are positional (`nn_0`, ...), so a name with
    * spaces, dots, quotes, or reserved tokens profiles like any other
    * (ProfileSpec covers a hostile schema).
    */
  def profile(t: DataFrame): DataFrame = {
    val names = t.schema.fieldNames.toSeq
    def esc(c: String) = "`" + c.replace("`", "``") + "`"
    val aggs = names.zipWithIndex.flatMap { case (c, i) =>
      val f = col(esc(c))
      Seq(
        count(f).as(s"nn_$i"),
        count_distinct(f).as(s"nd_$i"),
        min(f).cast("string").as(s"mn_$i"),
        max(f).cast("string").as(s"mx_$i"))
    }
    val one = t.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackCols = names.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c), col("n_rows"), col("n_rows") - col(s"nn_$i"),
        col(s"nd_$i"), col(s"mn_$i"), col(s"mx_$i"))
    }
    one.select(stack((lit(names.length) +: stackCols): _*)
      .as(Seq("column_name", "n_rows", "n_nulls", "n_distinct",
        "min_str", "max_str")))
  }
}
