package graft.queries

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the filtering/reporting layer a
  * pretraining-data pipeline runs between ingest and dedup (SURVEY §2.3
  * extension surface; ref ABSENT in /root/reference). Gopher-style
  * repetition metrics (Rae et al. 2021, arXiv:2112.11446 §A1.1),
  * C4-style heuristic filters (Raffel et al. 2020, arXiv:1910.10683
  * §2.2), blocklist/PII scrubbing, per-source corpus rollups, and the
  * corpus-level n-gram report.
  *
  * Scale posture (100 TB): every per-doc metric is explode + window
  * partitioned BY doc_id (no cross-doc traffic — each doc's tokens hash
  * to one partition) followed by per-doc aggregation; the corpus n-gram
  * report is a two-phase count with a TakeOrderedAndProject top-k (k
  * rows per partition cross the wire, never the full histogram). No
  * collects, no UDFs — all codegen'd built-ins.
  */
object CurateQ {

  /** TPC-H Q1 (r15, VERDICT r14 item 7): the canonical wide-aggregate
    * shape — one scan, one low-cardinality groupBy, six exact-decimal
    * sums + three derived averages. ONE SQL text run verbatim by both
    * engines; every money sum rides the DECIMAL(24,6) grid (the
    * Det.dsum6 discipline), averages divide the exact-decimal-derived
    * double by the group count (pure IEEE, identical both sides). */
  private val SqlTpchQ1: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_price,
      |       CAST(SUM(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |       CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q19 shape (r15, VERDICT r14 item 7): disjunctive
    * OR-of-ANDs predicate mixing both join sides — the one pushdown
    * shape no other row exercises. Catalyst must (a) keep the equi
    * key (no BNLJ) and (b) derive per-side disjunctive filters via
    * extractPredicatesWithinOutputSet so both scans prune before the
    * join (pinned in PlanSpec). Clauses adapted to the fixture's
    * columns (no p_container/l_shipmode in the synthetic schema) but
    * preserve Q19's brand+size+quantity band structure. */
  private val SqlTpchQ19: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
      |       CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  /** TPC-H Q10 over the fixture's 1995–2001 date range — ONE SQL text
    * run verbatim by both engines (the q3 dual-dialect discipline). */
  private val SqlTpchQ10: String =
    """SELECT c_custkey, c_name,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
      |       c_acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q18 with the volume threshold sized to the fixture's
    * per-order quantity distribution (max ≈ 458). */
  private val SqlTpchQ18: String =
    """SELECT c_custkey, o_orderkey, o_orderdate,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      |GROUP BY c_custkey, o_orderkey, o_orderdate
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q6 over the fixture's date range (1996 window) — the pure
    * scan-side revenue forecast: every predicate must push to parquet,
    * no join, one global exact-decimal sum. */
  private val SqlTpchQ6: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
      |       CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q14 (promo revenue share) against the fixture's flat p_type
    * vocabulary ('PROMO' is a whole value, not a prefix) — conditional
    * aggregation over one month of shipments; the ratio divides two
    * exact-decimal-derived doubles (both engines: left-assoc
    * 100.0 * promo / total, pure IEEE). */
  private val SqlTpchQ14: String =
    """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
      |         ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
      |       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
      |         AS promo_revenue,
      |       CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** TPC-H Q17 shape (r16, VERDICT r15 item 4): small-quantity-order
    * revenue via a CORRELATED SCALAR AGGREGATE — the one Catalyst
    * rewrite family (`RewriteCorrelatedScalarSubquery`) no other row
    * exercised: the per-part avg-quantity subquery must decorrelate
    * into an aggregate-then-join, never a per-row re-scan (pinned in
    * PlanSpec). Fixture adaptations: p_size < 15 stands in for the
    * missing p_container; the inner avg rides the exact-decimal-sum
    * discipline so the filter boundary is engine-deterministic. */
  private val SqlTpchQ17: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / 7.0 AS avg_yearly,
      |       CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND p_size < 15
      |  AND l_quantity < (
      |    SELECT 0.5 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    FROM lineitem l2
      |    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q21 shape (r16): suppliers-who-kept-orders-waiting — the
    * nested correlated EXISTS + NOT EXISTS pair over the same fact
    * table, Catalyst's semi- AND anti-join decorrelation in ONE query
    * (each must become a join, pinned in PlanSpec). Fixture
    * adaptation: "this supplier's line failed and no co-supplier's
    * did" is expressed with l_returnflag = 'R' (the fixture has no
    * l_receiptdate/l_commitdate pair). */
  private val SqlTpchQ21: String =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND n_name = 'NATION_3'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** TPC-H Q22 shape (r16): the global-customer-insight query — an
    * UNCORRELATED scalar subquery (global average balance) feeding a
    * filter PLUS a correlated NOT EXISTS anti join, grouped by a
    * derived country code. Fixture adaptations: cntrycode is
    * c_nationkey % 5 (no c_phone column), and the anti join excludes
    * customers with FINALIZED orders (every fixture customer has some
    * order). Balance sums ride the exact-decimal discipline. */
  private val SqlTpchQ22: String =
    """SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_acctbal, c_custkey
      |  FROM customer
      |  WHERE c_nationkey % 5 IN (0, 1, 2)
      |    AND c_acctbal > (
      |      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |      FROM customer c2
      |      WHERE c2.c_acctbal > 0.00 AND c2.c_nationkey % 5 IN (0, 1, 2))) cs
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = cs.c_custkey AND o_orderstatus = 'F')
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  /** TPC-H Q4 shape (r16 part 2): priority counting — an EXISTS semi
    * join gating an aggregate over a date slice ("late line" adapted to
    * l_returnflag = 'R'; no receipt/commit dates in the fixture). */
  private val SqlTpchQ4: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q7 (volume shipping): the 6-table snowflake with a
    * SYMMETRIC two-nation disjunction and a year-extract group key —
    * nation dims broadcast twice under different aliases. */
  private val SqlTpchQ7: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
      |         l_extendedprice * (1 - l_discount) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 (market share): 8-table star through region, the
    * share-of-total conditional ratio per year. p_type = 'PROMO'
    * stands in for the fixture's flat type vocabulary. */
  private val SqlTpchQ8: String =
    """SELECT o_year,
      |       CAST(SUM(CASE WHEN nation = 'NATION_3'
      |             THEN CAST(volume AS DECIMAL(24,6))
      |             ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
      |       / CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
      |         l_extendedprice * (1 - l_discount) AS volume,
      |         n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |    AND p_type = 'PROMO') all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q13 (customer distribution): LEFT join with a join-side
    * predicate, count-of-counts histogram — the one OUTER-join
    * aggregate shape in the TPC-H set (zero-order customers must
    * survive as c_count = 0). Status filter stands in for the
    * comment LIKE. */
  private val SqlTpchQ13: String =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer
      |  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15 (top supplier): a derived revenue view consumed twice —
    * once joined, once under a scalar MAX subquery; the equality filter
    * is safe because both sides are the same exact-decimal-sum double. */
  private val SqlTpchQ15: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Whitespace tokens — same tokenizer as PipelineQ. */
  private def toks = split(col("text"), "\\s+")

  /** Blocklist + PII redaction pattern: word-boundary blocklist terms
    * plus an email matcher. Java regex and DuckDB's RE2 agree on every
    * construct used here (\b, char classes, bounded repetition) over
    * ASCII text. */
  private val redactPat =
    """\b(slow|big)\b|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  /** doc_id, pos, t — one row per token with its position. */
  private def posTokens(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "t")))

  /** doc_id + exploded DISTINCT word-3-gram shingles (the compiled UDF
    * of the dedup family — bit-identical to the DuckDB
    * list_distinct(list_transform(...)) oracle expression). */
  private def shingledAll(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(col("doc_id"),
      explode(graft.functions.TextShingles.shingle3(toks)).as("shingle"))

  private val wDoc = Window.partitionBy("doc_id").orderBy("pos")

  /** DuckDB CTE block reproducing [[graft.ext.Dedup.repeatedSpans]]
    * (k=8, minDf=2) over `src` (any relation with doc_id, text), ending
    * in `spans(doc_id, span_start, span_end, span_len)`. Shared by the
    * three span-dedup oracles and the corpus-build composite so the
    * gram/merge semantics live once.
    * Use as `WITH ${spanCtesOver(src)}[, more CTEs] SELECT ... FROM spans`. */
  private def spanCtesOver(src: String): String =
    s"""arrs AS (
      |  SELECT doc_id, string_split_regex(text, '\\s+') AS arr FROM $src),
      |g0 AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(arr) - 6),
      |           i -> array_to_string(arr[i:i+7], ' '))) AS gram,
      |         generate_subscripts(range(1, len(arr) - 6), 1) AS idx
      |  FROM arrs),
      |g AS (SELECT doc_id, gram, idx - 1 AS pos FROM g0),
      |d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
      |r AS (
      |  SELECT g.doc_id, CAST(g.pos AS BIGINT) AS s, CAST(g.pos + 7 AS BIGINT) AS e
      |  FROM g JOIN d USING (gram)),
      |m AS (
      |  SELECT doc_id, s, e,
      |         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
      |  FROM r),
      |i AS (
      |  SELECT doc_id, s, e,
      |         SUM(CASE WHEN prev_e IS NULL OR s > prev_e + 1 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY doc_id ORDER BY s
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_no
      |  FROM m),
      |spans AS (
      |  SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
      |         MAX(e) - MIN(s) + 1 AS span_len
      |  FROM i GROUP BY doc_id, span_no)""".stripMargin

  private val spanCtes = spanCtesOver("documents")

  val all: Seq[QueryDef] = Seq(

    // Gopher-style repetition metrics (arXiv:2112.11446 Table A1): the
    // fraction of the doc covered by its most frequent token, the
    // fraction of duplicate bigrams, and the longest run of one
    // repeated token. Repetitive spam scores high on all three; a
    // curation pass drops docs above thresholds. Plan: one explode,
    // two doc-partitioned windows (lag + gaps-and-islands run ids via
    // the two-row_number trick), three per-doc HashAggregates, then a
    // 3-way join on doc_id — all traffic is doc-local.
    QueryDef(
      "doc_repetition",
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(text, '\s+')) AS t,
        |         generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, t, pos,
        |         lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
        |           - ROW_NUMBER() OVER (PARTITION BY doc_id, t ORDER BY pos) AS grp
        |  FROM tok),
        |uni AS (
        |  SELECT doc_id, MAX(c) AS topc, SUM(c) AS n FROM (
        |    SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM w GROUP BY doc_id, t) GROUP BY doc_id),
        |bga AS (
        |  SELECT doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_bg,
        |         CAST(COUNT(DISTINCT prev || ' ' || t) AS BIGINT) AS n_bg_distinct
        |  FROM w WHERE prev IS NOT NULL GROUP BY doc_id),
        |runa AS (
        |  SELECT doc_id, MAX(runlen) AS max_run FROM (
        |    SELECT doc_id, t, grp, COUNT(*) AS runlen
        |    FROM w GROUP BY doc_id, t, grp) GROUP BY doc_id)
        |SELECT uni.doc_id,
        |       CAST(topc AS DOUBLE) / n AS top_unigram_frac,
        |       CAST(n_bg - n_bg_distinct AS DOUBLE) / n_bg AS dup_bigram_frac,
        |       CAST(max_run AS INT) AS max_token_run
        |FROM uni
        |JOIN bga ON uni.doc_id = bga.doc_id
        |JOIN runa ON uni.doc_id = runa.doc_id""".stripMargin) { (s, d) =>
      val w = posTokens(s, d)
        .withColumn("prev", lag("t", 1).over(wDoc))
        .withColumn("grp",
          row_number().over(wDoc)
            - row_number().over(Window.partitionBy("doc_id", "t").orderBy("pos")))
      val uni = w.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("topc"), sum("c").as("n"))
      val bga = w.filter(col("prev").isNotNull)
        .select(col("doc_id"), concat(col("prev"), lit(" "), col("t")).as("bg"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bg"), countDistinct("bg").as("n_bg_distinct"))
      val runa = w.groupBy("doc_id", "t", "grp").agg(count(lit(1)).as("runlen"))
        .groupBy("doc_id").agg(max("runlen").as("max_run"))
      uni.join(bga, "doc_id").join(runa, "doc_id")
        .select(col("doc_id"),
          (col("topc").cast("double") / col("n")).as("top_unigram_frac"),
          ((col("n_bg") - col("n_bg_distinct")).cast("double") / col("n_bg"))
            .as("dup_bigram_frac"),
          col("max_run").cast("int").as("max_token_run"))
    },

    // Blocklist + PII scrubbing: one regexp_replace pass redacts
    // blocklisted terms (word-boundary-anchored — 'slowly' survives a
    // 'slow' rule) and email-shaped PII; n_hits counts matches via
    // regex split (both engines keep leading/trailing empty fields, so
    // fields - 1 = matches). Per-row map, embarrassingly parallel.
    QueryDef(
      "doc_scrub_redact",
      """SELECT doc_id,
        |       regexp_replace(text, '\b(slow|big)\b|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[REDACTED]', 'g') AS scrubbed,
        |       CAST(len(string_split_regex(text, '\b(slow|big)\b|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS INT) AS n_hits
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_replace(col("text"), redactPat, "[REDACTED]").as("scrubbed"),
        (size(split(col("text"), redactPat)) - 1).cast("int").as("n_hits"))
    },

    // C4-style heuristic filter (arXiv:1910.10683 §2.2, adapted to the
    // fixture's token space): word-count band, mean-token-length band,
    // type-token-ratio floor, content blocklist — emitted as per-rule
    // flags plus the conjunction, so a curation run can report WHY a
    // doc dropped, not just that it did. Per-row arithmetic on the
    // token array — no shuffle at all.
    QueryDef(
      "doc_c4_filter",
      """SELECT doc_id, len_ok, tok_len_ok, ttr_ok, content_ok,
        |       (len_ok AND tok_len_ok AND ttr_ok AND content_ok) AS keep
        |FROM (
        |  SELECT doc_id,
        |         (n_tok BETWEEN 20 AND 1000) AS len_ok,
        |         (mean_len >= 3.0 AND mean_len <= 10.0) AS tok_len_ok,
        |         (ttr >= 0.2) AS ttr_ok,
        |         (NOT contains(text, 'lorem ipsum') AND NOT contains(text, '{')) AS content_ok
        |  FROM (
        |    SELECT doc_id, text,
        |           len(string_split_regex(text, '\s+')) AS n_tok,
        |           CAST(list_reduce(list_transform(string_split_regex(text, '\s+'),
        |                  x -> CAST(length(x) AS BIGINT)), (a, b) -> a + b) AS DOUBLE)
        |             / len(string_split_regex(text, '\s+')) AS mean_len,
        |           CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS DOUBLE)
        |             / len(string_split_regex(text, '\s+')) AS ttr
        |    FROM documents))""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          size(toks).as("n_tok"),
          (aggregate(transform(toks, x => length(x).cast("bigint")),
            lit(0L), (a, b) => a + b).cast("double") / size(toks)).as("mean_len"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"))
        .select(col("doc_id"),
          col("n_tok").between(20, 1000).as("len_ok"),
          (col("mean_len") >= 3.0 && col("mean_len") <= 10.0).as("tok_len_ok"),
          (col("ttr") >= 0.2).as("ttr_ok"),
          (!col("text").contains("lorem ipsum") && !col("text").contains("{"))
            .as("content_ok"))
        .withColumn("keep",
          col("len_ok") && col("tok_len_ok") && col("ttr_ok") && col("content_ok"))
    },

    // Per-source corpus rollup — the shard/provenance health report a
    // curation run emits per ingest source: volume, size profile
    // (exact-decimal mean + exact median), language mix. One
    // hash-partitioned groupBy on the source key.
    QueryDef(
      "doc_source_stats",
      """SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
        |       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(FLOOR(quantile_cont(n_chars, 0.5) * 1e6 + 0.5) AS BIGINT) AS p50_chars_u6
        |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d).groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        Det.davg2(col("n_chars")).as("avg_chars"),
        sum(when(col("lang") === "en", 1).otherwise(0)).cast("bigint").as("n_en"),
        countDistinct("lang").as("n_langs"),
        Det.u6(expr("percentile(n_chars, 0.5)")).as("p50_chars_u6"))
    },

    // Corpus-level top-k bigram report (boilerplate detector: the
    // phrases that dominate a crawl surface here). Two-phase count then
    // TakeOrderedAndProject — each partition ships only its k best
    // (count, bigram) rows, never the full histogram; the bigram
    // tiebreak makes the cut deterministic.
    QueryDef(
      "doc_top_ngrams",
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(text, '\s+')) AS t,
        |         generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
        |  FROM documents),
        |bg AS (
        |  SELECT prev || ' ' || t AS bigram FROM (
        |    SELECT t, lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |    FROM tok)
        |  WHERE prev IS NOT NULL)
        |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c
        |FROM bg GROUP BY bigram
        |ORDER BY c DESC, bigram
        |LIMIT 20""".stripMargin) { (s, d) =>
      posTokens(s, d)
        .withColumn("prev", lag("t", 1).over(wDoc))
        .filter(col("prev").isNotNull)
        .select(concat(col("prev"), lit(" "), col("t")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("bigram").asc)
        .limit(20)
    },

    // The whole curation recipe as ONE query — quality-filter (C4
    // flags) -> exact dedup (canonical = min doc_id per content
    // fingerprint) -> per-source yield report (raw / post-quality /
    // post-dedup counts). This is the funnel a corpus build reports at
    // every ingest; the DuckDB twin verifies the full composition.
    // Plan shape: per-row flags + fingerprint (narrow), ONE window
    // partitioned by fingerprint (hash-shuffle on the dedup key), one
    // groupBy(source) — exactly two shuffles at any scale.
    QueryDef(
      "doc_corpus_pipeline",
      """WITH flags AS (
        |  SELECT doc_id, source, text,
        |         ((len(string_split_regex(text, '\s+')) BETWEEN 20 AND 1000)
        |          AND (CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS DOUBLE)
        |                 / len(string_split_regex(text, '\s+')) >= 0.2)
        |          AND NOT contains(text, 'lorem ipsum')) AS keep
        |  FROM documents),
        |fp AS (
        |  SELECT doc_id, source, keep,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM flags),
        |canon AS (
        |  SELECT source, keep,
        |         (doc_id = MIN(doc_id) OVER (PARTITION BY fp)) AS is_canonical
        |  FROM fp)
        |SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_raw,
        |       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |       CAST(SUM(CASE WHEN keep AND is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_final
        |FROM canon GROUP BY source""".stripMargin) { (s, d) =>
      val flags = Tables.documents(s, d).select(
        col("doc_id"), col("source"), col("text"),
        (size(toks).between(20, 1000)
          && (size(array_distinct(toks)).cast("double") / size(toks) >= 0.2)
          && !col("text").contains("lorem ipsum")).as("keep"))
      val fp = flags.select(col("doc_id"), col("source"), col("keep"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary"))
          .as("fp"))
      val canon = fp.select(col("source"), col("keep"),
        (col("doc_id") === min("doc_id").over(Window.partitionBy("fp")))
          .as("is_canonical"))
      canon.groupBy("source").agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("keep"), 1).otherwise(0)).cast("bigint").as("n_quality"),
        sum(when(col("keep") && col("is_canonical"), 1).otherwise(0)).cast("bigint")
          .as("n_final"))
    },

    // URL parsing (crawl-pipeline staple): Spark's parse_url HOST /
    // PATH / QUERY-key extraction, cross-validated against an
    // independent regexp oracle in DuckDB. The fixture has no URL
    // column, so the URL is derived deterministically from fixture
    // columns first — the parse is the operator under test. Per-row
    // map, no shuffle.
    QueryDef(
      "fn_url",
      """SELECT doc_id, url,
        |       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |       regexp_extract(url, '^[a-z]+://[^/?]+([^?]*)', 1) AS path,
        |       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS qlang
        |FROM (
        |  SELECT doc_id,
        |         'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
        |           || '?lang=' || lang AS url
        |  FROM documents)""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id").cast("string"), lit("?lang="), col("lang")).as("url"))
        .select(col("doc_id"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("qlang"))
    },

    // Remaining portable string surface: field extraction (split_part)
    // and prefix/suffix predicates — the provenance-string parsing a
    // pipeline does on source/shard labels. Per-row map.
    QueryDef(
      "fn_string_parts",
      """SELECT doc_id,
        |       split_part(source, 'c', 1) AS src_head,
        |       split_part(source, 'c', 2) AS src_tail,
        |       starts_with(source, 'src1') AS is_src1x,
        |       ends_with(source, '0') AS ends_zero
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        split_part(col("source"), lit("c"), lit(1)).as("src_head"),
        split_part(col("source"), lit("c"), lit(2)).as("src_tail"),
        col("source").startsWith("src1").as("is_src1x"),
        col("source").endsWith("0").as("ends_zero"))
    },

    // Raw-SQL surface: every other entry declares its plan through the
    // DataFrame API; this one goes through spark.sql() over registered
    // temp views — the same SQL text (modulo the decimal-exactness
    // casts both engines share) runs on both engines, demonstrating
    // the SQL entry point end-users get. A TPC-H-Q3-shaped star join.
    QueryDef(
      "sql_passthrough_revenue",
      """SELECT o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT o_orderpriority,
          |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
          |       CAST(COUNT(*) AS BIGINT) AS n_items
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY o_orderpriority""".stripMargin)
    },

    // TPC-H Q3 shape (shipping-priority): 3-table join with date
    // predicates on BOTH join sides, aggregate, global top-10. The SQL
    // surface proof for multi-join analytics: Catalyst broadcasts the
    // filtered customer dim, both filters push to the parquet scans,
    // and AQE picks the join order — nothing hand-scheduled. Total
    // order (revenue DESC, l_orderkey) makes the LIMIT deterministic;
    // revenue is decimal-exact so the boundary compare is too.
    // (Fixture orders has no o_shippriority column — projected out.)
    QueryDef(
      "sql_tpch_q3",
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        |       o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_orderkey,
          |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
          |       o_orderdate
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
          |GROUP BY l_orderkey, o_orderdate
          |ORDER BY revenue DESC, l_orderkey
          |LIMIT 10""".stripMargin)
    },

    // TPC-H Q10 shape (r14): returned-item revenue per customer over a
    // quarter — the 4-table star with a selective fact filter. Dual-
    // dialect shared SQL; revenue rides the DECIMAL(24,6) exact-sum
    // discipline. Dims broadcast; the one shuffle is the customer-key
    // aggregate.
    QueryDef(
      "sql_tpch_q10",
      SqlTpchQ10) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(SqlTpchQ10)
    },

    // TPC-H Q18 shape (r14): large-volume orders via an IN-subquery
    // with HAVING on an exact decimal sum — the semi-join-through-
    // aggregate pattern (Catalyst plans the IN as a left-semi join on
    // the aggregated subquery, so the fact table is scanned twice but
    // never exploded).
    QueryDef(
      "sql_tpch_q18",
      SqlTpchQ18) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(SqlTpchQ18)
    },

    // TPC-H Q6 shape (r14 part 3): the forecast-revenue scan — no
    // join, every predicate (date range, discount band, quantity cap)
    // eligible for parquet pushdown, one exact-decimal global sum.
    // The canonical "is the scan path clean" probe.
    QueryDef(
      "sql_tpch_q6",
      SqlTpchQ6) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(SqlTpchQ6)
    },

    // TPC-H Q14 shape (r14 part 3): promo revenue share — conditional
    // aggregation (CASE inside SUM) over a month slice joined to the
    // part dim (broadcast at this dim size), ratio of two exact
    // decimal sums in IEEE double.
    QueryDef(
      "sql_tpch_q14",
      SqlTpchQ14) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.load(s, d, "part").createOrReplaceTempView("part")
      s.sql(SqlTpchQ14)
    },

    // TPC-H Q1 (r15): the canonical pricing-summary wide aggregate —
    // see SqlTpchQ1 scaladoc. Whole plan is scan -> partial agg ->
    // 2-key exchange -> final agg: the shape that carries any scan
    // volume (map-side combine collapses to |flag x status| rows).
    QueryDef(
      "sql_tpch_q1",
      SqlTpchQ1) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(SqlTpchQ1)
    },

    // TPC-H Q19 shape (r15): disjunctive predicate pushdown — see
    // SqlTpchQ19 scaladoc; PlanSpec pins the pushed per-side
    // disjunction and the absence of a nested-loop join.
    QueryDef(
      "sql_tpch_q19",
      SqlTpchQ19) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.load(s, d, "part").createOrReplaceTempView("part")
      s.sql(SqlTpchQ19)
    },

    // TPC-H Q17 (r16): correlated scalar aggregate — see SqlTpchQ17
    // scaladoc; PlanSpec pins the decorrelated aggregate-join.
    QueryDef(
      "sql_tpch_q17",
      SqlTpchQ17) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.load(s, d, "part").createOrReplaceTempView("part")
      s.sql(SqlTpchQ17)
    },

    // TPC-H Q21 (r16): nested EXISTS / NOT EXISTS — see SqlTpchQ21
    // scaladoc; PlanSpec pins the semi + anti join pair.
    QueryDef(
      "sql_tpch_q21",
      SqlTpchQ21) { (s, d) =>
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(SqlTpchQ21)
    },

    // TPC-H Q22 (r16): uncorrelated scalar subquery + anti join — see
    // SqlTpchQ22 scaladoc.
    QueryDef(
      "sql_tpch_q22",
      SqlTpchQ22) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(SqlTpchQ22)
    },

    // TPC-H Q4 (r16 part 2): EXISTS-gated priority counts.
    QueryDef(
      "sql_tpch_q4",
      SqlTpchQ4) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(SqlTpchQ4)
    },

    // TPC-H Q7 (r16 part 2): two-nation volume snowflake.
    QueryDef(
      "sql_tpch_q7",
      SqlTpchQ7) { (s, d) =>
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(SqlTpchQ7)
    },

    // TPC-H Q8 (r16 part 2): 8-table market-share ratio.
    QueryDef(
      "sql_tpch_q8",
      SqlTpchQ8) { (s, d) =>
      Tables.load(s, d, "part").createOrReplaceTempView("part")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.load(s, d, "region").createOrReplaceTempView("region")
      s.sql(SqlTpchQ8)
    },

    // TPC-H Q13 (r16 part 2): outer-join count-of-counts histogram.
    QueryDef(
      "sql_tpch_q13",
      SqlTpchQ13) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(SqlTpchQ13)
    },

    // TPC-H Q15 (r16 part 2): top supplier via a scalar MAX over a
    // shared derived view.
    QueryDef(
      "sql_tpch_q15",
      SqlTpchQ15) { (s, d) =>
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(SqlTpchQ15)
    },

    // Null-preserving explode (explode_outer): rows with NULL or empty
    // arrays survive as one NULL-element row — the join-back-safe
    // flatten a pipeline needs when the array is optional. Oracle is
    // DuckDB's LEFT JOIN LATERAL unnest, which has identical
    // semantics for both degenerate shapes.
    QueryDef(
      "fn_explode_outer",
      """WITH t AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN NULL
        |              WHEN doc_id % 7 = 1 THEN []
        |              ELSE string_split_regex(text, '\s+')[1:3] END AS arr
        |  FROM documents)
        |SELECT doc_id, u.tok FROM t
        |LEFT JOIN LATERAL (SELECT unnest(arr) AS tok) u ON TRUE""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, lit(null).cast("array<string>"))
            .when(col("doc_id") % 7 === 1, array().cast("array<string>"))
            .otherwise(slice(toks, 1, 3)).as("arr"))
        .select(col("doc_id"), explode_outer(col("arr")).as("tok"))
    },

    // SemDeDup (cluster-then-verify semantic dedup). r10: LAZY oracle —
    // Verify refits the deterministic k-means state and inlines the
    // centroid matrix; DuckDB reproduces the cell assignment, the
    // within-cell cosine_sim edges (same index-order folds as the
    // codegen expression) and the connected-components closure
    // (recursive CTE, the emb_dedup_exact pattern) bit-for-bit. The
    // clustering itself stays test-verified (CurateSpec plants near-dup
    // embeddings and asserts they collapse (recall), that precision is
    // exact by construction, and that the pair count is Σ|cell|² — far
    // under all-pairs). The fixture has no embedding near-dups (max
    // off-diagonal cosine ~0.5), so on raw testdata every vector is its
    // own canonical — the oracle still hash-checks assignment + edge
    // logic end to end.
    QueryDef.lazyOracle("emb_semdedup") { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val k = graft.ext.Similarity.autoNCells(emb.count())
      val (_, centroids) = graft.ext.Similarity.assignCells(emb, k)
      s"""WITH RECURSIVE ${VecOracle.assignCtes(centroids)},
         |vv AS (
         |  SELECT e.vec_id, a.cell, e.ev,
         |         sqrt(list_reduce(list_transform(e.ev,
         |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         |           (p, q) -> p + q)) AS nrm
         |  FROM e JOIN asg a USING (vec_id)),
         |pr AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM vv a JOIN vv b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_reduce(list_transform(range(1, len(a.ev) + 1),
         |          i -> CAST(a.ev[i] AS DOUBLE) * CAST(b.ev[i] AS DOUBLE)),
         |          (x, y) -> x + y)
         |        / (a.nrm * b.nrm) >= 0.9),
         |edges AS (SELECT va AS x, vb AS y FROM pr
         |          UNION ALL SELECT vb, va FROM pr),
         |reach AS (
         |  SELECT x AS node, x AS r FROM edges
         |  UNION
         |  SELECT e2.x AS node, reach.r AS r
         |  FROM edges e2 JOIN reach ON e2.y = reach.node),
         |canon AS (SELECT node, MIN(r) AS canonical_id FROM reach GROUP BY node)
         |SELECT e.vec_id,
         |       COALESCE(c.canonical_id, e.vec_id) AS canonical_id,
         |       COALESCE(c.canonical_id, e.vec_id) = e.vec_id AS is_canonical
         |FROM e LEFT JOIN canon c ON c.node = e.vec_id""".stripMargin
    } { (s, d) =>
      graft.ext.Dedup.semanticCanonical(
        Tables.embeddings(s, d).select("vec_id", "embedding"),
        threshold = 0.9) // nCells auto ∝ corpus count
    },

    // Cluster-density (prototypicality) pruning — Sorscher et al.
    // 2206.14486 data selection: drop the near-centroid `pruneFrac` of
    // each embedding cluster, keep the hard/rare tail. r10: LAZY oracle
    // (the emb_pca_project mechanism) — Verify refits the deterministic
    // k-means state (assignCells centroid means are exact quantized
    // sums since r10, so the gen run and the query run see bit-identical
    // centroids) and inlines both the raw and the unit-normalized
    // centroid matrices; DuckDB then reproduces assignment, proto score
    // (index-order dot fold), per-cell rank and the ceil-fraction keep
    // rule bit-for-bit. The TRAINING stays test-verified (CurateSpec
    // plants dense prototype + sparse outlier vectors and asserts
    // prototypes are the ones dropped, exact per-cell keep counts, and
    // that every input row appears exactly once).
    QueryDef.lazyOracle("emb_cluster_prune") { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val k = graft.ext.Similarity.autoNCells(emb.count())
      val (_, centroids) = graft.ext.Similarity.assignCells(emb, k)
      // clusterPrune's driver-side unit normalization, replicated
      val unit = centroids.map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        if (n == 0.0) c else c.map(_ / n)
      }
      s"""WITH ${VecOracle.assignCtes(centroids)},
         |${VecOracle.cellValues(unit, "uv", "uc")},
         |sc AS (
         |  SELECT a.vec_id, a.cell,
         |         ${VecOracle.dot("uc.uv", "a.u")} AS proto
         |  FROM asg a JOIN uc USING (cell)),
         |rk AS (
         |  SELECT vec_id, cell, proto,
         |         ROW_NUMBER() OVER (PARTITION BY cell
         |           ORDER BY proto DESC, vec_id) AS rk,
         |         COUNT(*) OVER (PARTITION BY cell) AS n_cell
         |  FROM sc)
         |SELECT vec_id, cell,
         |       CAST(FLOOR(proto * 1e6 + 0.5) AS BIGINT) AS proto_u6,
         |       rk > CAST(CEIL(n_cell * 0.25) AS BIGINT) AS keep
         |FROM rk""".stripMargin
    } { (s, d) =>
      graft.ext.Similarity.clusterPrune(
          Tables.embeddings(s, d).select("vec_id", "embedding"),
          pruneFrac = 0.25) // nCells auto ∝ corpus count
        .select(col("vec_id"), col("cell"),
          graft.Det.u6(col("proto_score")).as("proto_u6"), col("keep"))
    },

    // Benchmark DECONTAMINATION: flag corpus docs whose shingle overlap
    // with an eval set exceeds a threshold (the n-gram-collision test
    // every serious pretraining build runs before training; here the
    // "benchmark" is the deterministic doc_id%25=0 slice standing in
    // for an eval suite). Plan shape: shingle equi-join corpus-vs-
    // benchmark only (benchmark side is small -> broadcast at scale),
    // one count per (doc, bench) pair, one per-doc max — never
    // corpus×corpus.
    QueryDef(
      "doc_decontaminate",
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
        |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
        |           string_split_regex(text, '\s+')[i+1] || ' ' ||
        |           string_split_regex(text, '\s+')[i+2]))) AS shingle
        |  FROM documents),
        |bench AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 25 = 0),
        |corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 25 <> 0),
        |hits AS (
        |  SELECT c.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM corpus c JOIN bench b ON c.shingle = b.shingle
        |  GROUP BY c.doc_id, b.bench_id),
        |worst AS (
        |  SELECT doc_id,
        |         MAX(n_common) AS max_overlap,
        |         CAST(COUNT(*) AS BIGINT) AS n_bench_hit
        |  FROM hits GROUP BY doc_id)
        |SELECT d.doc_id,
        |       COALESCE(w.max_overlap, 0) AS max_overlap,
        |       COALESCE(w.n_bench_hit, 0) AS n_bench_hit,
        |       COALESCE(w.max_overlap, 0) >= 5 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 25 <> 0) d
        |LEFT JOIN worst w ON w.doc_id = d.doc_id""".stripMargin) { (s, d) =>
      val sh = shingledAll(s, d)
      val bench = sh.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("bench_id"), col("shingle"))
      val corpus = sh.filter(col("doc_id") % 25 =!= 0)
      val worst = corpus.join(bench, "shingle")
        .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_common"))
        .groupBy("doc_id")
        .agg(max("n_common").as("max_overlap"), count(lit(1)).as("n_bench_hit"))
      Tables.documents(s, d).filter(col("doc_id") % 25 =!= 0).select("doc_id")
        .join(worst, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("max_overlap"), lit(0L)).as("max_overlap"),
          coalesce(col("n_bench_hit"), lit(0L)).as("n_bench_hit"),
          (coalesce(col("max_overlap"), lit(0L)) >= 5).as("contaminated"))
    },

    // DSIR importance weights (Xie et al., "Data Selection for Language
    // Models via Importance Resampling", arXiv 2302.03169): score every
    // corpus doc by the log-likelihood ratio of a TARGET unigram
    // distribution vs the RAW corpus distribution over a fixed hashed
    // feature space (512 buckets, add-1 smoothing). The target is the
    // deterministic doc_id%25=0 slice standing in for a high-quality
    // exemplar corpus (same stand-in as doc_decontaminate). Docs with
    // high weight look like the target — the resampling step is then
    // doc_mixture_sample / doc_token_budget_head over this column.
    //
    // Plan shape (100 TB-safe): token explode -> ONE map-side-combinable
    // count per bucket (<=512 groups, both distributions from the same
    // pass via conditional aggregation) -> the 512-row log-ratio table
    // broadcast back onto the token stream -> per-doc exact-decimal sum.
    // No corpus-sized shuffle except the final groupBy(doc_id), which is
    // partial-aggregated. Transcendentals are grid-quantized onto
    // DECIMAL(12,6) before the sum (tfidfExactTerms discipline), so the
    // whole weight is hash-exact vs the oracle.
    QueryDef(
      "doc_dsir_weight",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5('dsir:' || t), 1, 15)) AS BIGINT) % 512 AS b
        |  FROM tok),
        |cnt AS (
        |  SELECT b,
        |         CAST(COUNT(*) AS BIGINT) AS cr,
        |         CAST(COUNT(*) FILTER (WHERE doc_id % 25 = 0) AS BIGINT) AS ct
        |  FROM tb GROUP BY b),
        |tot AS (
        |  SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
        |  FROM cnt),
        |lr AS (
        |  SELECT b,
        |         CAST(FLOOR(
        |           (ln((ct + 1.0) / (nt + 512.0)) - ln((cr + 1.0) / (nr + 512.0)))
        |           * 1e6 + 0.5) / 1e6 AS DECIMAL(12,6)) AS lr
        |  FROM cnt CROSS JOIN tot)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(CAST(ROUND(SUM(lr), 6) AS DECIMAL(20,6)) AS DOUBLE) AS dsir_w
        |FROM tb JOIN lr USING (b)
        |GROUP BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val tb = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
        .select(col("doc_id"),
          (conv(substring(md5(concat(lit("dsir:"), col("t")).cast("binary")), 1, 15), 16, 10)
            .cast("long") % 512).as("b"))
      val cnt = tb.groupBy("b").agg(
        count(lit(1)).as("cr"),
        count(when(col("doc_id") % 25 === 0, 1)).as("ct"))
      val tot = cnt.agg(sum("cr").as("nr"), sum("ct").as("nt"))
      val lr = cnt.crossJoin(broadcast(tot))
        .select(col("b"),
          graft.Det.fq6(
            log((col("ct") + lit(1.0)) / (col("nt") + lit(512.0))) -
              log((col("cr") + lit(1.0)) / (col("nr") + lit(512.0))),
            12).as("lr"))
      tb.join(broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum("lr").cast(DecimalType(20, 6)).cast("double").as("dsir_w"))
    },

    // Dedup with a QUALITY keep-policy: same near-dup closure as
    // doc_dedup_pipeline, but the kept member per duplicate group is
    // the LONGEST doc (tiebreak min id) — the policy a real corpus
    // build ships. The recursive-CTE oracle recomputes the closure AND
    // the argmax selection, so the whole policy is hash-verified.
    QueryDef(
      "doc_dedup_keep_best",
      """WITH RECURSIVE sh0 AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
        |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
        |           string_split_regex(text, '\s+')[i+1] || ' ' ||
        |           string_split_regex(text, '\s+')[i+2]))) AS shingle
        |  FROM documents),
        |df AS (SELECT shingle, COUNT(*) AS c FROM sh0 GROUP BY shingle),
        |sh AS (SELECT sh0.* FROM sh0 JOIN df USING (shingle) WHERE df.c <= 20),
        |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN n na ON na.doc_id = doc_a
        |  JOIN n nb ON nb.doc_id = doc_b
        |  WHERE CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) >= 0.5),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT a AS node, a AS r FROM edges
        |  UNION
        |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node),
        |canon AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
        |labeled AS (
        |  SELECT d.doc_id, d.n_chars AS score,
        |         COALESCE(c.comp, d.doc_id) AS group_id
        |  FROM documents d LEFT JOIN canon c ON c.node = d.doc_id)
        |SELECT doc_id, group_id, score,
        |       (ROW_NUMBER() OVER (PARTITION BY group_id
        |          ORDER BY score DESC, doc_id ASC) = 1) AS keep
        |FROM labeled""".stripMargin) { (s, d) =>
      graft.ext.Dedup.canonicalDocsKeepBest(Tables.documents(s, d))
    },

    // Similar-document retrieval ("more like this"): TF-IDF cosine
    // top-10 for query docs 0-4 over EXACT terms (VERDICT r5 item 2:
    // no_oracle -> hash-matched). Decimal-grid weights make the cosine
    // numerator and both L2 sums exact decimal; the only double ops
    // (sqrt, one multiply, one divide) are IEEE-identical in both
    // engines. Ties break on cid via row_number, so top-10 is
    // deterministic. The broadcast-query bounded-heap spark.ml variant
    // (Similarity.similarDocsTopK) remains the 2^18-hashed scale path,
    // recall-tested in ExtSpec.
    QueryDef(
      "ext_similar_docs",
      s"""WITH ${graft.ext.Similarity.tfidfExactTermsSql},
        |l2 AS (
        |  SELECT doc_id,
        |         sqrt(CAST(CAST(ROUND(SUM(w * w), 6) AS DECIMAL(20,6)) AS DOUBLE)) AS l2
        |  FROM w GROUP BY doc_id),
        |num AS (
        |  SELECT a.doc_id AS qid, b.doc_id AS cid,
        |         CAST(CAST(ROUND(SUM(a.w * b.w), 6) AS DECIMAL(20,6)) AS DOUBLE) AS num
        |  FROM w a JOIN w b ON a.t = b.t AND a.doc_id <> b.doc_id
        |  WHERE a.doc_id IN (0, 1, 2, 3, 4)
        |  GROUP BY 1, 2),
        |cosv AS (
        |  SELECT qid, cid, num / (ql.l2 * cl.l2) AS cos
        |  FROM num
        |  JOIN l2 ql ON ql.doc_id = qid
        |  JOIN l2 cl ON cl.doc_id = cid
        |  WHERE ql.l2 > 0 AND cl.l2 > 0)
        |SELECT qid, cid, cos FROM (
        |  SELECT qid, cid, cos,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        |  FROM cosv)
        |WHERE rk <= 10""".stripMargin) { (s, d) =>
      val w = graft.ext.Similarity.tfidfExactTerms(Tables.documents(s, d))
      val l2 = graft.ext.Similarity.tfidfExactL2(w)
      // query side = 5 docs' terms -> broadcast; corpus streams once
      val q = w.filter(col("doc_id").isin(0L, 1L, 2L, 3L, 4L))
        .select(col("doc_id").as("qid"), col("t"), col("w").as("wq"))
      val num = broadcast(q)
        .join(w.select(col("doc_id").as("cid"), col("t"), col("w").as("wc")), Seq("t"))
        .filter(col("qid") =!= col("cid"))
        .groupBy("qid", "cid")
        .agg(graft.ext.Similarity.decimalSum6(col("wq") * col("wc")).as("num"))
      val ql = l2.select(col("doc_id").as("qid"), col("l2").as("l2q"))
      val cl = l2.select(col("doc_id").as("cid"), col("l2").as("l2c"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("cid"))
      num.join(broadcast(ql), "qid").join(cl, "cid")
        .filter(col("l2q") > 0 && col("l2c") > 0)
        .withColumn("cos", col("num") / (col("l2q") * col("l2c")))
        .withColumn("rk", row_number().over(win))
        .filter(col("rk") <= 10)
        .select("qid", "cid", "cos")
        .orderBy("qid", "cid")
    },

    // Incremental EMBEDDING near-dup ingest — the vector twin of
    // doc_incremental_neardups: batch-vs-corpus LSH bucket join, exact
    // cosine verify, candidates only BETWEEN the sides. The fixture has
    // no embedding near-dups, so the batch re-ingests every 10th vector
    // with small seeded noise (near-dups by construction, the
    // deployment's re-crawl shape); DedupSpec asserts full recall on
    // the planted set and zero matches for a decorrelated batch.
    // r10: LAZY oracle — the incoming batch is deterministic (per-id
    // seeded noise), so Verify materializes its 50 vectors and inlines
    // them as exact literals alongside the seed-42 planes; DuckDB then
    // reproduces both sides' m-wide wrapped-long bucket keys
    // (VecOracle.brpBucketCtes), the cross-side candidate join and the
    // cosine-verified (vec_corpus, vec_new, cos) matches bit-for-bit.
    QueryDef.lazyOracle("emb_incremental_neardups") { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val m = graft.ext.Similarity.autoHashesPerTable(emb.count())
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val planes = graft.ext.Similarity.lshPlanes(dim, 12, m)
      val batchRows = curateNoisyBatch(emb, 10, 5000000L).collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
        .sortBy(_._1)
      s"""WITH ${VecOracle.brpPlanesValues(planes)},
         |corp AS (SELECT vec_id, embedding AS ev FROM embeddings),
         |bat AS (SELECT CAST(vid AS BIGINT) AS vec_id, ev FROM (VALUES
         |    ${VecOracle.vecValues(batchRows)}) AS _b(vid, ev)),
         |${VecOracle.brpBucketCtes("corp", 0.15, "c")},
         |${VecOracle.brpBucketCtes("bat", 0.15, "n")},
         |cand AS (
         |  SELECT DISTINCT c.vec_id AS vec_corpus, n.vec_id AS vec_new
         |  FROM cbk c JOIN nbk n ON c.tbl = n.tbl AND c.h = n.h),
         |${VecOracle.normCte("corp", "cvv")},
         |${VecOracle.normCte("bat", "nvv")}
         |SELECT vec_corpus, vec_new, cos FROM (
         |  SELECT cand.vec_corpus, cand.vec_new,
         |         ${VecOracle.cosExpr("a2", "b3")} AS cos
         |  FROM cand JOIN cvv a2 ON a2.vec_id = cand.vec_corpus
         |            JOIN nvv b3 ON b3.vec_id = cand.vec_new)
         |WHERE cos >= 0.9""".stripMargin
    } { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      graft.ext.Dedup.incrementalCosineNearDups(
        emb, curateNoisyBatch(emb, 10, 5000000L))
    },

    // SEMANTIC decontamination — the embedding-space twin of
    // doc_decontaminate (the n-gram form): flag corpus vectors whose
    // cosine to ANY eval-suite vector clears the threshold, the check
    // modern corpus builds run alongside n-gram overlap (paraphrased
    // benchmark leakage survives n-gram matching but not embedding
    // similarity). Eval slice = the deterministic vec_id%25=0 stand-in
    // (same convention as doc_decontaminate/doc_dsir_weight). The
    // fixture has no embedding near-dups (max offdiag cosine ~0.5), so
    // the corpus side re-plants noisy copies of eval vectors —
    // contaminated by construction; CurateSpec asserts exactly those
    // are flagged. Plan shape (100 TB-safe): the SMALL eval side owns
    // the LSH bucket table (broadcasts under AQE); the corpus-sized
    // side streams through the bucket equi-join — candidates only
    // BETWEEN sides, never corpus x corpus.
    // r10: LAZY oracle — eval slice and planted noisy replicas are both
    // deterministic, so Verify inlines the 20 noisy corpus rows + the
    // seed-42 planes (AND-width rides the EVAL side count, the small
    // side that owns the buckets) and DuckDB reproduces the eval-vs-
    // corpus candidate join, cosine verify, per-doc max/argmin and the
    // contaminated flag bit-for-bit.
    QueryDef.lazyOracle("emb_decontaminate") { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val evalSet = emb.filter(col("vec_id") % 25 === 0)
      val m = graft.ext.Similarity.autoHashesPerTable(evalSet.count())
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val planes = graft.ext.Similarity.lshPlanes(dim, 12, m)
      val noisyRows = curateNoisy(evalSet.limit(40), 7000000L).collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
        .sortBy(_._1)
      s"""WITH ${VecOracle.brpPlanesValues(planes)},
         |ev2 AS (SELECT vec_id, embedding AS ev FROM embeddings
         |        WHERE vec_id % 25 = 0),
         |corp AS (SELECT vec_id, embedding AS ev FROM embeddings
         |         WHERE vec_id % 25 <> 0
         |         UNION ALL
         |         SELECT CAST(vid AS BIGINT) AS vec_id, ev FROM (VALUES
         |    ${VecOracle.vecValues(noisyRows)}) AS _n(vid, ev)),
         |${VecOracle.brpBucketCtes("ev2", 0.15, "c")},
         |${VecOracle.brpBucketCtes("corp", 0.15, "n")},
         |cand AS (
         |  SELECT DISTINCT c.vec_id AS vec_corpus, n.vec_id AS vec_new
         |  FROM cbk c JOIN nbk n ON c.tbl = n.tbl AND c.h = n.h),
         |${VecOracle.normCte("ev2", "cvv")},
         |${VecOracle.normCte("corp", "nvv")},
         |hits AS (
         |  SELECT vec_new AS vec_id, MAX(cos) AS max_cos,
         |         MIN(vec_corpus) AS nearest_eval
         |  FROM (
         |    SELECT cand.vec_corpus, cand.vec_new,
         |           ${VecOracle.cosExpr("a2", "b3")} AS cos
         |    FROM cand JOIN cvv a2 ON a2.vec_id = cand.vec_corpus
         |              JOIN nvv b3 ON b3.vec_id = cand.vec_new)
         |  WHERE cos >= 0.9 GROUP BY vec_new)
         |SELECT corp.vec_id, hits.max_cos, hits.nearest_eval,
         |       hits.max_cos IS NOT NULL AS contaminated
         |FROM corp LEFT JOIN hits ON hits.vec_id = corp.vec_id""".stripMargin
    } { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val evalSet = emb.filter(col("vec_id") % 25 === 0)
      val corpus = emb.filter(col("vec_id") % 25 =!= 0)
        .union(curateNoisy(evalSet.limit(40), 7000000L))
      val hits = graft.ext.Dedup
        .incrementalCosineNearDups(evalSet, corpus, threshold = 0.9)
        .groupBy(col("vec_new").as("vec_id"))
        .agg(max("cos").as("max_cos"),
          min("vec_corpus").as("nearest_eval"))
      corpus.select("vec_id").join(hits, Seq("vec_id"), "left")
        .select(col("vec_id"), col("max_cos"), col("nearest_eval"),
          col("max_cos").isNotNull.as("contaminated"))
    },

    // SEQUENCE PACKING (r7 new surface): assign each document a slot in
    // a fixed-token-budget training sequence — the assembly step every
    // LLM pretraining pipeline runs between curation and tokenization.
    // Sequential-fill packing by doc_id: seq_id = tokens-before-me div
    // budget, seq_offset = tokens-before-me mod budget, plus a
    // boundary-straddle flag (the docs a packer must split or pad
    // around). The global prefix sum is the classic scale trap — an
    // unpartitioned running-total window — so the engine side rides
    // operators/GlobalRank.withGlobalCumSumBefore (range partition →
    // P-way local cumsum → broadcast offsets), the same two-pass shape
    // that fixed win_ntile_percent. Oracle: DuckDB's global window (the
    // oracle only needs to be correct, not scale).
    // QUALITY-THRESHOLD GATE (r7): keep the top quartile of the corpus
    // by a quality score — the "train on the best X%" cut every corpus
    // build makes. Rank-based (not value-percentile) so the kept count
    // is exactly n/4 regardless of score ties, deterministic via the
    // doc_id tiebreak, and exactly oracle-expressible (interpolated
    // percentile thresholds invite cross-engine float drift; the
    // rank form is pure integers). Global order rides the same
    // scale-safe GlobalRank two-pass as win_ntile_percent; the
    // documented approximate scale variant is approx_percentile on the
    // score with a broadcast threshold.
    QueryDef(
      "doc_quality_threshold",
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rn,
        |         COUNT(*) OVER () AS n
        |  FROM documents)
        |SELECT doc_id, n_chars, rn <= n // 4 AS keep
        |FROM r""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "n_chars")
      val (ranked, n) = graft.operators.GlobalRank.withGlobalRowNumber(
        docs, Seq(col("n_chars").desc, col("doc_id")), "_rn")
      ranked.select(col("doc_id"), col("n_chars"),
        (col("_rn") <= lit(n / 4)).as("keep"))
    },

    // SPAN-LEVEL substring dedup (r8, VERDICT item 1): token spans
    // repeated across >= 2 documents — rolling 8-gram offsets, corpus
    // df per gram (one map-side-combinable aggregate, NO self-join),
    // doc-local maximal-span merge (gaps-and-islands windows, all
    // partitioned by doc_id). The DuckDB twin recomputes the whole
    // composition: gram explode with offsets, df HAVING, the same
    // interval-merge windows — hash-verified end to end.
    QueryDef(
      "doc_span_dedup",
      s"""WITH $spanCtes
        |SELECT doc_id, span_start, span_end, span_len FROM spans""".stripMargin) { (s, d) =>
      graft.ext.Dedup.repeatedSpans(Tables.documents(s, d), k = 8, minDf = 2)
        .orderBy("doc_id", "span_start")
    },

    // Span COVERAGE + drop policy (r8): the decision step after span
    // detection — how much of each doc is corpus-repeated boilerplate,
    // and which docs are mostly boilerplate (coverage >= 0.5 -> drop
    // whole doc rather than cut). Spans are disjoint by construction,
    // so covered = SUM(span_len) exactly. Adds one doc-keyed aggregate
    // + a left join to the span pipeline — same shuffle keys.
    QueryDef(
      "doc_span_coverage",
      s"""WITH $spanCtes,
        |cov AS (SELECT doc_id, SUM(span_len) AS covered FROM spans GROUP BY doc_id),
        |tot AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT tot.doc_id, n_tokens,
        |       CAST(COALESCE(covered, 0) AS BIGINT) AS covered_tokens,
        |       CAST(COALESCE(covered, 0) AS DOUBLE) / n_tokens AS coverage_frac,
        |       CAST(COALESCE(covered, 0) AS DOUBLE) / n_tokens >= 0.5 AS drop_doc
        |FROM tot LEFT JOIN cov ON tot.doc_id = cov.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cov = graft.ext.Dedup.repeatedSpans(docs, k = 8, minDf = 2)
        .groupBy("doc_id").agg(sum("span_len").as("covered"))
      docs.select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("covered"), lit(0L)).as("covered_tokens"),
          (coalesce(col("covered"), lit(0L)).cast("double") / col("n_tokens"))
            .as("coverage_frac"),
          (coalesce(col("covered"), lit(0L)).cast("double") / col("n_tokens") >= 0.5)
            .as("drop_doc"))
    },

    // Span CUT (r8): apply the spans — emit each doc's text with every
    // corpus-repeated span removed (the Lee-et-al. ExactSubstr action:
    // cut the substring, keep the doc). Token-level reconstruction:
    // tokens anti-joined against their doc's span ranges (equi on
    // doc_id + range predicate — doc-local fan-out, spans per doc are
    // few), then an ordered within-group concat (listagg / string_agg
    // ORDER BY pos — deterministic in both engines). Docs whose every
    // token is covered vanish from the token side, so the left join
    // from documents restores them with empty text.
    QueryDef(
      "doc_span_cut",
      s"""WITH $spanCtes,
        |tok AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(text, '\\s+')) AS t,
        |         generate_subscripts(string_split_regex(text, '\\s+'), 1) - 1 AS pos
        |  FROM documents),
        |kept AS (
        |  SELECT tok.doc_id, tok.t, tok.pos FROM tok
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM spans
        |    WHERE spans.doc_id = tok.doc_id
        |      AND tok.pos BETWEEN spans.span_start AND spans.span_end)),
        |agg AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS clean_text,
        |         CAST(COUNT(*) AS BIGINT) AS n_tokens_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |       COALESCE(agg.clean_text, '') AS clean_text,
        |       COALESCE(agg.n_tokens_kept, 0) AS n_tokens_kept
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin) { (s, d) =>
      // r21 (guide §2.4): the cut is MAP-ONLY — spans collected per doc
      // (span-sized aggregate, broadcast join) and applied by the
      // compiled sweep UDF, instead of exploding every token through a
      // doc_id exchange and re-assembling with a sort-based listagg.
      // Output bit-identical (TextSpans scaladoc); oracle unchanged.
      val docs = Tables.documents(s, d)
      val spanArr = graft.ext.Dedup.repeatedSpans(docs, k = 8, minDf = 2)
        .groupBy("doc_id")
        .agg(collect_list(struct(col("span_start"), col("span_end"))).as("sp"))
      docs.select(col("doc_id"), toks.as("arr"))
        .join(spanArr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          graft.functions.TextSpans.cutSpans(col("arr"), col("sp")).as("c"))
        .select(col("doc_id"), col("c.clean_text").as("clean_text"),
          col("c.n_tokens_kept").as("n_tokens_kept"))
    },

    // The WHOLE corpus-build recipe as one call (r8,
    // ext/CorpusBuild): quality filter -> span-cut/drop -> exact dedup
    // -> LSH-verified near-dup dedup -> sequence packing. Output = the
    // funnel report (one row). Oracle-paired since r15 (VERDICT r14
    // item 3): the SQL composes the already-green stage oracles —
    // quality bounds, spanCtesOver the quality subset, the
    // doc_span_cut token anti-join, normalized-text exact dedup, and
    // the doc_lsh_verified_dedup MinHash/band/verify/closure block —
    // into one end-to-end funnel, so the COMPOSITION is hash-checked,
    // not just each stage. (n_packed = survivor count by construction:
    // packing assigns seq ids, it never drops a doc.) The composition
    // invariants (monotone funnel, unique survivors, packing bounds,
    // determinism) remain asserted in CorpusBuildSpec.
    QueryDef(
      "pipeline_corpus_build",
      s"""WITH RECURSIVE qdocs AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE len(string_split_regex(text, '\\s+')) BETWEEN 20 AND 1000
        |    AND CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS DOUBLE)
        |        / len(string_split_regex(text, '\\s+')) >= CAST(0.2 AS DOUBLE)),
        |${spanCtesOver("qdocs")},
        |cov AS (SELECT doc_id, SUM(span_len) AS covered
        |        FROM spans GROUP BY doc_id),
        |keptdocs AS (
        |  SELECT q.doc_id FROM qdocs q LEFT JOIN cov ON cov.doc_id = q.doc_id
        |  WHERE CAST(COALESCE(cov.covered, 0) AS DOUBLE)
        |        / len(string_split_regex(q.text, '\\s+')) < CAST(0.5 AS DOUBLE)),
        |tok AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(text, '\\s+')) AS t,
        |         generate_subscripts(string_split_regex(text, '\\s+'), 1) - 1 AS pos
        |  FROM qdocs),
        |kept AS (
        |  SELECT tok.doc_id, tok.t, tok.pos FROM tok
        |  JOIN keptdocs kd ON kd.doc_id = tok.doc_id
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM spans
        |    WHERE spans.doc_id = tok.doc_id
        |      AND tok.pos BETWEEN spans.span_start AND spans.span_end)),
        |cutagg AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS text
        |  FROM kept GROUP BY doc_id),
        |cut AS (
        |  SELECT kd.doc_id, COALESCE(c.text, '') AS text
        |  FROM keptdocs kd LEFT JOIN cutagg c ON c.doc_id = kd.doc_id),
        |exact AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |           MIN(doc_id) OVER (PARTITION BY lower(trim(text))) AS cn
        |    FROM cut) WHERE doc_id = cn),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(string_split_regex(text, '\\s+')) - 1, 1)),
        |      i -> string_split_regex(text, '\\s+')[i] || ' ' ||
        |           string_split_regex(text, '\\s+')[i+1] || ' ' ||
        |           string_split_regex(text, '\\s+')[i+2]))) AS shingle
        |  FROM exact),
        |base AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
        |           % 2147483647 AS h0
        |  FROM sh),
        |mins AS (
        |  SELECT doc_id,
        |         MIN((1 * h0 + 0) % 2147483647) AS m0,
        |         MIN((2 * h0 + 999999937) % 2147483647) AS m1,
        |         MIN((3 * h0 + 1999999874) % 2147483647) AS m2,
        |         MIN((4 * h0 + 852516164) % 2147483647) AS m3,
        |         MIN((5 * h0 + 1852516101) % 2147483647) AS m4,
        |         MIN((6 * h0 + 705032391) % 2147483647) AS m5,
        |         MIN((7 * h0 + 1705032328) % 2147483647) AS m6,
        |         MIN((8 * h0 + 557548618) % 2147483647) AS m7
        |  FROM base GROUP BY doc_id),
        |sig AS (
        |            SELECT doc_id, 0 AS band, m0 AS b0, m1 AS b1 FROM mins
        |  UNION ALL SELECT doc_id, 1 AS band, m2 AS b0, m3 AS b1 FROM mins
        |  UNION ALL SELECT doc_id, 2 AS band, m4 AS b0, m5 AS b1 FROM mins
        |  UNION ALL SELECT doc_id, 3 AS band, m6 AS b0, m7 AS b1 FROM mins),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sig a JOIN sig b
        |    ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
        |       AND a.doc_id < b.doc_id),
        |nsh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        |        FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.doc_a
        |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        |  GROUP BY c.doc_a, c.doc_b),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN nsh na ON na.doc_id = doc_a
        |  JOIN nsh nb ON nb.doc_id = doc_b
        |  WHERE CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common)
        |        >= CAST(0.5 AS DOUBLE)),
        |nedges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |           UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT a AS node, a AS r FROM nedges
        |  UNION
        |  SELECT e.a AS node, reach.r AS r
        |  FROM nedges e JOIN reach ON e.b = reach.node),
        |canon AS (SELECT node, MIN(r) AS canonical_id FROM reach GROUP BY node),
        |dropset AS (SELECT node FROM canon WHERE canonical_id <> node),
        |surv AS (
        |  SELECT e.doc_id FROM exact e
        |  WHERE NOT EXISTS (SELECT 1 FROM dropset x WHERE x.node = e.doc_id))
        |SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_raw,
        |       CAST((SELECT COUNT(*) FROM qdocs) AS BIGINT) AS n_quality,
        |       CAST((SELECT COUNT(*) FROM keptdocs) AS BIGINT) AS n_after_span,
        |       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
        |       CAST((SELECT COUNT(*) FROM surv) AS BIGINT) AS n_neardup,
        |       CAST((SELECT COUNT(*) FROM surv) AS BIGINT) AS n_packed"""
        .stripMargin) { (s, d) =>
      import s.implicits._
      // r21 (guide §1.2): n_packed == n_neardup BY CONSTRUCTION (packing
      // assigns sequence ids, it never drops a doc — CorpusBuildSpec
      // asserts it), and the row's own DuckDB oracle encodes the same
      // identity (`(SELECT COUNT(*) FROM surv) AS n_packed`). Counting
      // the packed frame here paid GlobalRank's two-pass prefix sum
      // (range exchange + cache + driver collect + final count job)
      // only to re-derive a number stage 4 already produced. runReport
      // skips stage 5 entirely; output row unchanged bit-for-bit.
      val r = graft.ext.CorpusBuild.runReport(Tables.documents(s, d))
      graft.ext.Caches.releaseAll(s)
      Seq((r.nRaw, r.nQuality, r.nAfterSpanPolicy, r.nExactCanonical,
        r.nNearDupCanonical, r.nNearDupCanonical))
        .toDF("n_raw", "n_quality", "n_after_span", "n_exact", "n_neardup",
          "n_packed")
    },

    // Document CHUNKING (r8): fixed-size overlapping token windows —
    // the prep step before embedding long documents (chunk 128 tokens,
    // stride 96 -> 32-token overlap so no boundary sentence is lost).
    // Chunk starts at every stride multiple below n_tokens; the last
    // chunk may be short. Pure narrow map (explode over a per-doc
    // sequence) — NO shuffle at all; both engines clamp the trailing
    // slice identically.
    QueryDef(
      "doc_chunk",
      """WITH a AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS arr FROM documents),
        |c AS (
        |  SELECT doc_id, arr,
        |         unnest(range(0, (len(arr) - 1) // 96 + 1)) AS chunk_id
        |  FROM a)
        |SELECT doc_id,
        |       CAST(chunk_id AS BIGINT) AS chunk_id,
        |       CAST(chunk_id * 96 AS BIGINT) AS chunk_start,
        |       CAST(len(arr[chunk_id*96+1 : chunk_id*96+128]) AS BIGINT) AS n_chunk_tokens,
        |       array_to_string(arr[chunk_id*96+1 : chunk_id*96+128], ' ') AS chunk_text
        |FROM c""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("arr"))
        .select(col("doc_id"), col("arr"),
          posexplode(expr("sequence(0, (size(arr) - 1) div 96)"))
            .as(Seq("p", "chunk_id")))
        .select(col("doc_id"),
          col("chunk_id").cast("long").as("chunk_id"),
          (col("chunk_id") * 96).cast("long").as("chunk_start"),
          size(slice(col("arr"), col("chunk_id") * 96 + 1, lit(128)))
            .cast("long").as("n_chunk_tokens"),
          array_join(slice(col("arr"), col("chunk_id") * 96 + 1, lit(128)), " ")
            .as("chunk_text"))
    },

    // Domain MIXTURE sampling (r8): per-source keep rates — the
    // data-mixing step that reweights domains before training (e.g.
    // downsample low-quality crawl sources, keep curated ones whole).
    // Hash-based like doc_sample_stratified, with a stage salt
    // ('mix:') so this stage's keep decisions are independent of the
    // language-rebalancing stage's (same doc, different coin). Narrow
    // filter over the scan — no shuffle.
    QueryDef(
      "doc_mixture_sample",
      """SELECT doc_id, source FROM documents
        |WHERE CAST(concat('0x', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
        |      < CASE WHEN ends_with(source, '0') THEN 20 ELSE 80 END""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(
          pmod(expr(
            "cast(conv(substring(md5(cast(concat('mix:', cast(doc_id AS string)) AS binary)), 1, 15), 16, 10) AS bigint)"),
            lit(100L))
          < when(col("source").endsWith("0"), 20).otherwise(80))
        .select("doc_id", "source").orderBy("doc_id")
    },

    // Temperature-flattened SOURCE sampling (r9): the multilingual-
    // pretraining rebalance (Conneau et al. XLM-R, arXiv 1911.02116
    // §3.1; UniMax, Chung et al. 2304.09151) — downsample dominant
    // sources toward p_s^alpha so small sources aren't drowned.
    // alpha = 0.5, so the acceptance rate has a closed sqrt form:
    // r_s = sqrt(n_min / n_s) (the rarest source keeps everything) —
    // and sqrt is IEEE-754 correctly rounded in BOTH engines, unlike
    // pow, so the rate (floored onto a 1e6 integer grid) is hash-exact
    // cross-engine. Keep decision is the usual deterministic hash coin
    // (md5, fresh 'temp:' salt — independent of every other stage's
    // coins). Plan shape (100 TB-safe): per-source counts are ONE
    // map-side-combinable agg (<=K rows); the rate table broadcasts
    // back onto the corpus — no corpus-sized shuffle at all.
    QueryDef(
      "doc_mixture_temperature",
      """WITH c AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT source, n_s,
        |         CAST(FLOOR(sqrt(CAST((SELECT MIN(n_s) FROM c) AS DOUBLE) / n_s) * 1000000) AS BIGINT) AS keep_ppm
        |  FROM c)
        |SELECT d.doc_id, d.source, r.keep_ppm,
        |       CAST(concat('0x', substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
        |         < r.keep_ppm AS keep
        |FROM documents d JOIN r USING (source)""".stripMargin) { (s, d) =>
      val c = Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_s"))
      val nMin = c.agg(min("n_s").as("n_min"))
      val r = c.crossJoin(broadcast(nMin))
        .select(col("source"), col("n_s"),
          floor(sqrt(col("n_min").cast("double") / col("n_s")) * 1000000)
            .cast("long").as("keep_ppm"))
      Tables.documents(s, d).select("doc_id", "source")
        .join(broadcast(r.drop("n_s")), "source")
        .select(col("doc_id"), col("source"), col("keep_ppm"),
          (pmod(expr(
            "cast(conv(substring(md5(cast(concat('temp:', cast(doc_id AS string)) AS binary)), 1, 15), 16, 10) AS bigint)"),
            lit(1000000L)) < col("keep_ppm")).as("keep"))
    },

    // Global training-order SHUFFLE (r9): the deterministic
    // pseudo-random permutation the assembly step writes shards in —
    // decorrelates curriculum from ingest order (adjacent crawl docs
    // are correlated; training wants them scattered). Hash-order, not
    // RNG (same rationale as doc_sample_stratified): md5('shuf:'||id)
    // is reproducible across engines/sessions/retries and independent
    // of the sampling stages' coins (different salt). The global rank
    // over the hash ordering rides the scale-safe GlobalRank two-pass
    // (range partition by hash -> P-way local row_number -> P-row
    // offset broadcast) — never a single-partition window.
    QueryDef(
      "doc_shuffle_order",
      """SELECT doc_id,
        |       CAST(ROW_NUMBER() OVER (
        |         ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |         AS shuffle_rank
        |FROM documents""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d).select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast("string")).cast("binary")).as("_h"))
      val (ranked, _) = graft.operators.GlobalRank.withGlobalRowNumber(
        t, Seq(col("_h"), col("doc_id")), "_rn")
      ranked.select(col("doc_id"), col("_rn").cast("long").as("shuffle_rank"))
    },

    // Token-budget curriculum HEAD (r8): take documents in quality
    // order (longest-first proxy, deterministic tiebreak) until the
    // cumulative token budget is spent — the "train on the best N
    // tokens" cut. The global prefix sum over a NON-key ordering rides
    // the same scale-safe GlobalRank two-pass as doc_pack_sequences;
    // keep = tokens-before-me < budget, so exactly the head that fits
    // (the straddling doc is kept and may be truncated downstream).
    QueryDef(
      "doc_token_budget_head",
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT doc_id, n_tokens, cum_before, cum_before < 20000 AS keep
        |FROM c""".stripMargin) { (s, d) =>
      val budget = 20000L
      val t = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
        size(toks).cast("long").as("n_tokens"))
      graft.operators.GlobalRank
        .withGlobalCumSumBefore(t,
          Seq(col("n_chars").desc, col("doc_id")), col("n_tokens"), "cum_before")
        .select(col("doc_id"), col("n_tokens"), col("cum_before"),
          (col("cum_before") < budget).as("keep"))
    },

    QueryDef(
      "doc_pack_sequences",
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |       CAST(cum0 // 512 AS BIGINT) AS seq_id,
        |       CAST(cum0 % 512 AS BIGINT) AS seq_offset,
        |       (cum0 % 512) + n_tokens > 512 AS spans_boundary
        |FROM c""".stripMargin) { (s, d) =>
      val budget = 512L
      val t = Tables.documents(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"))
      graft.operators.GlobalRank
        .withGlobalCumSumBefore(t, Seq(col("doc_id")), col("n_tokens"), "cum0")
        .select(
          col("doc_id"), col("n_tokens"),
          expr(s"cum0 div $budget").cast("long").as("seq_id"),
          pmod(col("cum0"), lit(budget)).cast("long").as("seq_offset"),
          (pmod(col("cum0"), lit(budget)) + col("n_tokens") > budget)
            .as("spans_boundary"))
    },

    // CCNet-style LM-perplexity bucketing (Wenzek et al., "CCNet:
    // Extracting High Quality Monolingual Datasets from Web Crawl
    // Data", arXiv 1911.00359 §4.3): score every doc by its mean
    // negative log-likelihood under a unigram LM trained on a
    // high-quality exemplar slice (the deterministic doc_id%25=0
    // stand-in shared with doc_decontaminate/doc_dsir_weight), then
    // split the corpus into the paper's head/middle/tail tertiles —
    // head = most-target-like, the slice CCNet keeps. Same hashed
    // 512-bucket feature space + add-1 smoothing as doc_dsir_weight
    // (DSIR weights by target-vs-raw ratio; CCNet by target NLL alone).
    //
    // Plan shape (100 TB-safe): token explode -> ONE map-side-
    // combinable <=512-group count (LM training is one aggregate, not
    // a pass over a model) -> 512-row NLL table broadcast onto the
    // token stream -> per-doc partial-aggregated sum. The corpus-wide
    // tertile split rides the scale-safe GlobalRank two-pass + the
    // closed-form NTILE rule — never a single-partition window.
    // Transcendentals grid-quantized to DECIMAL(12,6) pre-sum, so
    // mean_nll and the bucket label are hash-exact vs the oracle.
    QueryDef(
      "doc_lm_perplexity",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5('ppl:' || t), 1, 15)) AS BIGINT) % 512 AS b
        |  FROM tok),
        |cnt AS (
        |  SELECT b,
        |         CAST(COUNT(*) FILTER (WHERE doc_id % 25 = 0) AS BIGINT) AS ct
        |  FROM tb GROUP BY b),
        |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt FROM cnt),
        |lm AS (
        |  SELECT b,
        |         CAST(FLOOR(-ln((ct + 1.0) / (nt + 512.0)) * 1e6 + 0.5) / 1e6
        |           AS DECIMAL(12,6)) AS nll
        |  FROM cnt CROSS JOIN tot),
        |sc AS (
        |  SELECT doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |         CAST(CAST(ROUND(SUM(nll), 6) AS DECIMAL(20,6)) AS DOUBLE) / COUNT(*) AS mean_nll
        |  FROM tb JOIN lm USING (b)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens, mean_nll,
        |       CASE NTILE(3) OVER (ORDER BY mean_nll, doc_id)
        |         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM sc""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      import graft.operators.GlobalRank
      // r21 (guide §1.2): tb feeds BOTH the LM-count pass and the
      // scoring pass — uncached, the explode + per-token md5/conv (the
      // row's dominant compute) ran twice. The cached rows are two
      // longs each (~16 B/token), far cheaper to hold than to rehash.
      val tb = graft.ext.Caches.track(Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("t"))
        .select(col("doc_id"),
          (conv(substring(md5(concat(lit("ppl:"), col("t")).cast("binary")), 1, 15), 16, 10)
            .cast("long") % 512).as("b"))
        .cache())
      val cnt = tb.groupBy("b")
        .agg(count(when(col("doc_id") % 25 === 0, 1)).as("ct"))
      val tot = cnt.agg(sum("ct").as("nt"))
      val lm = cnt.crossJoin(broadcast(tot))
        .select(col("b"),
          graft.Det.fq6(
            -log((col("ct") + lit(1.0)) / (col("nt") + lit(512.0))), 12)
            .as("nll"))
      val sc = tb.join(broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          (sum("nll").cast(DecimalType(20, 6)).cast("double") / count(lit(1)))
            .as("mean_nll"))
      val (ranked, n) = GlobalRank.withGlobalRowNumber(
        sc, Seq(col("mean_nll"), col("doc_id")), "_rn")
      val tile = GlobalRank.ntileFromRn(col("_rn"), n, 3)
      ranked.select(
        col("doc_id"), col("n_tokens"), col("mean_nll"),
        when(tile === 1, "head").when(tile === 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
    },

    // BPE tokenizer training, the distributed step: corpus-wide adjacent
    // character-pair counts (Sennrich et al. 1508.07909 — each merge
    // iteration picks the most frequent pair). The scale shape: pair
    // explosion runs over DISTINCT words weighted by word frequency, so
    // cost is vocabulary-sized, not corpus-sized; both aggs are plain
    // map-side-combinable counts. Top-100 with a (count, pair) total
    // order. SUM(BIGINT) CAST to avoid DuckDB HUGEINT drift.
    QueryDef(
      "doc_bpe_pairs",
      """WITH w AS (
        |  SELECT lower(wrd) AS wrd, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split_regex(text, '[^A-Za-z]+')) AS wrd
        |        FROM documents)
        |  WHERE len(wrd) >= 2
        |  GROUP BY 1),
        |p AS (
        |  SELECT substr(wrd, CAST(i AS INT), 2) AS pair, f
        |  FROM w, unnest(range(1, len(wrd))) AS t(i))
        |SELECT pair, CAST(SUM(f) AS BIGINT) AS c
        |FROM p GROUP BY pair
        |ORDER BY c DESC, pair LIMIT 100""".stripMargin) { (s, d) =>
      val w = Tables.documents(s, d)
        .select(explode(split(col("text"), "[^A-Za-z]+")).as("wrd0"))
        .select(lower(col("wrd0")).as("wrd"))
        .filter(length(col("wrd")) >= 2)
        .groupBy("wrd").agg(count(lit(1)).as("f"))
      w.select(
          explode(expr(
            "transform(sequence(1, length(wrd) - 1), i -> substring(wrd, i, 2))"))
            .as("pair"),
          col("f"))
        .groupBy("pair").agg(sum("f").as("c"))
        .orderBy(col("c").desc, col("pair")).limit(100)
    },

    // TRAINED quality classifier (r11, VERDICT r10 item 2): the
    // fastText-style corpus quality filter (CCNet lineage, Wenzek
    // 1911.00359) — logistic regression over md5-hashed TF features,
    // trained ON THE CLUSTER to separate a reference slice (sources
    // src0..src9) from the rest, then applied as a per-doc quality
    // prior. Training is graft.ext.QualityModel.fit: one treeAggregate
    // per gradient sweep, 1e-12-quantized-long accumulation — the
    // weights are bit-identical run-to-run, which is what lets this
    // lazy oracle inline them as literals and hash-check the SCORING
    // arithmetic end-to-end (the trainer itself is gated by
    // QualityModelSpec's planted-separable corpus). The score is the
    // exact quantized LOGIT (no transcendentals cross the engine
    // boundary); pred_hq thresholds it at 0 ( = sigmoid at 0.5).
    QueryDef.lazyOracle("doc_quality_classifier") { (s, d) =>
      val dim = graft.ext.QualityModel.Dim
      val w = graft.ext.QualityModel.fit(Tables.documents(s, d), curateIsRef)
      val biasQ = math.floor(w(dim) * 1e12).toLong
      val wRows = w.take(dim).zipWithIndex
        .map { case (wv, b) => s"($b, ${VecOracle.dbl(wv)})" }
        .mkString(",\n    ")
      s"""WITH w AS (SELECT CAST(b AS BIGINT) AS b, wv FROM (VALUES
         |    $wRows) AS _w(b, wv)),
         |tok AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok,
         |         len(string_split_regex(text, '\\s+')) AS t
         |  FROM documents),
         |bt AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)
         |           % $dim AS b,
         |         t, COUNT(*) AS cnt
         |  FROM tok GROUP BY doc_id, b, t),
         |sc AS (
         |  SELECT bt.doc_id,
         |         CAST(SUM(CAST(FLOOR(w.wv *
         |             (CAST(bt.cnt AS DOUBLE) / CAST(bt.t AS DOUBLE))
         |             * 1e12) AS DECIMAL(38,0))) + $biasQ AS DOUBLE)
         |           / 1e12 AS logit
         |  FROM bt JOIN w ON w.b = bt.b
         |  GROUP BY bt.doc_id)
         |SELECT s.doc_id, s.logit, CAST(s.logit > 0 AS INT) AS pred_hq,
         |       CAST(CAST(substr(d.source, 4) AS INT) < 10 AS INT) AS is_ref
         |FROM sc s JOIN documents d ON d.doc_id = s.doc_id
         |ORDER BY s.doc_id""".stripMargin
    } { (s, d) =>
      val docs = Tables.documents(s, d)
      val w = graft.ext.QualityModel.fit(docs, curateIsRef)
      graft.ext.QualityModel.score(docs, w)
        .join(docs.select(col("doc_id"), curateIsRef.cast("int").as("is_ref")),
          "doc_id")
        .orderBy("doc_id")
    },

    // Eval-side contamination report (r14, part 2): doc_decontaminate
    // answers "which TRAINING docs must be dropped"; this answers the
    // dual question every eval release asks — "which BENCHMARK items
    // are compromised, and how badly" (the GPT-3 appendix-C /
    // PaLM-style n-gram CONTAINMENT audit: overlap normalized by the
    // eval item's own shingle count, since a 10-shingle eval question
    // fully contained in a web page is 100% dirty no matter how big
    // the page is). Same shingle stand-in slice as doc_decontaminate.
    // Exactness: the contamination FLAG is a pure integer compare
    // (2*n_common >= n_sh — no double ever decides it); the reported
    // ratio rides the u6 grid; the worst-doc argmax ranks on
    // (n_common DESC, doc_id) — integers only, no double ordering.
    // Plan: shingle equi-join bench-vs-corpus (bench side broadcast at
    // scale), one count per surviving pair, one window per bench doc
    // over its hit list — never corpus x corpus.
    QueryDef(
      "doc_eval_contamination",
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
        |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
        |           string_split_regex(text, '\s+')[i+1] || ' ' ||
        |           string_split_regex(text, '\s+')[i+2]))) AS shingle
        |  FROM documents),
        |bench AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 25 = 0),
        |bn AS (SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        |       FROM bench GROUP BY bench_id),
        |corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 25 <> 0),
        |hits AS (
        |  SELECT b.bench_id, c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM bench b JOIN corpus c USING (shingle)
        |  GROUP BY b.bench_id, c.doc_id),
        |rk AS (
        |  SELECT bench_id, doc_id, n_common,
        |         ROW_NUMBER() OVER (PARTITION BY bench_id
        |                            ORDER BY n_common DESC, doc_id) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY bench_id) AS BIGINT) AS n_hits
        |  FROM hits)
        |SELECT bn.bench_id, bn.n_sh,
        |       COALESCE(r.doc_id, CAST(-1 AS BIGINT)) AS worst_doc,
        |       COALESCE(CAST(FLOOR(CAST(r.n_common AS DOUBLE) / bn.n_sh
        |                           * 1e6 + 0.5) AS BIGINT), 0) AS contain6u,
        |       COALESCE(r.n_hits, 0) AS n_hits,
        |       COALESCE(2 * r.n_common >= bn.n_sh, FALSE) AS contaminated
        |FROM bn LEFT JOIN (SELECT * FROM rk WHERE rn = 1) r USING (bench_id)
        |ORDER BY bn.bench_id""".stripMargin) { (s, d) =>
      val sh = shingledAll(s, d)
      val bench = sh.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("bench_id"), col("shingle"))
      val bn = bench.groupBy("bench_id").agg(count(lit(1)).as("n_sh"))
      val corpus = sh.filter(col("doc_id") % 25 =!= 0)
      val hits = bench.join(corpus, "shingle")
        .groupBy("bench_id", "doc_id").agg(count(lit(1)).as("n_common"))
      val wb = Window.partitionBy("bench_id")
      val rk = hits
        .withColumn("rn", row_number().over(
          wb.orderBy(col("n_common").desc, col("doc_id"))))
        .withColumn("n_hits", count(lit(1)).over(wb))
      bn.join(rk.filter(col("rn") === 1).drop("rn"), Seq("bench_id"), "left")
        .select(col("bench_id"), col("n_sh"),
          coalesce(col("doc_id"), lit(-1L)).as("worst_doc"),
          coalesce(floor(col("n_common").cast("double") / col("n_sh")
            * lit(1e6) + lit(0.5)).cast("long"), lit(0L)).as("contain6u"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          coalesce(lit(2L) * col("n_common") >= col("n_sh"), lit(false))
            .as("contaminated"))
        .orderBy("bench_id")
    },

    // Inverted-index build (r15): the postings-list construction under
    // every BM25/keyword retrieval system (ext_bm25_topk SCORES against
    // such an index; this row BUILDS one). Per term: document frequency
    // over the whole corpus plus the first-20-docs postings list. The
    // cap is applied BEFORE any list materializes — a row_number window
    // keyed on term keeps at most 20 doc ids per term in flight, so a
    // stop-word's postings never buffer corpus-sized state (the naive
    // collect-then-slice would); df still counts every doc. One shuffle
    // on (doc_id, term) for the distinct, one on term reused by both
    // the window and the aggregate; top-100 terms ride TakeOrdered.
    // Postings emit as to_json on both engines (array-cell discipline).
    QueryDef(
      "doc_inverted_index",
      """WITH tok AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents),
        |rk AS (
        |  SELECT term, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM tok WHERE term <> '')
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |       CAST(to_json(list_sort(list(doc_id) FILTER (WHERE rn <= 20)))
        |            AS VARCHAR) AS postings
        |FROM rk GROUP BY term
        |ORDER BY df DESC, term LIMIT 100""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
        .filter(col("term") =!= "")
        .distinct()
      val wT = Window.partitionBy("term").orderBy("doc_id")
      tok.withColumn("rn", row_number().over(wT))
        .groupBy("term")
        .agg(count(lit(1)).cast("long").as("df"),
          to_json(array_sort(collect_list(
            when(col("rn") <= 20, col("doc_id"))))).as("postings"))
        .orderBy(col("df").desc, col("term"))
        .limit(100)
    }
  )

  /** Reference-corpus flag for the quality classifier: the first half
    * of the source ids plays the "known-good corpus" role (the
    * Wikipedia side of the fastText recipe). */
  private def curateIsRef: org.apache.spark.sql.Column =
    substring(col("source"), 4, 8).cast("int") < 10

  /** Deterministic per-id noisy replicas of (vec_id, embedding) rows —
    * the planted "re-crawl / contaminated" fixtures of
    * emb_incremental_neardups and emb_decontaminate. Seeded by the
    * ORIGINAL vec_id, so the same row always perturbs identically;
    * that determinism is what lets the r10 lazy oracles materialize
    * and inline these vectors as exact literals. */
  private def curateNoisy(
      src: org.apache.spark.sql.DataFrame, shift: Long)
      : org.apache.spark.sql.DataFrame = {
    val noisy = udf { (id: Long, e: Seq[Float]) =>
      val r = new java.util.Random(id)
      val scale = 0.05 * math.sqrt(e.map(x => x.toDouble * x).sum / e.length)
      e.map(x => (x + r.nextGaussian() * scale).toFloat)
    }
    src.select((col("vec_id") + lit(shift)).as("vec_id"),
      noisy(col("vec_id"), col("embedding")).as("embedding"))
  }

  /** [[curateNoisy]] over the `vec_id % mod = 0` slice. */
  private def curateNoisyBatch(
      emb: org.apache.spark.sql.DataFrame, mod: Int, shift: Long)
      : org.apache.spark.sql.DataFrame =
    curateNoisy(emb.filter(col("vec_id") % mod === 0), shift)
}
