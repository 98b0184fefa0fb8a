package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession

/** The TPC-H tail (r17, VERDICT r16 item 4): the six shapes that need
  * the `partsupp` table and three lineitem columns the driver fixtures
  * do not ship (Q2, Q9, Q11, Q12, Q16, Q20). Both are DERIVED
  * deterministically inside the query text itself — a `partsupp` CTE
  * keyed on (p_partkey, 4 pseudo-random suppliers via integer LCG
  * strides) and, for Q12, shipmode/commitdate/receiptdate as pure
  * functions of (l_orderkey, l_linenumber, l_shipdate). Because the
  * derivation is integer arithmetic + CASE, the SAME SQL text runs
  * verbatim on Spark and DuckDB (the sql_tpch_q3 dual-dialect
  * discipline), so every row here is hash-checked end to end.
  *
  * Column adaptations to the fixture schema (FIXTURES.md): Q2 projects
  * p_brand for the absent p_mfgr and omits the absent supplier
  * address/phone/comment; Q16's excluded-supplier subquery keys on
  * s_acctbal < 0 for the absent s_comment LIKE '%Complaints%'. The
  * JOIN/SUBQUERY SHAPES — nested correlated MIN (Q2), 6-table profit
  * snowflake (Q9), HAVING vs global scalar (Q11), derived-column
  * conditional counts (Q12), NOT IN + COUNT(DISTINCT) (Q16), IN with
  * correlated scalar inside (Q20) — are the TPC-H originals.
  *
  * Scale notes: partsupp is 4 rows/part (at real TPC-H it is its own
  * table; deriving it keeps the fixtures read-only). Catalyst plans the
  * CTE once per reference (no materialization needed — it is a
  * projection of the broadcast-sized part dim). The correlated
  * subqueries decorrelate to aggregate-joins
  * (RewriteCorrelatedScalarSubquery — plan-pinned for Q2 in PlanSpec,
  * the same rule family already pinned for Q17/Q21/Q22); the money
  * sums ride the DECIMAL(24,6) exact-sum discipline; l_quantity is
  * integral in the fixture so its raw double SUM is order-independent.
  */
object TpchTailQ {

  /** Deterministic partsupp: 4 suppliers per part via coprime strides
    * (997 vs the supplier count; offsets 0/97/94/91 mod 100 at sf0.01,
    * always 4 DISTINCT suppliers), supplycost in [1.00, 91.00) on a
    * 2-decimal grid, availqty in [1, 9999]. Integer arithmetic end to
    * end — both engines derive bit-identical doubles. */
  private val PartsuppCte: String =
    """partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |         CAST((p_partkey * 4 + t.i * 997) % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS ps_suppkey,
      |         CAST(((p_partkey * 7 + t.i * 13) % 9000) + 100 AS DOUBLE) / 100.0 AS ps_supplycost,
      |         CAST(((p_partkey * 11 + t.i * 17) % 9999) + 1 AS INT) AS ps_availqty
      |  FROM part CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) AS t)""".stripMargin

  /** TPC-H Q2 (minimum-cost supplier): the hardest decorrelation shape
    * in the suite — a correlated scalar MIN over a 4-table join in the
    * WHERE clause. Catalyst decorrelates to an aggregate-join on
    * ps_partkey; the EU supplier slice broadcasts. */
  private val SqlTpchQ2: String =
    s"""WITH $PartsuppCte
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
       |FROM part, supplier, partsupp, nation, region
       |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |  AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'EUROPE'
       |  AND ps_supplycost = (
       |    SELECT MIN(ps_supplycost)
       |    FROM partsupp, supplier, nation, region
       |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |      AND r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  /** TPC-H Q9 (product-type profit): the 6-table snowflake with a
    * derived per-row profit measure aggregated by (nation, year). */
  private val SqlTpchQ9: String =
    s"""WITH $PartsuppCte
       |SELECT nation, o_year,
       |       CAST(SUM(CAST(amount AS DECIMAL(24,6))) AS DOUBLE) AS sum_profit
       |FROM (
       |  SELECT n_name AS nation,
       |         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       |         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
       |  FROM part, supplier, lineitem, partsupp, orders, nation
       |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
       |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
       |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
       |    AND p_name LIKE '%red%') AS profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 (important stock): per-part value with a HAVING
    * threshold that is itself a global scalar subquery over the same
    * join — two passes over partsupp, one broadcastable dim chain. */
  private val SqlTpchQ11: String =
    s"""WITH $PartsuppCte
       |SELECT ps_partkey,
       |       CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(24,6))) AS DOUBLE) AS value
       |FROM partsupp, supplier, nation
       |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  AND n_name = 'NATION_7'
       |GROUP BY ps_partkey
       |HAVING CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(24,6))) AS DOUBLE) > (
       |  SELECT CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(24,6))) AS DOUBLE) * 0.005
       |  FROM partsupp, supplier, nation
       |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |    AND n_name = 'NATION_7')
       |ORDER BY value DESC, ps_partkey""".stripMargin

  /** TPC-H Q12 (shipping modes / late lines): shipmode, commitdate and
    * receiptdate derived as pure integer functions of
    * (l_orderkey, l_linenumber, l_shipdate) — DATE + INT arithmetic,
    * identical in both engines — then the original conditional-count
    * aggregate over the late-line predicate chain. */
  private val SqlTpchQ12: String =
    """WITH l2 AS (
      |  SELECT l_orderkey,
      |    CASE CAST((l_orderkey + l_linenumber) % 7 AS INT)
      |      WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
      |      WHEN 3 THEN 'TRUCK' WHEN 4 THEN 'RAIL' WHEN 5 THEN 'FOB'
      |      ELSE 'REG AIR' END AS l_shipmode,
      |    CAST(l_shipdate AS DATE) + CAST((l_orderkey * 7 + l_linenumber) % 61 - 30 AS INT) AS l_commitdate,
      |    CAST(l_shipdate AS DATE) + CAST((l_orderkey * 3 + l_linenumber) % 14 + 1 AS INT) AS l_receiptdate
      |  FROM lineitem)
      |SELECT l_shipmode,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN l2 ON o_orderkey = l_orderkey
      |WHERE l_commitdate < l_receiptdate
      |  AND l_receiptdate >= DATE '1996-01-01' AND l_receiptdate < DATE '1997-01-01'
      |GROUP BY l_shipmode
      |ORDER BY l_shipmode""".stripMargin

  /** TPC-H Q16 (supplier-count by part attributes): NOT IN exclusion
    * subquery + COUNT(DISTINCT) over the part/partsupp join. */
  private val SqlTpchQ16: String =
    s"""WITH $PartsuppCte
       |SELECT p_brand, p_type, p_size,
       |       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM partsupp, part
       |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#9'
       |  AND p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
       |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 (potential part promotion): IN-subquery whose body
    * carries a CORRELATED scalar aggregate over lineitem — the
    * second-hardest decorrelation after Q2. l_quantity is integral in
    * the fixture, so its raw SUM is exact and order-independent. */
  private val SqlTpchQ20: String =
    s"""WITH $PartsuppCte
       |SELECT s_suppkey, s_name
       |FROM supplier, nation
       |WHERE s_suppkey IN (
       |  SELECT ps_suppkey FROM partsupp
       |  WHERE ps_partkey IN (
       |      SELECT p_partkey FROM part
       |      WHERE p_name LIKE '%red%' OR p_name LIKE '%blue%')
       |    AND ps_availqty > (
       |      SELECT 0.3 * SUM(l_quantity) FROM lineitem
       |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
       |  AND s_nationkey = n_nationkey
       |  AND (n_name = 'NATION_3' OR n_name = 'NATION_11' OR n_name = 'NATION_19')
       |ORDER BY s_name, s_suppkey""".stripMargin

  private def views(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, d, n).createOrReplaceTempView(n))

  private def sqlRow(name: String, sql: String, tables: String*): QueryDef =
    QueryDef(name, sql) { (s, d) =>
      views(s, d, tables: _*)
      s.sql(sql)
    }

  val all: Seq[QueryDef] = Seq(
    sqlRow("sql_tpch_q2", SqlTpchQ2,
      "part", "supplier", "nation", "region"),
    sqlRow("sql_tpch_q9", SqlTpchQ9,
      "part", "supplier", "lineitem", "orders", "nation"),
    sqlRow("sql_tpch_q11", SqlTpchQ11, "part", "supplier", "nation"),
    sqlRow("sql_tpch_q12", SqlTpchQ12, "lineitem", "orders"),
    sqlRow("sql_tpch_q16", SqlTpchQ16, "part", "supplier"),
    sqlRow("sql_tpch_q20", SqlTpchQ20,
      "part", "supplier", "lineitem", "nation"))
}
