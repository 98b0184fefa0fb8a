package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations and deduplication (SURVEY §2.3 "Set ops").
  * `dropDuplicates(cols)` keeps an arbitrary row per key, so the declared
  * engine operator is the deterministic variant: keep the first row by a
  * total order (row_number = 1) — also the batch form of samsa's
  * latest-wins upsert (/root/reference/samsa/db/sqldb.py:40-64).
  */
object SetOpsQ {

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "set_union_all",
      """SELECT o_custkey AS k, 'big' AS src FROM orders WHERE o_totalprice > 300000
        |UNION ALL
        |SELECT c_custkey AS k, 'rich' AS src FROM customer WHERE c_acctbal > 9000""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("k"), lit("big").as("src"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("k"), lit("rich").as("src"))
      a.union(b)
    },

    QueryDef(
      "set_union_by_name",
      """SELECT n_nationkey AS key, n_name AS name FROM nation
        |UNION ALL
        |SELECT r_regionkey AS key, r_name AS name FROM region""".stripMargin) { (s, d) =>
      val a = Tables.nation(s, d)
        .select(col("n_nationkey").as("key"), col("n_name").as("name"))
      // deliberately reversed column order — unionByName resolves by name
      val b = Tables.region(s, d)
        .select(col("r_name").as("name"), col("r_regionkey").as("key"))
      a.unionByName(b)
    },

    QueryDef(
      "set_intersect",
      """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
        |INTERSECT
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 3000""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("k"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 3000)
        .select(col("c_custkey").as("k"))
      a.intersect(b)
    },

    QueryDef(
      "set_except",
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val b = Tables.orders(s, d).select(col("o_custkey").as("k"))
      a.except(b)
    },

    QueryDef(
      "set_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()
    },

    QueryDef(
      "dedup_first_by_key",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }
  )
}
