package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF/UDAF/UDTF surface (SURVEY §2.3) — the idiomatic home for samsa's
  * arbitrary per-message callback (/root/reference/samsa/kafka/
  * storage.py:237). Each custom function here is intentionally
  * SQL-expressible so the DuckDB oracle can check the machinery; real
  * users would reach for these only when built-ins genuinely can't
  * express the logic (the perf cliff vs codegen'd built-ins is the
  * documented trade).
  */
object UdfQ {

  /** Typed UDAF: exact decimal sum + count -> mean, as an Aggregator.
    * (The Det.davg2 semantics, hand-carried through a custom buffer.) */
  private class DecimalAvg extends Aggregator[java.math.BigDecimal, (java.math.BigDecimal, Long), Double] {
    private val ZERO = java.math.BigDecimal.ZERO
    def zero: (java.math.BigDecimal, Long) = (ZERO, 0L)
    def reduce(b: (java.math.BigDecimal, Long), a: java.math.BigDecimal): (java.math.BigDecimal, Long) =
      if (a == null) b else (b._1.add(a), b._2 + 1)
    def merge(b1: (java.math.BigDecimal, Long), b2: (java.math.BigDecimal, Long)): (java.math.BigDecimal, Long) =
      (b1._1.add(b2._1), b1._2 + b2._2)
    def finish(r: (java.math.BigDecimal, Long)): Double =
      if (r._2 == 0) Double.NaN else r._1.doubleValue() / r._2
    def bufferEncoder: Encoder[(java.math.BigDecimal, Long)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val all: Seq[QueryDef] = Seq(
    // Scalar UDF: net price. Deliberately the same arithmetic as the
    // built-in expression so the oracle validates the UDF plumbing.
    QueryDef(
      "udf_scalar_netprice",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net
        |FROM lineitem WHERE l_orderkey < 2000""".stripMargin) { (s, d) =>
      val net = udf((p: Double, disc: Double, tax: Double) => p * (1 - disc) * (1 + tax))
      Tables.lineitem(s, d).filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          net(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("net"))
    },

    // Typed UDAF through functions.udaf: decimal-exact mean per group.
    QueryDef(
      "udaf_decimal_avg",
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      val decAvg = udaf(new DecimalAvg, Encoders.DECIMAL)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("q"))
        .groupBy("l_returnflag")
        .agg(decAvg(col("q")).as("avg_qty"))
    },

    // UDTF-equivalent: Dataset[T].flatMap — one output row per word of the
    // part type (Scala's table function; SQL twin is unnest/explode).
    QueryDef(
      "udtf_flatmap_words",
      """SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
        |FROM part WHERE p_partkey < 100""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.part(s, d).filter(col("p_partkey") < 100)
        .select(col("p_partkey"), col("p_type"))
        .as[(Long, String)]
        .flatMap { case (k, t) => t.split(' ').map(w => (k, w)) }
        .toDF("p_partkey", "word")
    }
  )
}
