package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine operator: a Spark query plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as the oracle.
  * Column names of `run`'s result and the oracle SQL must match exactly
  * (the driver sorts columns by name before hashing values).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, run)
}

/** Determinism helpers for DuckDB hash-matching.
  *
  * Double aggregation is order-dependent (partial aggregation in Spark,
  * different accumulation order in DuckDB), so raw SUM(double) is not
  * hash-stable across engines. We cast to DECIMAL before summing — both
  * engines then do exact decimal arithmetic and agree bit-for-bit — and
  * cast the final result back to DOUBLE so the output schema is plain.
  */
object Det {
  /** Exact decimal sum of a double column, emitted as double.
    * Oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same at 6 fractional digits (for products like price*(1-disc)).
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE). */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Exact mean: decimal sum divided by count, both exact, in double.
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x). */
  def davg2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(c)
}
