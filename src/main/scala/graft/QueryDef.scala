package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine operator: a Spark query plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as the oracle.
  * Column names of `run`'s result and the oracle SQL must match exactly
  * (the driver sorts columns by name before hashing values).
  *
  * `oracleGen` (r10) is the LAZY oracle form: SQL generated at Verify
  * time with the session + sf dir in hand, for rows whose oracle embeds
  * values a driver-side model fit computes (emb_pca_project inlines the
  * eigenbasis as literals — the per-row projection arithmetic is then
  * oracle-checked while the eigen step stays test-verified). Generation
  * must be deterministic for a given (session, sfDir).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame,
    oracleGen: Option[(SparkSession, String) => String] = None)

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, run)

  def lazyOracle(name: String)(gen: (SparkSession, String) => String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, run, Some(gen))
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

  /** Half-up round of a raw double onto a 10^digits integer grid,
    * emitted as BIGINT grid units — built from FLOOR, not ROUND.
    * FLOOR(x*s + 0.5) is pure IEEE arithmetic, identical across engine
    * versions (DuckDB's double-ROUND changed digit-boundary behavior
    * across releases — the r9 emb_kmeans/emb_covariance driver-red
    * seam), and, unlike a plain FLOOR grid, tolerates a cross-engine
    * 1-ulp disagreement in x when the true value sits ON a decimal
    * grid point (percentiles of integer data, libm transcendentals).
    * Oracle: CAST(FLOOR(x * 10^digits + 0.5) AS BIGINT). */
  def uN(c: Column, digits: Int): Column =
    floor(c * lit(math.pow(10, digits)) + lit(0.5)).cast("long")

  /** [[uN]] at the standard 6-digit micro-unit grid. */
  def u6(c: Column): Column = uN(c, 6)

  /** Half-up FLOOR quantizer emitted as DECIMAL(p,6) — the drop-in
    * replacement for the old ROUND(x,6)::DECIMAL(p,6) transcendental
    * grid: the grid value round-trips through an ulp-adjacent double,
    * so the final decimal cast is unambiguous in any rounding mode.
    * Oracle: CAST(FLOOR(x * 1e6 + 0.5) / 1e6 AS DECIMAL(p,6)). */
  def fq6(c: Column, p: Int): Column =
    (floor(c * lit(1.0e6) + lit(0.5)) / lit(1.0e6)).cast(DecimalType(p, 6))
}
