package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` and `oracleSql` are derived from one registry
  * (`SparkEntry.defs`) so a query can never be registered without its
  * oracle falling out of the same definition.
  */
object SparkEntry {

  /** Every declared operator, one QueryDef each (SURVEY.md §2.3). */
  def defs: Seq[QueryDef] =
    _root_.graft.queries.Core.all ++
      _root_.graft.queries.FunctionsQ.all ++
      _root_.graft.queries.WindowsQ.all ++
      _root_.graft.queries.SetOpsQ.all ++
      _root_.graft.queries.JoinsExtQ.all ++
      _root_.graft.queries.PipelineQ.all ++
      _root_.graft.queries.UdfQ.all ++
      _root_.graft.queries.SourcesQ.all ++
      _root_.graft.queries.ExtQ.all ++
      _root_.graft.queries.ExtraQ.all ++
      _root_.graft.queries.CurateQ.all ++
      _root_.graft.queries.ClusterQ.all ++
      _root_.graft.queries.GraphQ.all ++
      _root_.graft.queries.ProfileQ.all ++
      _root_.graft.queries.EventsQ.all ++
      _root_.graft.queries.TimeSeriesQ.all ++
      _root_.graft.queries.SetSimQ.all ++
      _root_.graft.queries.LangIdQ.all ++
      _root_.graft.queries.BpeQ.all ++
      _root_.graft.queries.AuditQ.all ++
      _root_.graft.queries.TpchTailQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join + agg — exercises scan, broadcast join, partial agg. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum2(col("l_quantity")).as("sum_qty"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap

  /** [[oracleSql]] plus the LAZY oracles (QueryDef.oracleGen) generated
    * against a live session + sf dir — what Verify dumps as
    * oracle_sql.json for the driver's DuckDB gate. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    oracleSql ++ defs.collect {
      case q if q.oracleGen.isDefined => q.name -> q.oracleGen.get(spark, sfDir)
    }.toMap
}
