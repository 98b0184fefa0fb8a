package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Print one registered query's formatted plan (plan-hygiene audits).
  * Usage: runMain graft.examples.ExplainOne <name> [sfDir] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.defs.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    println(q.run(spark, sfDir).queryExecution
      .explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
