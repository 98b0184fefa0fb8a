package graft.examples
import org.apache.spark.sql.SparkSession
/** Dump a single registered query's result to parquet (targeted oracle
  * debugging without a full Verify pass).
  * Usage: runMain graft.examples.DumpOne <name> <sfDir> <outDir> */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
