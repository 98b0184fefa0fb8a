package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Remaining scalar-function family members not practical to oracle-pair
  * (engine-specific output formats), plus the complete output mode.
  */
class FunctionsSpec extends SparkSpec {

  test("schema_of_json infers the props schema") {
    val sample = Tables.events(spark, sf())
      .select(col("props")).filter(col("props").isNotNull).head().getString(0)
    val schema = spark.range(1)
      .select(schema_of_json(lit(sample)).as("s")).head().getString(0)
    assert(schema.toUpperCase.contains("STRUCT"), s"sample=$sample schema=$schema")
    // inferred schema round-trips through from_json
    val parsed = Tables.events(spark, sf())
      .select(from_json(col("props"), lit(schema)).as("p"))
      .filter(col("p").isNotNull).count()
    assert(parsed > 0)
  }

  test("complete output mode re-emits full aggregate each batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)]
    val q = in.toDS().toDF("k", "v")
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.format("memory").queryName("complete_agg")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-complete").toString)
      .outputMode("complete").start()
    in.addData(("a", 1.0), ("b", 2.0)); q.processAllAvailable()
    val snap1 = spark.table("complete_agg").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    in.addData(("a", 10.0)); q.processAllAvailable()
    val snap2 = spark.table("complete_agg").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    q.stop()
    assert(snap1 == Map("a" -> 1.0, "b" -> 2.0))
    assert(snap2 == Map("a" -> 11.0, "b" -> 2.0), "complete mode must re-emit ALL groups")
  }
}
