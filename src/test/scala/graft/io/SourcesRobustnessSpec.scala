package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Malformed-input behavior of the file sources: a 100 TB crawl ingest
  * ALWAYS contains broken records, and the engine must either quarantine
  * them (PERMISSIVE + _corrupt_record) or fail loudly (FAILFAST) — never
  * silently coerce. */
class SourcesRobustnessSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("CSV: PERMISSIVE quarantines malformed rows, FAILFAST throws") {
    val dir = Files.createTempDirectory("csv-bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.csv"),
      "1,alice,0.5\nnot_a_long,bob,0.7\n3,carol,oops\n4,dave,0.9\n")

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(permissive.count() == 4)
    val bad = permissive.filter("_corrupt_record IS NOT NULL").collect()
    assert(bad.length == 2, bad.mkString(";"))
    assert(bad.exists(_.getString(3).startsWith("not_a_long")))
    assert(bad.exists(_.getString(3).startsWith("3,carol,oops")))
    // good rows parse fully
    assert(permissive.filter("_corrupt_record IS NULL AND id IN (1, 4)").count() == 2)
    permissive.unpersist()

    val failfast = spark.read
      .schema(StructType(schema.fields.filterNot(_.name == "_corrupt_record")))
      .option("mode", "FAILFAST").csv(dir)
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }

  test("JSON: PERMISSIVE quarantines syntax errors and schema violations") {
    val dir = Files.createTempDirectory("json-bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.json"),
      """{"id": 1, "name": "alice", "score": 0.5}
        |{"id": "zzz", "name": "bob", "score": 0.7}
        |{not json at all
        |{"id": 4, "name": "dave", "score": 0.9}
        |""".stripMargin)

    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    assert(df.count() == 4)
    assert(df.filter("_corrupt_record IS NOT NULL").count() == 2)
    assert(df.filter("id = 1 AND score = 0.5").count() == 1)
    assert(df.filter("id = 4").count() == 1)
    df.unpersist()
  }
}
