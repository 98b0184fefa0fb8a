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

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq-evolve").toString
    // generation 1: (id, name); generation 2 adds score
    Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
      .write.parquet(s"$dir/g=1")
    Seq((3L, "carol", 0.9)).toDF("id", "name", "score")
      .write.parquet(s"$dir/g=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score", "g"))
    assert(merged.count() == 3)
    // old-generation rows surface the new column as NULL, not an error
    assert(merged.filter("score IS NULL").count() == 2)
    assert(merged.filter("id = 3 AND score = 0.9").count() == 1)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq-dyn").toString
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq(("a", 1), ("a", 2), ("b", 10)).toDF("p", "v")
        .write.partitionBy("p").mode("overwrite").parquet(dir)
      // overwrite ONLY partition a; b must survive (static mode would drop it)
      Seq(("a", 99)).toDF("p", "v")
        .write.partitionBy("p").mode("overwrite").parquet(dir)
      val rows = spark.read.parquet(dir).collect()
        .map(r => r.getString(1) -> r.getInt(0)).groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(rows == Map("a" -> Seq(99), "b" -> Seq(10)), rows.toString)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
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
