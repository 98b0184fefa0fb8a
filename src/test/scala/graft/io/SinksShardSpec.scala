package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The training-shard writer contract: directory layout per partition
  * key, file-size caps actually split files, in-file row order follows
  * sortCols, and the round-trip loses nothing. */
class SinksShardSpec extends SparkSpec {

  test("trainingShards: layout, file caps, in-file sort order, lossless round-trip") {
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "lang", "source", "n_chars", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Sinks.trainingShards(docs, dir,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"),
      maxRecordsPerFile = 50)

    // one directory per lang value
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == langs.map(l => s"lang=$l"), s"dirs=$dirs langs=$langs")

    val back = spark.read.parquet(dir)
    // lossless: same rows, nothing dropped or duplicated
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())

    // the cap splits: the biggest lang has > 50 docs, so > 1 file
    val files = back.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    val biggestLangCount = docs.groupBy("lang").count()
      .agg(max("count")).collect().head.getLong(0)
    if (biggestLangCount > 50)
      assert(files.length > langs.size, "cap did not split any file")

    // within every file, rows are in doc_id order — each capped file is
    // a single small row group, so a direct single-file read collects
    // in physical row order (collect_list after a groupBy would NOT
    // preserve it)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.length <= 50, s"file over cap (${ids.length}): $f")
      assert(ids == ids.sorted, s"unsorted file $f")
    }
  }
}
