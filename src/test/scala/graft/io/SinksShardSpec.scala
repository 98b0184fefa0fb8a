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

  test("end-to-end: CorpusBuild output shard-written in doc_shuffle_order training order") {
    // the full r9 assembly story as one integration: build the corpus,
    // rank it with the deterministic hash-order shuffle, write shards
    // sorted by shuffle_rank — files come out in reproducible
    // pseudo-random order, not ingest order
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf())
    val (packed, r) = graft.ext.CorpusBuild.run(docs)
    val withRank = {
      val hashed = packed.withColumn("_h",
        md5(concat(lit("shuf:"), col("doc_id").cast("string")).cast("binary")))
      val (ranked, _) = graft.operators.GlobalRank.withGlobalRowNumber(
        hashed, Seq(col("_h"), col("doc_id")), "_rn")
      ranked.select(col("doc_id"), col("clean_text"), col("n_tokens"),
        col("_rn").cast("long").as("shuffle_rank")).localCheckpoint()
    }
    graft.ext.Caches.releaseAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("shards-shuf").toString
    Sinks.trainingShards(withRank, dir,
      partitionCols = Nil, sortCols = Seq("shuffle_rank"), maxRecordsPerFile = 50)
    val back = spark.read.parquet(dir)
    assert(back.count() == r.nNearDupCanonical, "shard write lost rows")
    // within-file order follows shuffle_rank, and the rank permutation
    // is NOT the ingest (doc_id) order
    val perFile = back.select(input_file_name().as("f"), col("shuffle_rank"), col("doc_id"))
      .collect().groupBy(_.getString(0))
    perFile.values.foreach { rows =>
      val ranks = rows.map(_.getLong(1)).toSeq
      assert(ranks == ranks.sorted, "file not in shuffle_rank order")
    }
    val idsByRank = back.orderBy("shuffle_rank").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(idsByRank != idsByRank.sorted, "shuffle order degenerated to ingest order")
  }
}
