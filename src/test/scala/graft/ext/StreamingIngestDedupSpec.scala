package graft.ext

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming deployment shape of incremental dedup: a document
  * stream runs per-micro-batch through the SAME batch operators the
  * oracle verifies — `bloomNewDocs` (exact-dup prefilter) then
  * `incrementalNearDups` (banded-MinHash vs the standing corpus) inside
  * `foreachBatch`. This is how a 100 TB ingest pipeline consumes the
  * library: streaming machinery for delivery/checkpointing, verified
  * batch operators for the logic.
  */
class StreamingIngestDedupSpec extends SparkSpec {

  test("foreachBatch ingest: bloom exact-prefilter + incremental LSH near-dups per micro-batch") {
    val docs = Tables.documents(spark, sf())
    val corpus = docs.filter(col("doc_id") % 2 === 0).cache()
    val incoming = docs.filter(col("doc_id") % 2 === 1)

    // expected, from the (oracle-verified) batch operators run directly
    val expectedPairs = Dedup.incrementalNearDups(corpus, incoming)
      .select("doc_corpus", "doc_new").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedNew = Dedup.bloomNewDocs(corpus, incoming)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // stream the incoming docs in, one file per micro-batch
    val tmp = Files.createTempDirectory("ingest-dedup").toString
    incoming.repartition(3).write.mode("overwrite").parquet(s"$tmp/in")
    val gotPairs = scala.collection.mutable.Set[(Long, Long)]()
    val gotNew = scala.collection.mutable.Set[Long]()
    val q = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        gotNew.synchronized {
          gotNew ++= Dedup.bloomNewDocs(corpus, batch)
            .select("doc_id").collect().map(_.getLong(0))
          gotPairs ++= Dedup.incrementalNearDups(corpus, batch)
            .select("doc_corpus", "doc_new").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // micro-batched union == one-shot batch answer (the operators are
    // per-doc independent, so batching boundaries cannot change results)
    assert(gotPairs.toSet == expectedPairs,
      s"streamed pairs ${gotPairs.size} vs batch ${expectedPairs.size}")
    assert(gotNew.toSet == expectedNew,
      s"streamed new-docs ${gotNew.size} vs batch ${expectedNew.size}")
    corpus.unpersist()
  }
}
