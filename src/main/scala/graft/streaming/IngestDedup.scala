package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-dup ingest over a PERSISTED band-signature index —
  * the FOURTEENTH batch/stream parity pair (streaming twin of
  * `doc_incremental_neardups` + the exact-dup prefilter family).
  *
  * The 100 TB daily-ingest shape: a document stream lands in
  * micro-batches; each batch is (1) exact-dup-filtered against an
  * 8-byte-per-doc hash index, (2) near-dup-scored against the standing
  * corpus via [[graft.ext.Dedup.incrementalNearDups]]'s persisted-index
  * path — the corpus contributes only its STORED band signatures plus
  * the text of docs that actually collide, so per-batch cost is
  * |batch| x collision-rate, never |corpus| — and (3) survivors are
  * APPENDED to the corpus store, signature index, and hash index, so
  * batch N+1 dedups against everything accepted before it.
  *
  * Batch/stream contract (the other 13 pairs' discipline):
  *   - BETWEEN-ONLY semantics per micro-batch (the incrementalNearDups
  *     contract): docs arriving in the SAME micro-batch are not scored
  *     against each other — compose a within-batch
  *     `lshVerifiedNonCanonical` upstream if batches can self-collide.
  *   - Replay parity: batch 1 against a bootstrapped corpus emits
  *     exactly the oracle-paired `doc_incremental_neardups` rows; later
  *     batches extend the same operator over the grown index
  *     (StreamingIngestDedupSpec pins both).
  *   - Bounded state: the operator's standing state is the signature
  *     index (4 rows x 3 longs per ACCEPTED doc) + the hash index
  *     (1 row x 2 longs) — proportional to the accepted corpus, never
  *     to stream length or rejected-duplicate volume.
  *
  * The exact-dup prefilter here is the EXACT xxhash64 anti join rather
  * than [[graft.ext.Dedup.bloomNewDocs]]: a streaming store must not
  * drop the bloom's fpp fraction of genuinely-new docs on every batch,
  * and the hash index is itself bounded state. (At 100 TB the bloom
  * variant remains the no-shuffle option when an approximate filter is
  * acceptable; 64-bit text-hash collisions are P ~ 1e-19 per pair —
  * the lshVerifiedEdges xxhash64 argument.)
  *
  * Ref: the reference's state-store restore loop
  * (samsa/kafka/storage.py:17-120) replays a changelog into a store;
  * this operator is the same persist-and-extend discipline applied to
  * a dedup index instead of a KV table.
  */
object IngestDedup {

  /** One micro-batch's outcome: verified near-dup `pairs`
    * (doc_corpus, doc_new, n_common, jaccard) and the `accepted`
    * (non-duplicate) docs that were appended to the store. Both are
    * materialized (localCheckpoint) BEFORE the store appends, so
    * reading them after the step never sees the grown store. */
  final case class StepResult(pairs: DataFrame, accepted: DataFrame)

  private def corpusPath(storeDir: String) = s"$storeDir/corpus"
  private def sigPath(storeDir: String) = s"$storeDir/sigindex"
  private def hashPath(storeDir: String) = s"$storeDir/hashindex"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Standing-state row counts (sigRows, hashRows) — what the bounded-
    * state assertion measures. */
  def stateRows(spark: SparkSession, storeDir: String): (Long, Long) = (
    spark.read.parquet(sigPath(storeDir)).count(),
    spark.read.parquet(hashPath(storeDir)).count())

  /** One micro-batch against the standing store at `storeDir`. The
    * first batch BOOTSTRAPS the store (everything accepted, no pairs) —
    * a deployment seeding from an existing corpus runs one bootstrap
    * batch of that corpus first. Pure batch function: the foreachBatch
    * wrapper in [[start]] only sequences it, which is also what makes
    * the stream's semantics oracle-traceable. */
  def ingestStep(
      spark: SparkSession, storeDir: String, batch0: DataFrame,
      threshold: Double = 0.5): StepResult = {
    import graft.ext.Dedup
    val batch = batch0.select("doc_id", "text")
    val cPath = corpusPath(storeDir); val sPath = sigPath(storeDir)
    val hPath = hashPath(storeDir)
    if (!exists(spark, cPath)) {
      val acc = batch.localCheckpoint()
      acc.write.mode("overwrite").parquet(cPath)
      Dedup.bandSignatures(acc).write.mode("overwrite").parquet(sPath)
      acc.select(col("doc_id"), xxhash64(col("text")).as("h"))
        .write.mode("overwrite").parquet(hPath)
      val emptyPairs = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_corpus",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_new",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_common",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("jaccard",
            org.apache.spark.sql.types.DoubleType))))
      return StepResult(emptyPairs, acc)
    }
    val corpus = spark.read.parquet(cPath)
    val sig = spark.read.parquet(sPath)
    val hashes = spark.read.parquet(hPath)
    // exact-dup prefilter: the hash index is tiny relative to the batch
    // join's other side at any realistic batch size; Spark broadcasts
    // it when small, shuffles both sides when not — either is correct
    val fresh = batch
      .join(hashes.select(col("h")),
        xxhash64(col("text")) === col("h"), "left_anti")
    // near-dups vs the standing index: the persisted-signature path —
    // corpus text is scanned only for docs that collide in some band
    val pairs = Dedup
      .incrementalNearDups(corpus, fresh, threshold, corpusSig = Some(sig))
      .localCheckpoint()
    val accepted = fresh
      .join(pairs.select(col("doc_new").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // grow the store AFTER materializing the step's outputs
    accepted.write.mode("append").parquet(cPath)
    Dedup.bandSignatures(accepted).write.mode("append").parquet(sPath)
    accepted.select(col("doc_id"), xxhash64(col("text")).as("h"))
      .write.mode("append").parquet(hPath)
    StepResult(pairs, accepted)
  }

  /** Run the ingest loop over a document stream (columns: doc_id, text).
    * `onBatch` observes each micro-batch's result (emit pairs to a
    * sink, route accepted docs downstream). */
  def start(
      stream: DataFrame, storeDir: String, threshold: Double = 0.5)(
      onBatch: (Long, StepResult) => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        onBatch(id, ingestStep(b.sparkSession, storeDir, b, threshold))
      }
      .option("checkpointLocation", s"$storeDir/ckpt")
      .start()
}
