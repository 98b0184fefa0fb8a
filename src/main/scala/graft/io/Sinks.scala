package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sink facades (SURVEY §2.3). The Kafka producer facade matches R13
  * (/root/reference/samsa/kafka/producers.py:11-55): default topic with
  * per-record override via a `topic` column; batching and delivery are the
  * Kafka sink's (never a new producer + flush per message — contrast
  * storage.py:145-148).
  */
object Sinks {

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC write (columnar twin of [[parquet]]; snappy by default). */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Training-shard writer — the OUTPUT end of the curation pipeline:
    * directory-partitioned by `partitionCols` (e.g. lang/source),
    * rows SORTED by `sortCols` inside every file (sequence/doc order
    * survives the write), file sizes capped via `maxRecordsPerFile`.
    *
    * Plan shape for 100 TB: one shuffle (repartition on the partition
    * key — co-locates each directory's rows so the writer emits one
    * file sequence per key instead of |tasks|×|keys| small files),
    * then a partition-local sort; `maxRecordsPerFile` splits a task's
    * sorted run into capped files WITHOUT re-sorting, so within-file
    * order is preserved (asserted in SinksShardSpec via
    * input_file_name). Skewed partition keys: salt the repartition by
    * adding a `pmod(hash(sortCols), k)` column to `partitionCols`'
    * repartition keys — the directory layout is unchanged, the write
    * parallelism fans to k per hot key.
    *
    * Training-order shuffle: pass the `shuffle_rank` column produced by
    * the `doc_shuffle_order` operator (deterministic md5 hash-order
    * global rank) as `sortCols` — shards then come out in a reproducible
    * pseudo-random order instead of ingest order. */
  def trainingShards(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      maxRecordsPerFile: Int): Unit = {
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(path)
  }

  /** Batch Kafka produce (R13). A `topic` column on the frame overrides
    * `defaultTopic` per record (producers.py:52's `topic or self.topic`). */
  def kafkaBatch(df: DataFrame, servers: String, defaultTopic: Option[String]): Unit = {
    val w = df.write.format("kafka").option("kafka.bootstrap.servers", servers)
    defaultTopic.fold(w)(t => w.option("topic", t)).save()
  }

  /** Streaming Kafka sink. */
  def kafkaStream(
      df: DataFrame,
      servers: String,
      checkpoint: String,
      defaultTopic: Option[String]): DataStreamWriter[Row] = {
    val w = df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("checkpointLocation", checkpoint)
    defaultTopic.fold(w)(t => w.option("topic", t))
  }

  /** Memory sink (tests): named in-memory table of the stream output. */
  def memory(df: DataFrame, queryName: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint).start()

  def console(df: DataFrame): StreamingQuery =
    df.writeStream.format("console").start()
}

/** The explicit Kafka changelog sink (R6/R8): replicates state writes to
  * `{table}-{partition}-changelog` topics for external consumers. Spark's
  * own changelog checkpointing already gives durability; this sink exists
  * for samsa-compatible downstream readers (storage.py:129-149,186-188).
  */
object ChangelogSink {

  /** R8 naming: "{table_name}-{partition}-changelog"
    * (/root/reference/samsa/kafka/storage.py:186-188). Routed by the KEY's
    * partition — not samsa's every-assigned-partition fan-out
    * (storage.py:200-206); recovery semantics are identical (last-wins
    * merge), without the write amplification (SURVEY §2.2). */
  def topicName(table: String, partition: Int): String =
    s"$table-$partition-changelog"

  /** Add the per-record changelog `topic` column: the key's partition under
    * Kafka's default partitioner contract (murmur2-positive mod would need
    * the producer's exact hash; we use Spark's pmod(hash) — any stable
    * key->partition map satisfies the recovery semantics). */
  def withChangelogTopic(df: DataFrame, table: String, numPartitions: Int): DataFrame =
    df.withColumn("topic",
      concat_ws("-", lit(table),
        pmod(hash(col("key")), lit(numPartitions)).cast("string"), lit("changelog")))

  /** foreachBatch body: batched produce, pooled producers — replaces
    * samsa's per-message Producer+flush (storage.py:145-148). */
  def toKafka(
      servers: String,
      table: String,
      numPartitions: Int): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], _: Long) =>
      Sinks.kafkaBatch(
        withChangelogTopic(batch.toDF(), table, numPartitions), servers, None)

  /** Broker-less variant for tests: same routing, parquet-append sink.
    * `batch_id` stands in for the Kafka offset as the replay order. */
  def toParquet(dir: String, table: String, numPartitions: Int): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) =>
      withChangelogTopic(batch.toDF(), table, numPartitions)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(dir)
}
