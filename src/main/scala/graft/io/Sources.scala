package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source facades (SURVEY §2.3 "Sources / sinks"). Batch reads are plain
  * `spark.read` so Catalyst pushdown/pruning reach the scan; streaming
  * reads are Structured Streaming only (no DStreams).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC scan — same columnar pushdown/pruning properties as parquet
    * (predicate pushdown via ORC SearchArguments, column projection via
    * the reader's included-columns mask). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** XML scan (Spark 4 built-in XML data source, the spark-xml connector
    * folded into core): one record per `rowTag` element. Schema passed
    * explicitly like csv/json — inference costs an extra pass. */
  def xml(spark: SparkSession, path: String, schema: StructType, rowTag: String): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).format("xml").load(path)

  /** Kafka batch read (offset-bounded). */
  def kafkaBatch(spark: SparkSession, servers: String, topics: Seq[String]): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topics.mkString(","))
      .load()

  /** Kafka stream — the samsa consumer (R1/R2/R11,
    * /root/reference/samsa/kafka/storage.py:228, consumers.py:59). Group
    * management, EOF, and rebalance (R3/R14) are internal to the source.
    * `failOnDataLoss` governs lost-offset behavior (R16). */
  def kafkaStream(
      spark: SparkSession,
      servers: String,
      topics: Seq[String],
      startingOffsets: String = "earliest",
      failOnDataLoss: Boolean = true): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()

  /** File-replay stream (tests: events.parquet replayed as a stream). */
  def parquetStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Live state of a (running or stopped) stateful query — R5's `query`
    * read path (/root/reference/samsa/kafka/storage.py:208-219). */
  def stateStore(spark: SparkSession, checkpoint: String, operatorId: Int = 0): DataFrame =
    spark.read.format("statestore")
      .option("path", checkpoint).option("operatorId", operatorId).load()
}
