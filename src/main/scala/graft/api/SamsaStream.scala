package graft.api

import graft.io.{ChangelogSink, Sources}
import graft.streaming.{ChangeDetector, ChangeEvent, KeyedRecord, StatefulStore, StateEntry}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, TTLConfig, Trigger}

/** Store engine selection — R9/R24's `store='sqlite'|'rocksdb'` dispatch
  * (/root/reference/samsa/kafka/storage.py:41-55, db/__init__.py:10-15),
  * mapped to Spark state-store providers. */
sealed trait StoreType { def providerClass: String }
object StoreType {
  /** HDFS-backed default provider — the "sqlite" baseline. */
  case object Default extends StoreType {
    val providerClass = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  }
  /** RocksDB provider — the literal same engine as samsa's RocksDBClient
    * (/root/reference/samsa/db/rocksdb.py). Required by transformWithState. */
  case object RocksDB extends StoreType {
    val providerClass = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  }
}

/** `StatefulConsumer`-equivalent builder (R1/R2/R9/R10,
  * /root/reference/samsa/kafka/storage.py:17-62): declares topics, group,
  * table and store engine, then turns a record stream into change events or
  * a durable latest-wins table with an optional explicit changelog.
  *
  * Differences by design (SURVEY §2.2, §7.5): rebalance recovery, offset
  * tracking and changelog replay are Spark's checkpoint machinery, not user
  * code; state commits are transactional with the batch (improving samsa's
  * at-least-once store-before-changelog ordering, storage.py:201-206).
  *
  * TTL caveat: a non-NONE `ttl` forces processing-time mode, where the
  * engine self-triggers eviction micro-batches — drive such queries by
  * sink polling or timed triggers, never `processAllAvailable()` (it
  * would block forever; see StateTtlSpec).
  */
final case class SamsaStream(
    topics: Seq[String],
    groupId: String,
    tableName: String,
    bootstrapServers: String = "localhost:9092",
    store: StoreType = StoreType.RocksDB,
    ttl: TTLConfig = TTLConfig.NONE) {

  /** [[configure]] plus the state-partition auto-default (r19, VERDICT
    * r18 item 4): sets `spark.sql.shuffle.partitions` — which in
    * Structured Streaming IS the state-store partition count — from
    * [[SamsaStream.autoStatePartitions]] over the caller's estimated
    * total state size (expected distinct keys × bytes per key). Must
    * run before query start; the count is fixed for the checkpoint's
    * lifetime, so size it for the state you expect at steady state. */
  def configure(spark: SparkSession, stateBytesEstimate: Long): SparkSession = {
    spark.conf.set("spark.sql.shuffle.partitions",
      SamsaStream.autoStatePartitions(stateBytesEstimate).toString)
    configure(spark)
  }

  /** Session configured for this stream's state engine. Call before
    * building the query (provider class is read at query start). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", store.providerClass)
    if (store == StoreType.RocksDB)
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    spark
  }

  /** Kafka source decoded to samsa's record view (utf-8 key/value,
    * storage.py:179-181). */
  def records(spark: SparkSession): Dataset[KeyedRecord] = {
    import spark.implicits._
    Sources.kafkaStream(spark, bootstrapServers, topics)
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("topic"), col("partition"),
        col("timestamp").as("ts"))
      .as[KeyedRecord]
  }

  /** Any (key,value,topic,partition,ts)-shaped frame as the record stream —
    * the broker-less test path (file replay / MemoryStream). */
  def recordsFrom(df: DataFrame): Dataset[KeyedRecord] = {
    import df.sparkSession.implicits._
    df.as[KeyedRecord]
  }

  /** The README query (README.md:27-52): emit initial/changed/unchanged per
    * record vs stored state. */
  def detectChanges(ds: Dataset[KeyedRecord]): Dataset[ChangeEvent] =
    store match {
      case StoreType.RocksDB => ChangeDetector(ds, ttl)
      case StoreType.Default => ChangeDetector.viaFlatMapGroups(ds)
    }

  /** Durable latest-wins table of the stream (save/query parity, R4/R5). */
  def materialize(ds: Dataset[KeyedRecord]): Dataset[StateEntry] =
    StatefulStore.upsert(ds, ttl)

  /** Materialize AND replicate each batch's surviving writes to
    * `{table}-{partition}-changelog` Kafka topics (R6/R8). */
  def startWithChangelog(
      ds: Dataset[KeyedRecord],
      checkpoint: String,
      numPartitions: Int): StreamingQuery =
    materialize(ds).toDF()
      .writeStream
      // transformWithState runs in Update mode (matches the tested
      // equivalent path in StreamingParitySpec); without it the broker
      // path would fail Spark's output-mode validation at query start
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(ChangelogSink.toKafka(bootstrapServers, tableName, numPartitions))
      .start()

  /** Point lookup against the checkpointed store — R5's `query(key)`
    * (storage.py:208-219) from outside the stream. */
  def query(spark: SparkSession, checkpoint: String, key: String): Option[String] = {
    val rows = StatefulStore.readState(spark, checkpoint)
      .select(col("key.value").as("k"), col("value.value").as("v"))
      .filter(col("k") === key)
      .collect()
    rows.headOption.map(_.getString(1))
  }
}

object SamsaStream {
  /** RocksDB-comfortable state bytes per store instance. Measured band
    * ~100 MB–1 GB (SCALE.md r18 partition sweep: fixed per-store
    * open/commit costs dominate below it; single-store restore latency
    * and compaction pressure grow above it). The target sits at the
    * band's low end so restore parallelism arrives as soon as state is
    * big enough to need it. */
  val targetBytesPerStore: Long = 128L * 1024 * 1024

  /** Parallelism floor: the r18 sweep's measured LOCAL optimum at
    * dashboard-size state (50 MiB — 8 partitions beat 32 beat 128 on
    * every metric: throughput AND restore). Below this, a single slow
    * store serializes the micro-batch with no offsetting benefit. */
  val minStatePartitions: Int = 8

  /** Backstop against absurd partition counts (file/store-instance
    * explosion on the checkpoint FS); ~4 PB of state at the target
    * bytes-per-store before it binds. */
  val maxStatePartitions: Int = 32768

  /** State-store partition count from an estimated total state size —
    * the r18 knob law made the default (r19, VERDICT r18 item 4): in
    * Structured Streaming the shuffle-partition count IS the state-
    * store partition count, and the measurement showed it should follow
    * BYTES PER STORE, not core count — more partitions on small state
    * make both throughput and restore worse (fixed per-store costs),
    * while at large state the per-partition snapshot byte distribution
    * (linear in 1/p, skew < 1.2×) is what parallelizes restore across
    * executors. Estimate `stateBytes` as expected distinct keys × bytes
    * per key (the change-detector measures ~900 B/key on-checkpoint at
    * the 100M-event decade; see SCALE.md). */
  def autoStatePartitions(stateBytes: Long): Int = {
    val byBytes = math.ceil(stateBytes.max(0L).toDouble
      / targetBytesPerStore).toLong
    math.min(maxStatePartitions.toLong,
      math.max(minStatePartitions.toLong, byBytes)).toInt
  }
}
