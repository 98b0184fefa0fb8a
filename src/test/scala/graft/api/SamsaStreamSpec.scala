package graft.api

import graft.SparkSpec
import graft.streaming.KeyedRecord
import org.apache.spark.sql.functions._

/** The Kafka wire contract without a broker: SamsaStream.records decodes
  * the exact schema the Kafka source emits (binary key/value, topic,
  * partition, timestamp — the fields samsa reads at
  * /root/reference/samsa/kafka/storage.py:179-181,241). We synthesize a
  * frame with that schema and run the same projection `records` applies.
  */
class SamsaStreamSpec extends SparkSpec {

  test("kafka-shaped binary records decode to KeyedRecord (utf-8)") {
    import spark.implicits._
    val wire = Seq(
      ("node-1".getBytes("UTF-8"), """{"data":{"status":"up"}}""".getBytes("UTF-8")),
      ("node-2".getBytes("UTF-8"), "down".getBytes("UTF-8")))
      .toDF("key", "value")
      .withColumn("topic", lit("nodes.status"))
      .withColumn("partition", lit(3))
      .withColumn("ts", current_timestamp())

    val stream = SamsaStream(Seq("nodes.status"), "g1", "nodes")
    // same projection records() applies to the kafka frame
    val decoded = stream.recordsFrom(
      wire.select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("topic"), col("partition"), col("ts")))
      .collect().sortBy(_.key)

    assert(decoded.map(_.key).toSeq == Seq("node-1", "node-2"))
    assert(decoded.head.value == """{"data":{"status":"up"}}""")
    assert(decoded.forall(_.topic == "nodes.status"))
    assert(decoded.forall(_.partition == 3))
  }

  test("changelog topic naming matches the reference convention (R8)") {
    // "{table}-{partition}-changelog", samsa/kafka/storage.py:186-188
    assert(graft.io.ChangelogSink.topicName("nodes", 7) == "nodes-7-changelog")
  }

  test("store dispatch selects provider class (R9/R24)") {
    assert(StoreType.RocksDB.providerClass.contains("RocksDBStateStoreProvider"))
    assert(StoreType.Default.providerClass.contains("HDFSBackedStateStoreProvider"))
    val s = SamsaStream(Seq("t"), "g", "tbl", store = StoreType.RocksDB)
    s.configure(spark)
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDB"))
  }
}
