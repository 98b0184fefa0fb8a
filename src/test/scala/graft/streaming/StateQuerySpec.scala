package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** R5 parity: samsa's `query(key)` point lookup
  * (/root/reference/samsa/kafka/storage.py:208-219) from OUTSIDE the
  * stream, via the Spark 4 state data source over the checkpoint.
  */
class StateQuerySpec extends SparkSpec {

  test("statestore source reads live upsert state from checkpoint") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ckpt-statequery").toString
    val input = MemoryStream[KeyedRecord]
    def rec(k: String, v: String, t: Long) =
      KeyedRecord(k, v, "nodes.status", 0, new Timestamp(t))

    val q = StatefulStore.upsert(input.toDS()).toDF()
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    input.addData(Seq(rec("n1", "up", 1000), rec("n2", "up", 1001)))
    q.processAllAvailable()
    input.addData(Seq(rec("n1", "down", 2000)))
    q.processAllAvailable()
    q.stop()

    // transformWithState state: named state variable "value"
    val state = spark.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", "value")
      .load()
    val kv = state
      .select(col("key.value").as("k"), col("value.value").as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv == Map("n1" -> "down", "n2" -> "up"), kv.toString)
  }
}
