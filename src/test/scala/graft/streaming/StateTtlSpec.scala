package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TTLConfig
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Duration

/** State TTL: the generalization of samsa's delete (R22,
  * /root/reference/samsa/db/rocksdb.py:75-85) — state expires instead of
  * requiring an explicit tombstone. After the TTL elapses, a key's next
  * event must be treated as 'initial' again.
  */
class StateTtlSpec extends SparkSpec {

  test("ValueState TTL expires state between batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    val q = ChangeDetector(in.toDS(), TTLConfig(Duration.ofMillis(200))).toDF()
      .writeStream.format("memory").queryName("ttl_out")
      .option("checkpointLocation", Files.createTempDirectory("ck-ttl").toString)
      .outputMode("append").start()

    def rec(v: String, t: Long) = KeyedRecord("k1", v, "t", 0, new Timestamp(t))

    // ProcessingTime mode self-triggers TTL-eviction batches, so
    // processAllAvailable never drains — poll the sink row count instead.
    def waitForRows(n: Long, timeoutMs: Long = 60000): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (spark.table("ttl_out").count() < n) {
        assert(System.currentTimeMillis() < deadline, s"timed out waiting for $n rows")
        Thread.sleep(200)
      }
    }

    in.addData(rec("up", 1000))
    waitForRows(1)
    Thread.sleep(1500) // let the 200ms TTL lapse in wall-clock time
    in.addData(rec("up", 2000))
    waitForRows(2)
    q.stop()

    val changes = spark.table("ttl_out").as[ChangeEvent].collect()
      .map(_.change).toSeq
    // without TTL this would be initial,unchanged; expiry makes both initial
    assert(changes == Seq("initial", "initial"), changes.mkString(","))
  }
}
