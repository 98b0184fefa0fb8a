package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

class KeyedStatsSpec extends SparkSpec {

  private def rec(k: String, v: String, t: Long) =
    KeyedRecord(k, v, "t", 0, new Timestamp(t))

  test("ListState history keeps last N values per key across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    val q = KeyedStats.history(in.toDS(), cap = 3).toDF()
      .writeStream.format("memory").queryName("hist")
      .option("checkpointLocation", Files.createTempDirectory("ck-hist").toString)
      .outputMode("update").start()
    in.addData(Seq(rec("k", "a", 1), rec("k", "b", 2)))
    q.processAllAvailable()
    in.addData(Seq(rec("k", "c", 3), rec("k", "d", 4))) // overflows cap=3
    q.processAllAvailable()
    q.stop()
    val last = spark.table("hist").as[KeyHistory].collect()
      .filter(_.key == "k").last
    assert(last.history == Seq("b", "c", "d"), last.history.mkString(","))
  }

  test("MapState counts per (key, value) accumulate across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    val q = KeyedStats.typeCounts(in.toDS()).toDF()
      .writeStream.format("memory").queryName("tc")
      .option("checkpointLocation", Files.createTempDirectory("ck-tc").toString)
      .outputMode("update").start()
    in.addData(Seq(rec("k1", "click", 1), rec("k1", "click", 2), rec("k1", "view", 3)))
    q.processAllAvailable()
    in.addData(Seq(rec("k1", "click", 4)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tc").as[TypeCount].collect()
    // latest emission for (k1, click) must be the running total 3
    val clicks = rows.filter(r => r.key == "k1" && r.value == "click").map(_.n)
    assert(clicks.max == 3, rows.mkString(";"))
    assert(rows.exists(r => r.key == "k1" && r.value == "view" && r.n == 1))
  }
}
