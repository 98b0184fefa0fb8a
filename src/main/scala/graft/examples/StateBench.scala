package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{KeyedRecord, StatefulStore}

/** R5-parity latency measurement (VERDICT r4 item 8): samsa's `query(key)`
  * is an O(1) get against the LIVE store inside the consumer process
  * (/root/reference/samsa/kafka/storage.py:208-219); the engine's
  * out-of-stream equivalent reads the checkpoint through the state data
  * source. This main builds an upsert checkpoint with N keys (default
  * 10^6), then times:
  *   - full state scan (count)
  *   - point lookups (filter on key, 5 reps after one warm read)
  * Results land in SCALE.md ("Stateful streaming" family).
  *
  * Usage: runMain graft.examples.StateBench [nKeys]
  */
object StateBench {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.nonEmpty) args(0).toInt else 1000000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tmp = Files.createTempDirectory("statebench").toString
    val recs = spark.range(nKeys.toLong).select(
      concat(lit("k"), col("id")).as("key"),
      concat(lit("v"), col("id")).as("value"),
      lit("bench").as("topic"),
      lit(0).as("partition"),
      timestamp_seconds(lit(1700000000L) + col("id") % 86400).as("ts"))
    recs.write.mode("overwrite").parquet(s"$tmp/in")

    def timed[T](what: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[statebench] $what: $dt%.3f s")
      (r, dt)
    }

    val src = spark.readStream.schema(recs.schema).parquet(s"$tmp/in").as[KeyedRecord]
    timed(s"build checkpoint ($nKeys keys)") {
      val q = StatefulStore.upsert(src).toDF()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val (n, _) = timed("full scan (count, cold)") {
      StatefulStore.readState(spark, s"$tmp/ckpt").count()
    }
    require(n == nKeys, s"expected $nKeys state rows, got $n")

    // one warm read, then 5 timed point lookups on distinct keys
    StatefulStore.readState(spark, s"$tmp/ckpt")
      .filter(col("key.value") === "k0").collect()
    val lookups = (1 to 5).map { i =>
      val k = s"k${i.toLong * (nKeys / 7)}"
      val (rows, dt) = timed(s"point lookup $k") {
        StatefulStore.readState(spark, s"$tmp/ckpt")
          .filter(col("key.value") === k).collect()
      }
      require(rows.length == 1, s"lookup $k returned ${rows.length} rows")
      dt
    }
    println(f"[statebench] point lookup avg over 5: ${lookups.sum / lookups.size}%.3f s")
    spark.stop()
  }
}
