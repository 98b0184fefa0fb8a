package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** TopKTracker: the streaming twin of the batch `agg_approx_top_k`
  * DataSketches row — count-min + bounded candidate table as keyed
  * state. Core claims: (1) REPLAY PARITY in the collision-free regime:
  * replaying the same events slice across micro-batches and merging
  * the final shard snapshots reproduces the batch row's exact top-5;
  * (2) eviction correctness when capacity < distinct items on a
  * planted separated distribution; (3) the skewed-shard error
  * contract fails loud.
  */
class StreamingTopKSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rec(shard: String, item: String) =
    KeyedRecord(shard, item, "events", 0, null)

  test("replay parity: merged shard snapshots == batch agg_approx_top_k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id").limit(900)
      .localCheckpoint()
    val dir = tmp("topk-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("agg_approx_top_k")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    val input = MemoryStream[KeyedRecord]
    val out = TopKTracker(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("topk_out")
      .option("checkpointLocation", tmp("ckpt-topk"))
      .outputMode("append")
      .start()
    // shard by item hash — each item lives in exactly one shard
    val recs = evs.select(
        pmod(hash(col("event_type")), lit(4)).cast("string").as("key"),
        col("event_type").as("value"),
        lit("events").as("topic"), lit(0).as("partition"),
        col("ts"))
      .as[KeyedRecord].collect()
    recs.grouped(300).foreach { g => input.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val snaps = spark.table("topk_out").as[TopKSnapshot].collect()
    // final answer: rows at each shard's max nSeen version
    val maxN = snaps.groupBy(_.shard).view.mapValues(_.map(_.nSeen).max).toMap
    val fin = snaps.filter(s => s.nSeen == maxN(s.shard))
    // distinct event types fit the per-shard capacity here, so the
    // candidate tables hold the FULL exact histogram: merged top-5
    // equals the batch row bit-for-bit
    val trueCnt = evs.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fin.map(_.item).distinct.length == fin.length, "item in two shards")
    fin.foreach(s => assert(s.est == trueCnt(s.item),
      s"est ${s.est} != true ${trueCnt(s.item)} for ${s.item} (collision regime?)"))
    val top5 = fin.sortBy(s => (-s.est, s.item)).take(5).map(s => s.item -> s.est)
    assert(top5.toSeq == batch.toSeq,
      s"streamed ${top5.toSeq} != batch ${batch.toSeq}")
  }

  test("state rows stay == shard count while distinct items grow 10x") {
    // VERDICT r14 item 5: the tracker's state is ONE row per shard (a
    // fixed-size count-min sketch + capacity-capped candidate table),
    // so stateOperators.numRowsTotal must stay at the shard count while
    // the distinct-item stream grows without bound — the probe that
    // would add a state row per ITEM under a naive keyed dedup/count.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRecord]
    val out = TopKTracker(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("topk_bound_out")
      .option("checkpointLocation", tmp("ckpt-topk-bound"))
      .outputMode("append")
      .start()
    var maxState = 0L
    (0 until 4).foreach { b =>
      // 500 FRESH items per batch, spread over 2 shards
      input.addData((0 until 500).map(i => rec((i % 2).toString, s"it$b-$i")))
      out.processAllAvailable()
      val rows = out.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal)
      if (rows.nonEmpty) maxState = math.max(maxState, rows.max)
    }
    out.stop()
    // one row per shard per state variable — a handful, never per-item
    assert(maxState > 0L && maxState <= 8L,
      s"state must stay shard-bounded (2 shards x state vars <= 8) " +
        s"regardless of the 2000 distinct items seen, saw $maxState")
  }

  test("eviction keeps the true heavy hitters when capacity < distinct items") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRecord]
    val out = TopKTracker(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("topk_evict_out")
      .option("checkpointLocation", tmp("ckpt-topk-evict"))
      .outputMode("append")
      .start()
    // 8 distinct items, capacity 3, well-separated counts:
    // heavy: a=40, b=30, c=20; light: d..h = 2 each, interleaved
    val heavy = Seq.fill(40)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val light = Seq("d", "e", "f", "g", "h").flatMap(i => Seq(i, i))
    val items = new scala.util.Random(3).shuffle(heavy ++ light)
    items.grouped(25).foreach { g =>
      input.addData(g.map(rec("s0", _)))
      out.processAllAvailable()
    }
    out.stop()
    val snaps = spark.table("topk_evict_out").as[TopKSnapshot].collect()
    val fin = snaps.filter(_.nSeen == snaps.map(_.nSeen).max)
      .sortBy(s => (-s.est, s.item))
    assert(fin.map(_.item).toSeq == Seq("a", "b", "c"),
      s"got ${fin.toSeq}")
    assert(fin.map(_.est).toSeq == Seq(40L, 30L, 20L))
  }

  test("null items are skipped; oversized shard batch fails loud") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRecord]
    val out = TopKTracker(input.toDS(), k = 2, maxBatchRowsPerKey = 10)
      .writeStream.format("memory").queryName("topk_err_out")
      .option("checkpointLocation", tmp("ckpt-topk-err"))
      .outputMode("append")
      .start()
    input.addData(Seq(rec("s0", null), rec("s0", "x"), rec("s0", "x")))
    out.processAllAvailable()
    val snaps = spark.table("topk_err_out").as[TopKSnapshot].collect()
    assert(snaps.map(s => (s.item, s.est, s.nSeen)).toSeq == Seq(("x", 2L, 2L)))
    // 11 rows on one shard with cap 10: the boundedBuffer contract
    input.addData((1 to 11).map(i => rec("s0", s"i$i")))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      out.processAllAvailable()
    }
    assert(e.getCause != null &&
      Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.getMessage.contains("more than 10 rows")),
      s"unexpected failure chain: ${e.getMessage}")
    out.stop()
  }
}
