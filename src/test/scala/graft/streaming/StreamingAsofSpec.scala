package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** AsofEnricher: the streaming twin of the batch `join_asof` operator —
  * the FOURTH batch/stream parity pair. Core claim: bootstrapping the
  * deduped click timeline and streaming the purchase facts of a bounded
  * null-free slice reproduces the batch union+window rows exactly, with
  * state carried across micro-batch boundaries. */
class StreamingAsofSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("replay parity: streamed as-of enrichment == batch join_asof") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf())
      .filter(col("ts").isNotNull)
      .orderBy("ts", "event_id").limit(600)
      .localCheckpoint()
    val dir = tmp("asof-fixture")
    evs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("join_asof")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet

    // dimension side: clicks deduped to one row per (user, ts) with
    // MAX(event_id) — exactly the batch query's B-side dedup
    val dim = evs.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("b_event"))
      .select(col("user_id").cast("string").as("key"),
        col("b_event").cast("string").as("value"),
        lit("dim").as("topic"), lit(0).as("partition"), col("ts"))
      .as[KeyedRecord]
    val facts = evs.filter(col("event_type") === "purchase")
      .select(col("user_id").cast("string").as("key"),
        col("event_id").cast("string").as("value"),
        lit("events").as("topic"), lit(0).as("partition"), col("ts"))
      .as[KeyedRecord].collect()
      .sortBy(r => (r.ts.getTime, r.value))

    val input = MemoryStream[KeyedRecord]
    val out = AsofEnricher.bootstrapped(input.toDS(), dim)
      .writeStream.format("memory").queryName("asof_out")
      .option("checkpointLocation", tmp("ckpt-asof"))
      .outputMode("append")
      .start()
    // multiple micro-batches: the timeline state must bridge them
    facts.grouped(60).foreach { g => input.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val streamed = spark.table("asof_out").as[AsofEnriched].collect()
      .map(e => (e.key.toLong, e.aEvent.toLong, e.bEvent.map(_.toLong)))
      .toSet
    assert(streamed === batch,
      s"stream/batch diverge: onlyStream=${(streamed diff batch).take(5)} " +
        s"onlyBatch=${(batch diff streamed).take(5)}")
    assert(streamed.nonEmpty, "parity fixture produced no purchases")
  }

  test("mid-stream dimension upserts apply to later facts only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRecord]
    val out = AsofEnricher(input.toDS())
      .writeStream.format("memory").queryName("asof_upd_out")
      .option("checkpointLocation", tmp("ckpt-asof-upd"))
      .outputMode("append")
      .start()
    def rec(topic: String, v: String, tsMs: java.lang.Long) = KeyedRecord(
      "k1", v, topic, 0,
      if (tsMs == null) null else new java.sql.Timestamp(tsMs))
    // batch 1: the version lands alone (same-ts rows WITHIN one batch
    // resolve by orderKey — value order — so the defined way to get
    // equal-ts semantics is the version arriving in an earlier batch,
    // exactly like the bootstrapped timeline)
    input.addData(Seq(rec("dim", "v1", 1000L)))
    out.processAllAvailable()
    // batch 2: facts at 500 (before any version), 1000 (equal ts —
    // inclusive), 1500
    input.addData(Seq(rec("events", "f0", 500L), rec("events", "f1", 1000L),
      rec("events", "f2", 1500L)))
    out.processAllAvailable()
    // batch 3: version v2@2000 lands, then facts around it; also a
    // same-ts REPLACE of v1 (upsert) and null-ts/tombstone skips
    input.addData(Seq(rec("dim", "v2", 2000L), rec("events", "f3", 1999L),
      rec("events", "f4", 2000L), rec("dim", "v1b", 1000L),
      rec("events", null, 3000L), rec("dim", "vX", null),
      rec("events", "f5", 3000L)))
    out.processAllAvailable(); out.stop()

    val got = spark.table("asof_upd_out").as[AsofEnriched].collect()
      .map(e => e.aEvent -> e.bEvent).toMap
    assert(got("f0") === None)
    assert(got("f1") === Some("v1")) // equal-ts version applies
    assert(got("f2") === Some("v1"))
    // within batch 3 the orderKey (ts asc, then value) applies the
    // 1000-ts replace before the 1999 fact, and the 2000-ts version
    // before the 3000 fact; the SAME-ts fact f4 sorts before the v2
    // update ("f4" < "v2") — the documented within-batch policy, so it
    // still sees v1b
    assert(got("f3") === Some("v1b"))
    assert(got("f4") === Some("v1b"))
    assert(got("f5") === Some("v2"))
    assert(got.size === 6)
  }

  test("floorIndex/upsert kernels: boundaries, replace, ordering") {
    val tl0 = DimTimeline(Array.emptyLongArray, Array.empty[String])
    assert(AsofEnricher.floorIndex(tl0.tsMillis, 5L) === -1)
    val tl1 = AsofEnricher.upsert("k", tl0, 20L, "b")
    val tl2 = AsofEnricher.upsert("k", tl1, 10L, "a")
    val tl3 = AsofEnricher.upsert("k", tl2, 30L, "c")
    assert(tl3.tsMillis.toSeq === Seq(10L, 20L, 30L))
    assert(tl3.version.toSeq === Seq("a", "b", "c"))
    assert(AsofEnricher.floorIndex(tl3.tsMillis, 9L) === -1)
    assert(AsofEnricher.floorIndex(tl3.tsMillis, 10L) === 0)
    assert(AsofEnricher.floorIndex(tl3.tsMillis, 25L) === 1)
    assert(AsofEnricher.floorIndex(tl3.tsMillis, 99L) === 2)
    val tl4 = AsofEnricher.upsert("k", tl3, 20L, "b2")
    assert(tl4.version.toSeq === Seq("a", "b2", "c"))
    assert(tl4.tsMillis.length === 3)
  }
}
