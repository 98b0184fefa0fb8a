package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** QuantileTracker: the streaming twin of the batch percentile family
  * (agg_core's exact median / percentile_approx). Claims: (1) REPLAY
  * PARITY in the exact regime — per-group streamed p50/p90/p99 equal
  * the batch discrete percentiles (rank ceil(q*n)) of the same fixture
  * slice bit-for-bit; (2) the histogram degradation is a one-time seam
  * that loses no values and lands within the one-bin-width error bound
  * on a planted uniform stream; (3) state stays bounded (histogram
  * rows, not value rows) while the stream grows; (4) policy contract
  * (null skip, fail-loud non-numeric). */
class StreamingQuantileSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rec(shard: String, v: String) =
    KeyedRecord(shard, v, "events", 0, null)

  test("replay parity: exact-regime snapshots == batch discrete percentiles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.Tables.events(spark, sf()).orderBy("ts", "event_id")
      .limit(2000).localCheckpoint()
    // batch truth: per-type discrete percentile at rank ceil(q*n) via an
    // unambiguous window rank (percentile() interpolates; this doesn't)
    evs.createOrReplaceTempView("qevs")
    val batch = spark.sql(
      """SELECT event_type,
        |       MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END) AS p50,
        |       MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN value END) AS p90,
        |       MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN value END) AS p99
        |FROM (SELECT event_type, value,
        |             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |             COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM qevs WHERE value IS NOT NULL)
        |GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

    val in = MemoryStream[KeyedRecord]
    val out = QuantileTracker(in.toDS())
      .writeStream.format("memory").queryName("q_out")
      .option("checkpointLocation", tmp("ckpt-q"))
      .outputMode("append")
      .start()
    val recs = evs.filter(col("value").isNotNull)
      .select(col("event_type").as("key"),
        col("value").cast("string").as("value"),
        lit("events").as("topic"), lit(0).as("partition"), col("ts"))
      .as[KeyedRecord].collect()
    recs.grouped(700).foreach { g => in.addData(g.toSeq); out.processAllAvailable() }
    out.stop()

    val snaps = spark.table("q_out").as[QuantileSnapshot].collect()
    val maxN = snaps.groupBy(_.shard).view.mapValues(_.map(_.nSeen).max).toMap
    val fin = snaps.filter(s => s.nSeen == maxN(s.shard))
    assert(fin.nonEmpty && fin.forall(_.exact),
      "expected the exact regime at this slice size")
    fin.foreach { s =>
      val (p50, p90, p99) = batch(s.shard)
      assert(s.p50 == p50 && s.p90 == p90 && s.p99 == p99,
        s"${s.shard}: streamed (${s.p50},${s.p90},${s.p99}) != " +
          s"batch ($p50,$p90,$p99)")
    }
  }

  test("histogram seam: bounded error on a planted uniform stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    // cap 2000, 1024 bins; 20k uniform draws from [0, 100000): seam-time
    // padded range <= 1.5 * 100000, so bin width <= ~147 — assert the
    // documented one-bin-width bound with 2x slack for the clamp
    val out = QuantileTracker(in.toDS(), exactCap = 2000, bins = 1024)
      .writeStream.format("memory").queryName("q_seam_out")
      .option("checkpointLocation", tmp("ckpt-q-seam"))
      .outputMode("append")
      .start()
    val rnd = new scala.util.Random(42)
    val draws = Array.fill(20000)(rnd.nextInt(100000).toDouble)
    draws.grouped(5000).foreach { g =>
      in.addData(g.map(v => rec("s0", v.toString)).toSeq)
      out.processAllAvailable()
    }
    out.stop()
    val snaps = spark.table("q_seam_out").as[QuantileSnapshot].collect()
    val fin = snaps.filter(_.nSeen == snaps.map(_.nSeen).max).head
    assert(!fin.exact && fin.nSeen == 20000L)
    val sorted = draws.sorted
    def truth(q: Double) = sorted(math.ceil(q * sorted.length).toInt - 1)
    val bound = 2.0 * (1.5 * 100000.0) / 1024.0
    Seq(0.5 -> fin.p50, 0.9 -> fin.p90, 0.99 -> fin.p99).foreach {
      case (q, est) =>
        assert(math.abs(est - truth(q)) <= bound,
          s"p$q: est $est vs truth ${truth(q)} exceeds bound $bound")
    }
  }

  test("degenerate seam: constant large-magnitude values terminate with an ulp-floored grid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // |v| ~ 3e7: at this magnitude the 1e-9 seam pad is absorbed by
    // double rounding (lo == mn, mx + pad == mx) so the raw bin width is
    // 0.0 — before the ulp floor, the first post-seam value spun
    // widenToFit forever (width *= 2 stays 0). Assert the stream now
    // terminates and the histogram still answers the constant exactly.
    val in = MemoryStream[KeyedRecord]
    val out = QuantileTracker(in.toDS(), exactCap = 4, bins = 16)
      .writeStream.format("memory").queryName("q_degen_out")
      .option("checkpointLocation", tmp("ckpt-q-degen"))
      .outputMode("append")
      .start()
    in.addData((0 until 50).map(_ => rec("c0", "30000000")))
    out.processAllAvailable()
    val snaps = spark.table("q_degen_out").as[QuantileSnapshot].collect()
    val fin = snaps.filter(_.nSeen == snaps.map(_.nSeen).max).head
    assert(!fin.exact && fin.nSeen == 50L)
    // interpolation is clamped to [trueMin, trueMax] = the constant
    assert(fin.p50 == 3.0e7 && fin.p90 == 3.0e7 && fin.p99 == 3.0e7,
      s"constant stream must report the constant: $fin")
    // non-finite values have no grid position — contract violation
    in.addData(Seq(rec("c0", "Infinity")))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      out.processAllAvailable()
    }
    assert(Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null)
      .take(8).exists(t => t.getMessage != null &&
        t.getMessage.contains("non-finite")),
      s"Infinity must fail loud: ${e.getMessage}")
    out.stop()
  }

  test("state rows stay group-bounded through the seam; null skip; non-numeric loud") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KeyedRecord]
    val out = QuantileTracker(in.toDS(), exactCap = 100, bins = 64)
      .writeStream.format("memory").queryName("q_bound_out")
      .option("checkpointLocation", tmp("ckpt-q-bound"))
      .outputMode("append")
      .start()
    var maxState = 0L
    (0 until 4).foreach { b =>
      in.addData(((0 until 300).map(i => rec("g0", (b * 300 + i).toString))
        :+ rec("g0", null)).toSeq)
      out.processAllAvailable()
      val rows = out.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal)
      if (rows.nonEmpty) maxState = math.max(maxState, rows.max)
    }
    // one state row per GROUP (the histogram lives inside it), never
    // per value: 1200 values streamed, 1 group
    assert(maxState > 0L && maxState <= 4L,
      s"state must stay group-bounded, saw $maxState")
    val snaps = spark.table("q_bound_out").as[QuantileSnapshot].collect()
    val fin = snaps.filter(_.nSeen == snaps.map(_.nSeen).max).head
    assert(fin.nSeen == 1200L, s"nulls must be skipped: ${fin.nSeen}")
    // the ramp 0..1199 drifts far past the seam-time grid ([-25, 125)):
    // power-of-two widening must track it — final grid spans <= ~2400,
    // so one bin width <= 2400/64 = 37.5; truth p99 = 1188
    assert(math.abs(fin.p99 - 1188.0) <= 40.0,
      s"widened-grid p99 must track the drifted tail: ${fin.p99}")
    in.addData(Seq(rec("g0", "not-a-number")))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      out.processAllAvailable()
    }
    assert(Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null)
      .take(8).exists(t => t.isInstanceOf[NumberFormatException] ||
        (t.getMessage != null && t.getMessage.contains("not-a-number"))),
      s"non-numeric input must fail loud: ${e.getMessage}")
    out.stop()
  }
}
