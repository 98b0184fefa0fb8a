package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Behavioral checks for the profiling/robust-stats family. The oracle
  * hash-match is the primary gate for all three entries; these tests pin
  * the invariants the oracle can't see (schema-driven generality of the
  * profiler, plan shape, MAD policy on planted outliers).
  */
class ProfileSpec extends SparkSpec {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("profile_columns: one row per schema column, counts consistent") {
    val docs = Tables.documents(spark, sf())
    val n = docs.count()
    val rows = q("profile_columns").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == docs.schema.fieldNames.toSet)
    rows.foreach { case (c, (nRows, nNulls, nDistinct)) =>
      assert(nRows == n, s"$c n_rows")
      assert(nNulls >= 0 && nNulls <= n, s"$c n_nulls")
      assert(nDistinct <= n - nNulls, s"$c n_distinct")
    }
    // doc_id is a unique non-null key in the fixture
    assert(rows("doc_id") == ((n, 0L, n)))
  }

  test("profile: schema-driven — works unchanged on a different table") {
    val li = Tables.lineitem(spark, sf())
    val prof = ProfileQ.profile(li.select("l_orderkey", "l_linenumber", "l_returnflag"))
    val got = prof.collect().map(_.getString(0)).toSet
    assert(got == Set("l_orderkey", "l_linenumber", "l_returnflag"))
    // single-scan shape: no per-column jobs — the plan is one aggregate
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("union"), "profile must not union per-column scans")
  }

  test("profile: hostile column names (spaces, dots, quotes, reserved words, backticks)") {
    // ADVICE r9: names must never be interpolated into parsed SQL —
    // each of these breaks a string-built stack()/expr() unpivot
    val hostile = Seq("a b", "a.b", "it's", "select", "tick`mark", "100%")
    val df = spark.range(3).toDF(hostile.head)
      .withColumn(hostile(1), col("`a b`") * 2)
      .withColumn(hostile(2), lit("x"))
      .withColumn(hostile(3), lit(null: String))
      .withColumn(hostile(4), lit(1.5))
      .withColumn(hostile(5), lit(7L))
    val rows = ProfileQ.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == hostile.toSet)
    assert(rows("a b") == ((3L, 0L, 3L)))
    assert(rows("select") == ((3L, 3L, 0L)), "all-null reserved-word column")
    assert(rows("tick`mark")._2 == 0L)
  }

  test("doc_source_quota: per-source budget policy (first doc always kept)") {
    val out = q("doc_source_quota").cache()
    try {
      // within every source the best-ranked doc has cum_before = 0 -> kept
      val firsts = out.filter(col("cum_before") === 0)
      assert(firsts.filter(!col("keep")).count() == 0)
      val srcs = Tables.documents(spark, sf()).select("source").distinct().count()
      assert(firsts.count() == srcs, "exactly one zero-cum row per source")
      // kept set is a prefix in (n_chars desc, doc_id) order per source:
      // no kept doc may rank below a dropped one in the same source
      val joined = out.as("a").join(out.as("b"),
        col("a.source") === col("b.source") &&
          col("a.cum_before") > col("b.cum_before") &&
          col("a.keep") && !col("b.keep"))
      assert(joined.count() == 0, "kept rows must form a per-source prefix")
    } finally out.unpersist()
  }

  test("evt_anomaly_mad: clean groups quiet, planted spike flagged") {
    import spark.implicits._
    val base = (1 to 400).map(i => ("steady", 100.0 + (i % 21 - 10) * 0.1)) ++
      (1 to 400).map(i => ("spiky", 50.0 + (i % 21 - 10) * 0.1)) ++
      Seq.fill(5)(("spiky", 5000.0))
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    base.toDF("event_type", "value")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("ts", current_timestamp())
      .withColumn("user_id", lit(1L))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("evt_anomaly_mad")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("steady") == 0L, "uniform group must have no outliers")
    assert(out("spiky") == 5L, "exactly the planted spikes flagged")
  }

  test("profile_drift_psi: identical slices score ~0, a planted shift scores high") {
    import spark.implicits._
    // 'stable': the SAME value multiset on both sides of the cutoff ->
    // p == q in every bin -> PSI == 0 exactly (smoothing cancels).
    // 'shifted': low values before, high values after -> large PSI.
    val pre = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val post = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
    val rows =
      (1 to 200).map(i => ("stable", pre, (i % 50).toDouble)) ++
      (1 to 200).map(i => ("stable", post, (i % 50).toDouble)) ++
      (1 to 200).map(i => ("shifted", pre, (i % 10).toDouble)) ++
      (1 to 200).map(i => ("shifted", post, 90.0 + (i % 10).toDouble))
    val dir = java.nio.file.Files.createTempDirectory("psi").toString
    rows.toDF("event_type", "ts", "value")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("user_id", lit(1L))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("profile_drift_psi")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("stable") === 0L, s"identical slices drifted: ${out("stable")}")
    // 0.2 (the conventional investigate line) = 200_000 micro-units
    assert(out("shifted") > 200000L, s"planted shift not flagged: ${out("shifted")}")
  }

  test("profile_expectations: planted violations counted per check") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("expect").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // lineitem: one quantity violation (0), one discount violation (0.5)
    Seq((1L, 5.0, 0.02), (2L, 0.0, 0.03), (3L, 10.0, 0.5))
      .toDF("l_orderkey", "l_quantity", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    // orders: one non-positive price, one out-of-calendar date, one
    // dangling custkey (77)
    Seq((1L, 10L, 100.0, ts("1995-06-01")),
        (2L, 11L, -5.0, ts("1996-06-01")),
        (3L, 77L, 50.0, ts("2050-01-01")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    // customer: one null acctbal
    Seq((10L, Some(5.0)), (11L, None))
      .toDF("c_custkey", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val out = graft.SparkEntry.queries("profile_expectations")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("lineitem.quantity_in_1_60") === ((1L, false)))
    assert(out("lineitem.discount_in_0_0.1") === ((1L, false)))
    assert(out("orders.totalprice_positive") === ((1L, false)))
    assert(out("orders.orderdate_in_calendar") === ((1L, false)))
    assert(out("orders.custkey_fk_customer") === ((1L, false)))
    assert(out("customer.acctbal_not_null") === ((1L, false)))
  }
}
