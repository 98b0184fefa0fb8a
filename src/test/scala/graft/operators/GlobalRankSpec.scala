package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Correctness of the two-pass global rank/cumsum operator against the
  * naive single-partition truth, plus partitioning invariance (the
  * property the broadcast-offset composition must not break). */
class GlobalRankSpec extends SparkSpec {

  test("withGlobalRowNumber equals the naive global row_number, any input partitioning") {
    val cust = Tables.customer(spark, sf()).select("c_custkey", "c_acctbal")
    val naive = cust.orderBy("c_acctbal", "c_custkey")
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (k, i) => k -> (i + 1).toLong }.toMap
    for (df <- Seq(cust, cust.repartition(7), cust.repartition(1))) {
      val (ranked, n) = GlobalRank.withGlobalRowNumber(
        df, Seq(col("c_acctbal"), col("c_custkey")), "rn")
      assert(n == naive.size)
      val got = ranked.select("c_custkey", "rn")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive)
    }
  }

  test("monotonically_increasing_id local-index encoding ((pid<<33)+idx) holds") {
    // withGlobalRowNumber derives the partition-local row number from
    // Spark's documented monotonically_increasing_id layout
    // ((partitionId << 33) + row-index-in-iteration-order). The
    // operator's 2^31 require guards partition SIZE, not the layout —
    // this spec guards the layout (ADVICE r19): rebuild the exact
    // ranged/sorted/mid-masked construction and assert the masked low
    // bits equal row_number over the same per-partition order, so a
    // future encoding change fails HERE loudly instead of silently
    // corrupting every rank the operator hands out.
    import org.apache.spark.sql.expressions.Window
    val df = Tables.customer(spark, sf()).select("c_custkey", "c_acctbal")
      .repartitionByRange(7, col("c_acctbal"), col("c_custkey"))
      .sortWithinPartitions(col("c_acctbal"), col("c_custkey"))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn_mid",
        (monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) + 1L)
          .cast("int"))
    val w = Window.partitionBy("_pid")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val mismatches = df.withColumn("_lrn_win", row_number().over(w))
      .filter(col("_lrn_mid") =!= col("_lrn_win")).count()
    assert(mismatches == 0L)
  }

  test("withGlobalCumSumBefore equals the naive exclusive prefix sum") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("v"))
    val rows = docs.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = rows.map(_._1)
      .zip(rows.map(_._2).scanLeft(0L)(_ + _)).toMap
    val got = GlobalRank
      .withGlobalCumSumBefore(docs.repartition(5), Seq(col("doc_id")), col("v"), "cum")
      .select("doc_id", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive)
  }

  test("withGroupedCumSumBefore equals the plain grouped window, incl. a mega-group") {
    import org.apache.spark.sql.expressions.Window
    // documents' real source groups PLUS one synthetic mega-group
    // holding ~half the corpus — the skew case the operator exists for
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("mega")).otherwise(col("source"))
          .as("source"),
        col("n_chars"),
        size(split(col("text"), "\\s+")).cast("long").as("v"))
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("cum", coalesce(sum("v").over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    for ((df, p) <- Seq((docs, 0), (docs.repartition(7), 4), (docs, 11))) {
      val got = GlobalRank.withGroupedCumSumBefore(df, col("source"),
          Seq(col("n_chars").desc, col("doc_id")), col("v"), "cum",
          numPartitions = p)
        .select("doc_id", "cum")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive, s"p=$p")
      graft.ext.Caches.releaseAll(spark)
    }
  }

  test("withRangeFrameAgg equals the naive global range window, any input partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // continuous values with duplicates (range-frame peers), awkward
    // spread so partition boundaries fall inside frame windows
    val r = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (i.toLong, math.floor(r.nextDouble() * 200) / 2.0, i % 7 + 1))
    val df = rows.toDF("id", "x", "v").repartition(9)
    val naive = df
      .withColumn("n", count(lit(1)).over(
        Window.orderBy("x").rangeBetween(-10L, 10L)))
      .withColumn("s", sum("v").over(
        Window.orderBy("x").rangeBetween(-10L, 10L)))
      .select("id", "n", "s")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = GlobalRank.withRangeFrameAgg(df, col("x"),
        before = 10.0, after = 10.0,
        aggs = Map("n" -> "count(1)", "s" -> "sum(v)"), numPartitions = 8)
      .select("id", "n", "s")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == rows.size, s"row count drift: ${got.size}")
    assert(got == naive)
    graft.ext.Caches.releaseAll(spark)
    // empty input: correctly-typed empty output, no throw
    assert(GlobalRank.withRangeFrameAgg(df.limit(0), col("x"), 10.0, 10.0,
      Map("n" -> "count(1)")).count() == 0)
    graft.ext.Caches.releaseAll(spark)
    // NULL order key (ADVICE r8): a plain RANGE window peers NULLs; this
    // operator can't, so it must refuse loudly rather than silently drop
    // the rows (or NPE on an all-NULL range partition)
    val withNull = df.withColumn("x",
      when(col("id") === 3L, lit(null)).otherwise(col("x")))
    val ex = intercept[IllegalArgumentException] {
      GlobalRank.withRangeFrameAgg(withNull, col("x"), 10.0, 10.0,
        Map("n" -> "count(1)")).count()
    }
    assert(ex.getMessage.contains("NULL order key"))
    graft.ext.Caches.releaseAll(spark)
  }

  test("ntile closed form matches the SQL bucket rule at awkward n/k") {
    // n=10, k=4 -> buckets 3,3,2,2; n=3, k=4 -> buckets of 1
    val expect10 = Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4)
    val df = spark.range(1, 11).toDF("rn")
    val got = df.select(GlobalRank.ntileFromRn(col("rn"), 10, 4).as("q"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == expect10)
    val got3 = spark.range(1, 4).toDF("rn")
      .select(GlobalRank.ntileFromRn(col("rn"), 3, 4).as("q"))
      .collect().map(_.getInt(0)).toSeq
    assert(got3 == Seq(1, 2, 3))
  }
}
