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
