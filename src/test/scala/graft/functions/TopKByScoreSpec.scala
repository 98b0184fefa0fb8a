package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKByScoreSpec extends SparkSpec {

  test("matches row_number window form including tiebreaks, across partitions") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    // synthetic scores with deliberate ties: score = id % 7 -> many ties,
    // tiebreak must pick smaller id; 40 partitions force partial merges
    val df = spark.range(10000)
      .select(
        (col("id") % 13).as("g"),
        (col("id") % 7).cast("double").as("score"),
        col("id"))
      .repartition(40)
      .cache()

    val viaAgg = df.groupBy("g")
      .agg(expr("topk_by_score(score, id, 5)").as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("t.id").as("id"), col("t.score").as("score"),
        (col("pos") + 1).as("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("g", "id", "score", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    assert(viaAgg == viaWindow,
      s"diff: agg-only=${(viaAgg -- viaWindow).take(5)} window-only=${(viaWindow -- viaAgg).take(5)}")
  }

  test("k larger than group size returns the whole group, ranked") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val out = Seq((1L, 2.0, 10L), (1L, 5.0, 11L), (1L, 5.0, 9L))
      .toDF("g", "score", "id")
      .groupBy("g").agg(expr("topk_by_score(score, id, 100)").as("top"))
      .select(explode(col("top")).as("t")).select("t.id")
      .collect().map(_.getLong(0)).toSeq
    // 5.0 ties: smaller id (9) ranks first; then 11; then the 2.0 row
    assert(out == Seq(9L, 11L, 10L), out.mkString(","))
  }

  test("serialization roundtrip preserves heap content") {
    val buf = new TopKBuffer(3)
    Seq((1.0, 1L), (3.0, 2L), (2.0, 3L), (5.0, 4L), (4.0, 5L))
      .foreach { case (s, i) => buf.add(s, i) }
    val restored = TopKBuffer.fromBytes(buf.toBytes)
    assert(restored.sortedDesc.toSeq == buf.sortedDesc.toSeq)
    assert(restored.sortedDesc.map(_._2).toSeq == Seq(4L, 5L, 2L))
  }
}
