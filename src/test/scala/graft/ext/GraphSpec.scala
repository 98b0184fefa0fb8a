package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** ext.Graph.pageRank: closed-form fixtures the DuckDB oracle can't
  * cheaply parameterize (the registry row pins one concrete graph; these
  * pin the operator's math and its plan discipline).
  */
class GraphSpec extends SparkSpec {

  private def edgeDf(edges: Seq[(Long, Long)]) = {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(edges.map(e => Row(e._1, e._2)), 4),
      schema)
  }

  test("pageRank: symmetric 2-cycle stays uniform at every iteration") {
    // both nodes have outdeg 1 and feed each other: r = 0.15/2 + 0.85*r
    // has fixed point 0.5, and the uniform start IS the fixed point (up
    // to the 1e-15 contribution quantization).
    val out = Graph.pageRank(edgeDf(Seq((1L, 2L), (2L, 1L))), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set(1L, 2L))
    out.values.foreach(v => assert(math.abs(v - 0.5) < 1e-12, out))
  }

  test("pageRank: hub receives more mass than spokes, total mass ~ 1") {
    // star with back-edges: 1..4 -> 0 and 0 -> 1..4. Node 0 collects
    // four full shares each sweep, spokes a quarter share each.
    val spokes = (1L to 4L)
    val edges = spokes.map(s => (s, 0L)) ++ spokes.map(s => (0L, s))
    val out = Graph.pageRank(edgeDf(edges), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === 5)
    spokes.foreach(s => assert(out(0L) > out(s), out))
    val mass = out.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass drifted: $mass")
  }

  test("pageRank: result is identical at 2 vs 4 shuffle partitions") {
    val edges = (0L until 40L).flatMap { i =>
      Seq((i, (i + 1) % 40), (i, (i * 7 + 3) % 40), ((i * 3) % 40, i))
    }
    def run(parts: String) = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Graph.pageRank(edgeDf(edges), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    assert(run("2") === run("4"),
      "decimal-quantized sums must be partition-count invariant")
  }
}
