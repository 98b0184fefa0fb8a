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

  private def nodeDf(ids: Seq[Long]) = {
    val schema = StructType(Seq(StructField("node", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(Row(_)), 4), schema)
  }

  test("labelPropagation: two cliques + bridge resolve to two communities") {
    // cliques {0,1,2} and {10,11,12}, one bridge 2-10. Majority voting
    // keeps each clique on its own min label; the bridge is outvoted.
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val edges = clique(Seq(0L, 1L, 2L)) ++ clique(Seq(10L, 11L, 12L)) ++
      Seq((2L, 10L), (10L, 2L))
    val out = Graph.labelPropagation(
      nodeDf(Seq(0L, 1L, 2L, 10L, 11L, 12L, 99L)), edgeDf(edges)
        .withColumnRenamed("src", "a").withColumnRenamed("dst", "b"),
      iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique is internally uniform and the two communities stay
    // DISTINCT (the exact winning label depends on how the min tie-break
    // resolves the bridge's 3-way tie — {10,11,12} legitimately lands on
    // label 2 — so assert structure, not label values)
    val c1 = Seq(0L, 1L, 2L).map(out).toSet
    val c2 = Seq(10L, 11L, 12L).map(out).toSet
    assert(c1.size === 1, out)
    assert(c2.size === 1, out)
    assert(c1 != c2, s"cliques must not merge: $out")
    assert(out(99L) === 99L, "isolated node keeps its own label")
  }

  test("labelPropagation: deterministic across shuffle partitionings") {
    val edges = (0L until 30L).flatMap { i =>
      Seq((i, (i + 1) % 30), ((i + 1) % 30, i), (i, (i * 7 + 3) % 30))
    }
    def run(parts: String) = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Graph.labelPropagation(nodeDf(0L until 30L), edgeDf(edges)
          .withColumnRenamed("src", "a").withColumnRenamed("dst", "b"),
        iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    assert(run("2") === run("4"),
      "min-label tie-break must make sweeps partition-count invariant")
  }
}
