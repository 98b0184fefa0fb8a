package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative link-graph analytics. The concrete consumer is web-corpus
  * curation: link centrality is a standard document-quality prior at
  * pretraining scale (Common Crawl ranks hosts by harmonic centrality;
  * OPIC/PageRank variants gate crawl frontiers), so a training-data
  * engine needs a rank pass over a billion-edge host graph.
  *
  * Scale shape: one iteration = one equi-join of the edge list with the
  * node-sized rank frame plus one map-side-combinable aggregation keyed
  * by dst — the canonical Spark PageRank plan. Edges are the only large
  * input and are scanned once per iteration on the same join key (src),
  * so pre-partitioning/bucketing the edge list by src makes every
  * iteration co-located at cluster scale; ranks/degrees are node-sized.
  * No Window, no driver-side state beyond the node count. Rank sums are
  * decimal-accumulated (see [[graft.Det]]) so results are bit-stable
  * across partitionings and engines.
  */
object Graph {

  /** `iters` damped PageRank sweeps over a directed edge list
    * (src: bigint, dst: bigint). Contract: every node appears as a src
    * (no dangling mass) — callers modeling undirected graphs emit both
    * directions, which satisfies this by construction. Returns
    * (id, r) with r on the IEEE-deterministic path: per-row divisions
    * are pointwise, cross-row sums are exact DECIMAL(38,18).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      teleport: Double = 0.15): DataFrame = {
    // teleport is a separate literal, NOT computed as 1.0 - damping:
    // IEEE 1.0 - 0.85 = 0.15000000000000002 != the double literal 0.15
    // the oracle SQL carries, and the hash gate sees every ulp.
    require(iters >= 1, s"need iters >= 1, got $iters")
    // The edge list is scanned iters+1 times; materialize it once
    // (upstream joins/distincts would otherwise re-execute per sweep).
    // At cluster scale this is persist-to-memory-and-disk of the edge
    // relation — the standard iterative-graph discipline.
    val e = edges.localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val n = deg.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    var ranks = deg.select(col("src").as("id"),
      (lit(1.0) / lit(n.toDouble)).as("r"))
    var it = 0
    while (it < iters) {
      // Contributions are quantized to integer 1e-15 units with FLOOR
      // before the cross-row sum: floor(c*1e15) is an integer-valued
      // double (exact cast to DECIMAL — no fractional rounding, which
      // engines disagree on at the last decimal digit), and the decimal
      // sum is exact and order-independent. Per-dst mass <= 1, so the
      // unit sum stays < 2^53 and converts back to double exactly.
      ranks = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"),
          floor((col("r") / col("outdeg")) * lit(1.0e15)).as("cu"))
        .groupBy("dst")
        .agg(sum(col("cu").cast(DecimalType(38, 0))).cast("double").as("su"))
        .select(col("dst").as("id"),
          (lit(teleport / n) +
            lit(damping) * (col("su") / lit(1.0e15))).as("r"))
      it += 1
      // bound lineage/plan depth on long runs (analyzed-tree growth is
      // multiplicative per sweep — same lesson as CorpusBuild r9)
      if (it % 4 == 0 && it < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** `iters` SYNCHRONOUS label-propagation sweeps (community detection —
    * the cluster-the-near-dup-groups / topic-blocking step, Raghavan et
    * al. 2007 in deterministic form): each sweep every node adopts the
    * most frequent label among its in-neighbors, ties broken by the
    * SMALLEST label, nodes with no neighbors keep their label. Fixed
    * sweep count + deterministic tie-break makes the result well-defined
    * (plain LPA is run-order-dependent; sync + min-tiebreak is the
    * reproducible variant, at the cost of possible 2-cycles on bipartite
    * cores — callers pick small `iters`).
    *
    * Inputs: `nodes` (node: bigint) — every vertex, isolated ones
    * included; `edges` (a, b) directed — undirected callers emit both
    * directions. One sweep = one map-side-combinable (dst,label) count
    * + a window over node-sized vote groups + a node-sized left join:
    * all shuffles keyed by node id, edge list scanned once per sweep.
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val e = edges.localCheckpoint()
    var labs = nodes.select(col("node"), col("node").cast("long").as("lab"))
    var it = 0
    while (it < iters) {
      val votes = e
        .join(labs.withColumnRenamed("node", "a"), "a")
        .groupBy(col("b"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
      val winner = votes
        .withColumn("rn", row_number().over(
          Window.partitionBy("b").orderBy(col("cnt").desc, col("lab"))))
        .filter(col("rn") === 1)
        .select(col("b").as("node"), col("lab").as("wlab"))
      labs = labs.join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("wlab"), col("lab")).as("lab"))
      it += 1
      if (it % 4 == 0 && it < iters) labs = labs.localCheckpoint()
    }
    labs
  }
}
