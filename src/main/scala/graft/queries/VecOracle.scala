package graft.queries

/** Shared DuckDB SQL fragments for the LAZY oracles of trained-model
  * queries (QueryDef.lazyOracle): the Spark side trains the model state
  * (k-means centroids, PQ codebooks) at Verify time, inlines it here as
  * exact shortest-round-trip double literals, and DuckDB reproduces the
  * DETERMINISTIC downstream arithmetic — cell assignment, proto scores,
  * PQ encode, IVF probe — bit-for-bit. The training itself stays
  * test-verified (planted-structure specs); what the oracle buys is a
  * hash check on every per-row consumption of that state.
  *
  * Bit-identity contract (the emb_pca_project / emb_kmeans precedent):
  *   - literals: Scala `Double.toString` is shortest-round-trip; DuckDB
  *     parses the same digits to the same double (decimal literals cast
  *     exactly, E-notation parses as DOUBLE directly);
  *   - folds: every cross-engine reduction is an INDEX-ORDER
  *     list_reduce, matching the JVM while-loops / Spark HOF fold order;
  *   - model state: assignCells / pqTrain centroid means ride 1e-12
  *     floor-quantized exact integer sums (order-independent), so the
  *     gen run and the query run see bit-identical state;
  *   - ties: every argmin / rank breaks ties on the id (ROW_NUMBER
  *     ORDER BY d, cell — the stable-sort / strict-< JVM behavior).
  */
private[queries] object VecOracle {

  /** Exact double-literal list, cast element-wise to DOUBLE (plain
    * decimal literals would otherwise type as DECIMAL in DuckDB). */
  def dlst(a: Array[Double]): String =
    a.map(_.toString).mkString(
      "list_transform([", ", ", "], x -> CAST(x AS DOUBLE))")

  /** VALUES table of (cell: int, <listCol>: double[]) rows, one per
    * centroid, cell = position in the (collapsed) centroid array. */
  def cellValues(cs: Array[Array[Double]], listCol: String,
      name: String): String = {
    val rows = cs.zipWithIndex
      .map { case (c, i) => s"($i, ${dlst(c)})" }.mkString(",\n    ")
    s"""$name AS (SELECT CAST(c AS INT) AS cell, $listCol FROM (VALUES
       |    $rows) AS _$name(c, $listCol))""".stripMargin
  }

  /** Index-order squared-L2 fold between a double-list column and a
    * centroid list column — the JVM nearestCell / SquaredL2 loop. */
  def sqL2(v: String, cv: String): String =
    s"""list_reduce(list_transform(range(1, len($v) + 1),
       |        i -> ($cv[i] - $v[i]) * ($cv[i] - $v[i])), (a, b) -> a + b)""".stripMargin

  /** Index-order dot-product fold. */
  def dot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |        i -> $a[i] * $b[i]), (x, y) -> x + y)""".stripMargin

  /** CTE chain reproducing Similarity.assignCells' ASSIGNMENT over the
    * inlined trained centroids:
    *   cent(cell, cv)       — the centroid matrix (VALUES literal)
    *   e(vec_id, ev, v)     — raw float list + double-cast list
    *   nv(vec_id, u)        — unit-normalized v (JVM normalizedVectors:
    *                          left-fold norm, elementwise divide, zero
    *                          vectors kept raw)
    *   asg(vec_id, u, cell) — argmin cell, ties to the lowest cell id
    * Use inside `WITH [RECURSIVE] ${assignCtes(cs)}, ...`. */
  def assignCtes(cs: Array[Array[Double]]): String =
    s"""${cellValues(cs, "cv", "cent")},
       |e AS (
       |  SELECT vec_id, embedding AS ev,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |nv AS (
       |  SELECT vec_id,
       |         CASE WHEN nn = 0 THEN v
       |              ELSE list_transform(v, x -> x / nn) END AS u
       |  FROM (SELECT vec_id, v,
       |          sqrt(list_reduce(list_transform(v, x -> x * x),
       |            (a, b) -> a + b)) AS nn
       |        FROM e)),
       |asg AS (
       |  SELECT vec_id, u, cell FROM (
       |    SELECT nv.vec_id, nv.u, cent.cell,
       |           ROW_NUMBER() OVER (PARTITION BY nv.vec_id ORDER BY
       |             ${sqL2("u", "cent.cv")},
       |             cent.cell) AS rn
       |    FROM nv CROSS JOIN cent)
       |  WHERE rn = 1)""".stripMargin
}
