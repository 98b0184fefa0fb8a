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

  /** One double as a literal DuckDB parses DIRECTLY as DOUBLE: an
    * exponent marker forces the approximate-literal (strtod) path,
    * which is correctly rounded. A plain decimal literal would type as
    * DECIMAL — and DuckDB's DECIMAL→DOUBLE cast is NOT correctly
    * rounded (int128 mantissa and 10^scale are each rounded to double
    * before the divide), so `0.10756008327007294` can come back one
    * ulp off. Found live: the emb_incremental_neardups cos column
    * diverged 1-2 ulp through exactly this seam. */
  def dbl(x: Double): String = {
    val s = x.toString
    if (s.indexOf('E') >= 0) s else s + "e0"
  }

  /** Exact double-literal list (every element through [[dbl]], so the
    * list types as DOUBLE[] with correctly-rounded parsing). */
  def dlst(a: Array[Double]): String =
    a.map(dbl).mkString("[", ", ", "]")

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

  /** VALUES table of the seed-42 BRP planes as (tbl, hidx, w) rows —
    * the inlined Similarity.lshPlanes state. */
  def brpPlanesValues(planes: Array[Array[Array[Double]]]): String = {
    val rows = (for {
      (t, ti) <- planes.zipWithIndex
      (w, hi) <- t.zipWithIndex
    } yield s"($ti, $hi, ${dlst(w)})").mkString(",\n    ")
    s"""pl AS (
       |  SELECT CAST(t AS INT) AS tbl, CAST(hi AS INT) AS hidx, w
       |  FROM (VALUES
       |    $rows) AS _pl(t, hi, w))""".stripMargin
  }

  /** CTE chain hashing a (vec_id, ev) relation into (vec_id, tbl, h)
    * bucket rows under the shared `pl` planes table — the exact JVM
    * arithmetic of Similarity.hashedBuckets: norm Σx² (index fold),
    * inv = 1/sqrt(n) (0 for the zero vector), per-plane projection
    * Σ (ev[j]·inv)·w[j], floor(proj/bucketLength), and the m-wide
    * AND-fold key = key·1000003 + f with Java's wrapping long
    * arithmetic (HUGEINT + explicit signed mod 2^64). `p` prefixes the
    * CTE names so two sides can hash in one statement; the bucket rows
    * land in `<p>bk`. */
  def brpBucketCtes(src: String, bucketLength: Double, p: String): String =
    s"""${p}b AS (
       |  SELECT vec_id, ev,
       |         CASE WHEN nn = 0 THEN 0.0 ELSE 1.0 / sqrt(nn) END AS inv
       |  FROM (SELECT vec_id, ev,
       |          list_reduce(list_transform(ev,
       |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |            (a, b2) -> a + b2) AS nn
       |        FROM $src)),
       |${p}fl AS (
       |  SELECT ${p}b.vec_id, pl.tbl, pl.hidx,
       |         CAST(FLOOR(list_reduce(list_transform(range(1, len(${p}b.ev) + 1),
       |           j -> (CAST(${p}b.ev[j] AS DOUBLE) * ${p}b.inv) * pl.w[j]),
       |           (x, y) -> x + y) / $bucketLength) AS BIGINT) AS f
       |  FROM ${p}b CROSS JOIN pl),
       |${p}bk AS (
       |  SELECT vec_id, tbl,
       |         CAST(list_reduce(
       |           list_prepend(CAST(1125899906842597 AS HUGEINT),
       |             list_transform(list(f ORDER BY hidx),
       |               x -> CAST(x AS HUGEINT))),
       |           (k, f2) -> ((((k * 1000003 + f2) + 9223372036854775808)
       |                        % 18446744073709551616)
       |                       + 18446744073709551616)
       |                      % 18446744073709551616
       |                      - 9223372036854775808) AS BIGINT) AS h
       |  FROM ${p}fl GROUP BY vec_id, tbl)""".stripMargin

  /** (vec_id, ev, nrm) over a source relation — the precomputed norms
    * of the cosine_sim replication (dot / (nrm_a * nrm_b)). */
  def normCte(src: String, name: String): String =
    s"""$name AS (
       |  SELECT vec_id, ev,
       |         sqrt(list_reduce(list_transform(ev,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |           (a, b2) -> a + b2)) AS nrm
       |  FROM $src)""".stripMargin

  /** Index-order cosine fold between two (ev, nrm) sides. */
  def cosExpr(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a.ev) + 1),
       |          i -> CAST($a.ev[i] AS DOUBLE) * CAST($b.ev[i] AS DOUBLE)),
       |          (x, y) -> x + y) / ($a.nrm * $b.nrm)""".stripMargin

  /** VALUES rows for an inlined small vector table (vec_id, ev). */
  def vecValues(rows: Seq[(Long, Array[Double])]): String =
    rows.map { case (id, v) => s"($id, ${dlst(v)})" }.mkString(",\n    ")

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
