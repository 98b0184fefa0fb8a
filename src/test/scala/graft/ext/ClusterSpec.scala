package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ext.Embeddings: Lloyd's k-means, one-pass covariance, Jacobi eigen,
  * PCA projection. Planted-structure invariants that no DuckDB oracle can
  * express (eigendecomposition), plus the covariance cross-check that
  * ties the treeAggregate scale path to the oracle-paired emb_covariance
  * query discipline.
  */
class ClusterSpec extends SparkSpec {

  private val dim = 8

  private def embDf(rows: Seq[(Long, Array[Float], Int)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2.toSeq, r._3)), 4),
      schema)
  }

  /** Three well-separated blobs around axis-aligned centers; vec_ids
    * 0,1,2 land one in each blob so deterministic seeding starts with one
    * seed per blob. */
  private def blobs(nPerBlob: Int): Seq[(Long, Array[Float], Int)] = {
    val rnd = new scala.util.Random(42)
    val centers = Seq(
      Array.tabulate(dim)(i => if (i == 0) 10f else 0f),
      Array.tabulate(dim)(i => if (i == 1) 10f else 0f),
      Array.tabulate(dim)(i => if (i == 2) 10f else 0f))
    (0 until 3 * nPerBlob).map { id =>
      val b = id % 3 // ids 0,1,2 are blobs 0,1,2
      val c = centers(b)
      (id.toLong, Array.tabulate(dim)(i => c(i) + rnd.nextFloat() * 0.5f), b)
    }
  }

  test("lloyd recovers well-separated blobs exactly (k=3, 2 sweeps)") {
    val df = embDf(blobs(40))
    val out = Embeddings.lloyd(df, k = 3, iters = 2).collect()
    assert(out.length === 120)
    // cluster labels must be a bijection of blob labels: every vector in
    // blob b (vec_id % 3 == b) sits in cell b (seeds 0,1,2 are one per blob)
    out.foreach { r =>
      val vecId = r.getLong(0); val cell = r.getInt(1)
      assert(cell === (vecId % 3).toInt,
        s"vec $vecId in cell $cell, expected ${vecId % 3}")
    }
    // converged: distance to own centroid is small vs blob separation
    assert(out.map(_.getDouble(2)).max < 2.0)
  }

  test("lloyd exact and scale update modes agree on assignments; codegen == HOF bit-for-bit") {
    val df = embDf(blobs(20))
    val exact = Embeddings.lloyd(df, 3, 2, exact = true).orderBy("vec_id").collect()
    val fast = Embeddings.lloyd(df, 3, 2, exact = false).orderBy("vec_id").collect()
    assert(exact.map(r => (r.getLong(0), r.getInt(1))).toSeq
      === fast.map(r => (r.getLong(0), r.getInt(1))).toSeq)
    val cg = Embeddings.lloyd(df, 3, 2, exact = true, codegen = true)
      .orderBy("vec_id").collect()
    val hof = Embeddings.lloyd(df, 3, 2, exact = true, codegen = false)
      .orderBy("vec_id").collect()
    // bit-identical distances, not just equal assignments
    assert(cg.map(r => (r.getLong(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
      === hof.map(r => (r.getLong(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq)
  }

  test("one-pass covariance matches the per-pair definition on real fixture data") {
    val df = graft.Tables.embeddings(spark, sf("sf0.001"))
    val (n, mu, cov) = Embeddings.meanAndCovariance(df)
    assert(n >= 2)
    // independent definition: collect and compute directly
    val vecs = df.select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = vecs.head.length
    val mu2 = Array.tabulate(d)(i => vecs.map(_(i)).sum / vecs.length)
    var maxErr = 0.0
    for (i <- 0 until d; j <- i until d) {
      val c = vecs.map(v => (v(i) - mu2(i)) * (v(j) - mu2(j))).sum / (vecs.length - 1)
      maxErr = math.max(maxErr, math.abs(cov(i)(j) - c))
    }
    assert(mu.zip(mu2).map(p => math.abs(p._1 - p._2)).max < 1e-9)
    assert(maxErr < 1e-9, s"covariance drift $maxErr")
  }

  test("jacobiEigen diagonalizes a known symmetric matrix") {
    // A = Q diag(5, 2, 1) Q^T for a hand-built rotation Q
    val q = {
      val theta = 0.3
      Array(
        Array(math.cos(theta), -math.sin(theta), 0.0),
        Array(math.sin(theta), math.cos(theta), 0.0),
        Array(0.0, 0.0, 1.0))
    }
    val lam = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(k => q(i)(k) * lam(k) * q(j)(k)).sum
    }
    val (vals, vecs) = Embeddings.jacobiEigen(a)
    assert(vals.zip(lam).forall(p => math.abs(p._1 - p._2) < 1e-10))
    // eigenvectors recover Q's columns up to sign; rows are normalized
    for (k <- 0 until 3) {
      val expect = Array.tabulate(3)(i => q(i)(k))
      val got = vecs(k)
      val dot = math.abs(expect.zip(got).map(p => p._1 * p._2).sum)
      assert(math.abs(dot - 1.0) < 1e-10, s"component $k misaligned: $dot")
    }
  }

  test("pcaProject finds the planted dominant direction") {
    // variance 100 along u = e0, variance ~1 along the rest
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { id =>
      val main = (rnd.nextGaussian() * 10.0).toFloat
      (id.toLong,
        Array.tabulate(dim)(i =>
          if (i == 0) main else rnd.nextGaussian().toFloat * 1f),
        0)
    }
    val (proj, explained) = Embeddings.pcaProject(embDf(rows), k = 2)
    val out = proj.collect()
    assert(out.length === 300)
    // pc1 must carry far more variance than pc2, and most of the total
    val pc1 = out.map(_.getSeq[Double](2).head)
    val pc2 = out.map(_.getSeq[Double](2)(1))
    def variance(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    assert(variance(pc1) > 20 * variance(pc2),
      s"pc1 var ${variance(pc1)} not dominant over ${variance(pc2)}")
    assert(explained > 0.85, s"explained=$explained")
    // pc1 coordinate tracks the planted main component (|corr| > 0.99)
    val main = out.map(r => r.getLong(0)).map(id => rowsMain(rows, id))
    val corr = correlation(pc1, main)
    assert(math.abs(corr) > 0.99, s"corr=$corr")
  }

  test("pqEncode: planted codebook recovered exactly (zero distortion)") {
    // every subvector is one of 4 exact patterns -> after training, each
    // subspace codebook contains the patterns and distortion hits 0
    val patterns = Array(
      Array(0f, 0f), Array(10f, 0f), Array(0f, 10f), Array(10f, 10f))
    val rnd = new scala.util.Random(3)
    val rows = (0 until 64).map { id =>
      // ids 0..3 hit pattern 0..3 in every subspace (seed coverage)
      val v = Array.tabulate(dim)(i =>
        patterns(if (id < 4) id else rnd.nextInt(4))(i % 2))
      (id.toLong, v, 0)
    }
    val out = Embeddings.pqEncode(embDf(rows), m = 4, ksub = 4, iters = 2)
      .collect()
    assert(out.length === 64)
    out.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length === 4)
      assert(codes.forall(c => c >= 0 && c < 4))
    }
    assert(out.map(_.getDouble(2)).max < 1e-9,
      "planted patterns must quantize with zero distortion")
  }

  test("pqEncode: one more Lloyd sweep never increases total distortion") {
    val df = embDf(blobs(30))
    def total(iters: Int) =
      Embeddings.pqEncode(df, m = 4, ksub = 4, iters = iters)
        .agg(sum("recon_sq_err")).head().getDouble(0)
    val d1 = total(1); val d2 = total(2)
    assert(d2 <= d1 * (1 + 1e-9), s"distortion rose: $d1 -> $d2")
  }

  test("ivfPqTopK: planted-cluster recall@10 >= 0.9 vs exact brute force") {
    // 12 well-separated 64-dim blobs: cluster structure is what IVF
    // routes on and what makes PQ codes informative
    val d64 = 64
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(12)(b =>
      Array.tabulate(d64)(i => if (i % 12 == b) 20f else 0f))
    val rows = (0 until 480).map { id =>
      val c = centers(id % 12)
      (id.toLong, Array.tabulate(d64)(i => c(i) + rnd.nextFloat()), id % 12)
    }
    val df = embDf(rows)
    val queries = df.filter(col("vec_id") < 8).select("vec_id")
    val approx = Embeddings.ivfPqTopK(df, queries, k = 10,
        nCells = 12, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact squared-L2 top-10 per query, brute force on the driver
    val all = rows.map { case (id, v, _) => (id, v.map(_.toDouble)) }
    val exact = (0L until 8L).flatMap { q =>
      val qv = all(q.toInt)._2
      all.filter(_._1 != q)
        .map { case (id, v) =>
          var acc = 0.0; var i = 0
          while (i < d64) { val t = qv(i) - v(i); acc += t * t; i += 1 }
          (id, acc)
        }
        .sortBy(p => (p._2, p._1)).take(10).map(p => (q, p._1))
    }.toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF-PQ recall@10 = $recall on planted clusters")
  }

  test("two-level router: >=99% agreement with the flat scan, deterministic") {
    // clustered centroid set (the realistic regime: centroids from a
    // trained quantizer inherit the data's cluster structure) — 5000
    // cells in 16-dim around 64 planted centers
    val rnd = new scala.util.Random(42)
    val d16 = 16
    val centers = Array.fill(64)(Array.fill(d16)(rnd.nextGaussian()))
    val cells = Array.fill(5000) {
      val c = centers(rnd.nextInt(64))
      c.zip(Array.fill(d16)(rnd.nextGaussian() * 0.15)).map(p => p._1 + p._2)
    }
    val idx = Similarity.buildTwoLevel(cells)
    assert(idx.members.map(_.length).sum === 5000, "members partition the cells")
    // determinism: a second build is structurally identical
    val idx2 = Similarity.buildTwoLevel(cells)
    assert(idx.groups.map(_.toSeq).toSeq === idx2.groups.map(_.toSeq).toSeq)
    assert(idx.members.map(_.toSeq).toSeq === idx2.members.map(_.toSeq).toSeq)
    // agreement on query points drawn from the same mixture
    val queries = Array.fill(2000) {
      val c = centers(rnd.nextInt(64))
      org.apache.spark.ml.linalg.Vectors.dense(
        c.zip(Array.fill(d16)(rnd.nextGaussian() * 0.2)).map(p => p._1 + p._2))
    }
    val agree = queries.count(v =>
      Similarity.nearestCellTwoLevel(cells, idx, v) ==
        Similarity.nearestCell(cells, v))
    assert(agree >= 1980, s"two-level agreement $agree/2000 < 99%")
    // probe selection: the two-level probe set contains the flat
    // nearest cell for every query (the list the vector itself would
    // be assigned to is always searched)
    queries.take(200).foreach { v =>
      val probes = Similarity.probeCellsTwoLevel(cells, idx, v, 16)
      assert(probes.length === 16)
      assert(probes.contains(Similarity.nearestCellTwoLevel(cells, idx, v)))
    }
  }

  test("ivfTopK with the two-level router FORCED on matches the flat path") {
    // fixture nCells sit far under the threshold; force the router and
    // require the end-to-end IVF result be IDENTICAL to the flat path —
    // at this scale (8 cells, g=3 <= wGroups) both assignment and probe
    // gather every group, so any divergence is a router bug, not an
    // approximation. (The approximation quality itself is gated by the
    // ≥99%-agreement test above on a 5000-cell index, where w < g.)
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val ids = (0L until 20L)
    def run() = Similarity.ivfTopK(emb, ids.toSeq, k = 10, nCells = 0, nProbe = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val flat = run()
    val forced = Similarity.withTwoLevelThreshold(2)(run())
    assert(forced === flat)
  }

  test("ivfPqTopK with the two-level router FORCED on matches the flat path") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    import spark.implicits._
    val q = (0L until 10L).toDF("vec_id")
    def run() = Embeddings.ivfPqTopK(emb, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val flat = run()
    val forced = Similarity.withTwoLevelThreshold(2)(run())
    assert(forced === flat)
  }

  test("emb_knn_label_acc: perfect accuracy on well-separated labeled blobs") {
    // labels == blob membership; every vector's 10-NN are same-blob, so
    // the majority vote must be exact for every query
    val dir = java.nio.file.Files.createTempDirectory("knn").toString
    embDf(blobs(40)).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("emb_knn_label_acc")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 3)
    out.foreach { case (label, n, correct) =>
      assert(n === correct, s"label $label: $correct/$n")
    }
    assert(out.map(_._2).sum === 120) // every query vector reported once
  }

  private def rowsMain(rows: Seq[(Long, Array[Float], Int)], id: Long): Double =
    rows(id.toInt)._2(0).toDouble

  private def correlation(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length
    val ma = a.sum / n; val mb = b.sum / n
    val cov = a.zip(b).map(p => (p._1 - ma) * (p._2 - mb)).sum
    val sa = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
    val sb = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
    cov / (sa * sb)
  }

  test("emb_jl_project preserves norms in aggregate (JL property)") {
    import org.apache.spark.sql.functions._
    // E||P v||^2 = ||v||^2 for a Rademacher JL matrix scaled 1/sqrt(k);
    // per-vector variance is ~2/k, so the MEAN ratio over the 500-vector
    // fixture must sit tightly around 1 even at k=8
    val proj = graft.SparkEntry.queries("emb_jl_project")(spark, sf("sf0.01"))
      .groupBy("vec_id").agg(sum(col("p") * col("p")).as("pn"))
    val orig = graft.Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id"), aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("vn"))
    val ratios = proj.join(orig, "vec_id")
      .select((col("pn") / col("vn")).as("r")).collect().map(_.getDouble(0))
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.length
    assert(mean > 0.9 && mean < 1.1,
      f"mean norm ratio $mean%.3f should concentrate near 1")
  }

  test("emb_quantize_int8: saturation at the per-dim extremes, bounded error") {
    // dim0 max|x| = 1.27 (scale 0.01), dim1 max|x| = 0.508 (scale 0.004):
    // extremes code to ±127 (saturated), interior points round half-up
    // and reconstruct within half a grid step per dimension
    val dir = java.nio.file.Files.createTempDirectory("sq8").toString
    embDf(Seq(
      (0L, Array(1.27f, -0.508f), 0),
      (1L, Array(-1.27f, 0.254f), 0),
      (2L, Array(0.635f, 0.127f), 0)))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("emb_quantize_int8")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L)._1 === 2L, s"both dims of v0 saturate: ${out(0L)}")
    assert(out(1L)._1 === 1L, s"only dim0 of v1 saturates: ${out(1L)}")
    assert(out(2L)._1 === 0L, s"v2 is interior: ${out(2L)}")
    // err <= s/2 per dim -> qerr12u <= 2 * (0.01/2)^2 * 1e12 (+ float slack)
    out.values.foreach { case (_, q) =>
      assert(q >= 0L && q <= 51000000L, s"qerr12u out of bound: $q")
    }
    // the saturated extremes reconstruct near-exactly (err ~ float ulp)
    assert(out(0L)._2 < 1000L, s"v0 sits ON grid points: ${out(0L)}")
  }

  test("emb_pca_whiten: unit variance per coordinate, ~zero cross-covariance") {
    val rows = graft.SparkEntry.queries("emb_pca_whiten")(spark, sf("sf0.01"))
      .collect().map(r => (r.getLong(2) / 1e6, r.getLong(3) / 1e6))
    val n = rows.length
    assert(n > 100)
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val (a, b) = (rows.map(_._1).toSeq, rows.map(_._2).toSeq)
    val (ma, mb) = (mean(a), mean(b))
    val va = a.map(x => (x - ma) * (x - ma)).sum / (n - 1)
    val vb = b.map(x => (x - mb) * (x - mb)).sum / (n - 1)
    val cab = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum / (n - 1)
    assert(math.abs(va - 1.0) < 0.05, s"var(zw1) = $va should be ~1")
    assert(math.abs(vb - 1.0) < 0.05, s"var(zw2) = $vb should be ~1")
    assert(math.abs(cab) < 0.05, s"cov(zw1, zw2) = $cab should be ~0")
  }

  test("emb_mips_topk ranks by magnitude where cosine ranks by angle") {
    // q=[1,0]; a=[3,3] wins on dot (3 > 0.5) but loses on cosine
    // (0.707 < 1.0); b=[0.5,0] is perfectly aligned but small
    val dir = java.nio.file.Files.createTempDirectory("mips").toString
    embDf(Seq(
      (0L, Array(1f, 0f), 0),
      (10L, Array(3f, 3f), 0),
      (11L, Array(0.5f, 0f), 0)))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def top1(q: String) = graft.SparkEntry.queries(q)(spark, dir)
      .filter(col("qid") === 0 && col("rn") === 1)
      .collect().map(_.getLong(1)).head
    assert(top1("emb_mips_topk") === 10L, "MIPS must pick the big vector")
    assert(top1("emb_cosine_topk") === 11L, "cosine must pick the aligned one")
  }

  test("pcaProject probe fails loud on empty and null-first inputs (ADVICE r16)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Array[Double])]
      .toDF("vec_id", "label", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      graft.ext.Embeddings.pcaProject(empty, k = 2)
    }
    assert(e1.getMessage.contains("no rows"), e1.getMessage)
    val nullFirst = Seq((1L, "a", null: Array[Double]))
      .toDF("vec_id", "label", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      graft.ext.Embeddings.pcaProject(nullFirst, k = 2)
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("driver-side eigen path refuses high dims loudly, names the alternative") {
    // jacobiEigen is O(d^3) DRIVER work — fine at embedding dims, wrong
    // past ~1k; the guard must refuse (not degrade) and point at the
    // distributed alternative (VERDICT r14 item 6)
    val big = Array.tabulate(1025, 1025)((i, j) => if (i == j) 1.0 else 0.0)
    val e1 = intercept[IllegalArgumentException] {
      graft.ext.Embeddings.jacobiEigen(big)
    }
    assert(e1.getMessage.contains("1024") &&
      (e1.getMessage.contains("power iteration") ||
        e1.getMessage.contains("randomized SVD")),
      s"guard message should name the distributed alternative: ${e1.getMessage}")
    // the covariance accumulator guard (quadratic per-task state)
    import spark.implicits._
    val wide = Seq((1L, Array.fill(2049)(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e2 = intercept[IllegalArgumentException] {
      graft.ext.Embeddings.meanAndCovariance(wide)
    }
    assert(e2.getMessage.contains("2048"), e2.getMessage)
  }

  test("power iteration matches the exact eigen path on the fixture (d=64)") {
    val emb = graft.Tables.embeddings(spark, sf())
    val (_, muE, covE) = Embeddings.meanAndCovariance(emb)
    val (valsE, vecsE) = Embeddings.jacobiEigen(covE)
    val (n, muP, theta, comps, explained) =
      Embeddings.topKComponentsPowerIteration(emb, k = 4)
    assert(n == emb.count())
    // the mean pass is the same fold — agree to fp noise
    muE.zip(muP).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // Rayleigh-Ritz values converge quadratically in the subspace angle;
    // gaps on real data are uncontrolled, so pin the dominant component
    // tightly and the rest within 2% — mixing across a near-degenerate
    // pair keeps theta between the true values, inside this band
    assert(math.abs(theta(0) - valsE(0)) < 0.01 * valsE(0),
      s"theta0 ${theta(0)} vs exact ${valsE(0)}")
    val dot0 = math.abs(vecsE(0).zip(comps(0)).map(p => p._1 * p._2).sum)
    assert(dot0 > 0.99, s"dominant component misaligned: $dot0")
    (1 until 4).foreach { c =>
      assert(theta(c) <= theta(c - 1) + 1e-12, "theta must be nonincreasing")
      assert(math.abs(theta(c) - valsE(c)) < 0.02 * math.max(valsE(0), 1e-12),
        s"theta($c)=${theta(c)} vs exact ${valsE(c)}")
    }
    // a k-dim subspace never explains MORE variance than the exact top-k
    val totalE = valsE.map(math.max(_, 0.0)).sum
    val exactFrac = valsE.take(4).map(math.max(_, 0.0)).sum / totalE
    assert(explained <= exactFrac + 1e-9 && explained > exactFrac - 0.02,
      s"explained=$explained vs exact top-4 $exactFrac")
  }

  test("power iteration: planted rank-3 spectrum at d=1200 recovered exactly") {
    // data lives in a 3-dim subspace of R^1200 — only the DISTRIBUTED
    // path can run here (jacobiEigen refuses d > 1024). Rank-3 input
    // makes subspace iteration converge exactly: the predicted spectrum
    // is the 3x3 coefficient covariance's, computable locally.
    val d = 1200; val n = 400
    val rnd = new scala.util.Random(11)
    val u = Array.fill(3, d)(rnd.nextGaussian())
    // local Gram-Schmidt over the 3 planted directions
    for (c <- 0 until 3) {
      for (p <- 0 until c) {
        val dot = (0 until d).map(i => u(p)(i) * u(c)(i)).sum
        (0 until d).foreach(i => u(c)(i) -= dot * u(p)(i))
      }
      val nm = math.sqrt((0 until d).map(i => u(c)(i) * u(c)(i)).sum)
      (0 until d).foreach(i => u(c)(i) /= nm)
    }
    val lam = Array(100.0, 25.0, 4.0)
    // deterministic Rademacher coefficients
    def s(t: Int, c: Int): Double =
      if (((t * 2654435761L + c * 40503L) >>> 16 & 1L) == 0L) 1.0 else -1.0
    val coef = Array.tabulate(n, 3)((t, c) => math.sqrt(lam(c)) * s(t, c))
    val rows = (0 until n).map { t =>
      (t.toLong, Array.tabulate(d) { i =>
        (0 until 3).map(c => coef(t)(c) * u(c)(i)).sum.toFloat
      }, 0)
    }
    val emb = embDf(rows)
    val (_, _, theta, comps, explained) =
      Embeddings.topKComponentsPowerIteration(emb, k = 3)
    // predicted spectrum: eigen of the 3x3 sample covariance of the
    // coefficients AS STORED (float rounding included via re-derivation
    // is unnecessary at these magnitudes — tolerances absorb it)
    val mean = Array.tabulate(3)(c => coef.map(_(c)).sum / n)
    val c3 = Array.tabulate(3, 3) { (a, b) =>
      (0 until n).map(t => (coef(t)(a) - mean(a)) * (coef(t)(b) - mean(b))).sum / (n - 1)
    }
    val (predVals, _) = Embeddings.jacobiEigen(c3)
    (0 until 3).foreach { c =>
      assert(math.abs(theta(c) - predVals(c)) < 1e-3 * predVals(0),
        s"theta($c)=${theta(c)} vs planted ${predVals(c)}")
    }
    // components lie in the planted span: projection norm ~ 1
    (0 until 3).foreach { c =>
      val pn = math.sqrt((0 until 3).map { p =>
        val dot = (0 until d).map(i => comps(c)(i) * u(p)(i)).sum
        dot * dot
      }.sum)
      assert(pn > 0.999, s"component $c leaks out of the planted span: $pn")
    }
    // rank-3 data: top-3 explain everything
    assert(explained > 0.999, s"explained=$explained")
    // ADVICE r15 guard-mismatch closed: pcaProject ROUTES high dims to
    // the distributed path instead of paying the covariance pass and
    // then throwing on the driver
    val (proj, exp2) = Embeddings.pcaProject(emb, k = 2)
    assert(proj.count() == n && exp2 > 0.9)
  }

  test("power iteration is deterministic across refits (lazy-oracle contract)") {
    // Verify's lazy oracle refits in the SQL generator and the query
    // closure separately — the two fits must agree bit-for-bit on the
    // same session/partitioning
    val emb = graft.Tables.embeddings(spark, sf())
    val (_, mu1, t1, c1, e1) = Embeddings.topKComponentsPowerIteration(emb, k = 3)
    val (_, mu2, t2, c2, e2) = Embeddings.topKComponentsPowerIteration(emb, k = 3)
    assert(mu1.sameElements(mu2) && t1.sameElements(t2) && e1 == e2)
    assert(c1.zip(c2).forall(p => p._1.sameElements(p._2)))
  }

  test("jlExpandMatrix matches the SQL md5 derivation entry-for-entry") {
    // the highdim oracle re-derives R inside DuckDB from
    // md5('r_i_j') — pin the Scala derivation against Spark SQL's
    // identical conv/md5 formula (the same equivalence the minhash
    // family's oracle pairing already rests on)
    val r = Embeddings.jlExpandMatrix(4, 4)
    val got = spark.sql(
      """SELECT i, j,
        |  CAST(cast(conv(substring(md5(cast(concat('r_', i, '_', j) AS binary)),
        |     1, 15), 16, 10) AS bigint) % 2001 - 1000 AS DOUBLE)
        |    / CAST(1000 AS DOUBLE) AS r
        |FROM (SELECT explode(sequence(0, 3)) AS i)
        |CROSS JOIN (SELECT explode(sequence(0, 3)) AS j)""".stripMargin)
      .collect().map(row => (row.getInt(0), row.getInt(1)) -> row.getDouble(2)).toMap
    for (i <- 0 until 4; j <- 0 until 4)
      assert(got((i, j)) == r(i)(j), s"R[$i][$j]: sql ${got((i, j))} vs scala ${r(i)(j)}")
  }

  test("emb_silhouette: separated label blobs near 1, scrambled labels near 0") {
    val dir = java.nio.file.Files.createTempDirectory("silh").toString
    embDf(blobs(20)).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val sep = graft.SparkEntry.queries("emb_silhouette")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(sep.length === 3)
    sep.foreach { case (l, n, s6) =>
      assert(n === 20L, s"label $l n=$n")
      assert(s6 > 900000L, s"separated label $l should score near 1: $s6")
    }
    // decorrelate labels from blobs: every label becomes an equal mix of
    // the three blobs, so all three label centroids collapse onto the
    // grand mean and a ~ b -> s ~ 0
    val scrDir = java.nio.file.Files.createTempDirectory("silh0").toString
    embDf(blobs(20).map { case (id, v, _) => (id, v, ((id / 3) % 3).toInt) })
      .write.mode("overwrite").parquet(s"$scrDir/embeddings.parquet")
    val scr = graft.SparkEntry.queries("emb_silhouette")(spark, scrDir)
      .collect().map(r => r.getLong(2))
    scr.foreach(s6 =>
      assert(math.abs(s6) < 200000L, s"scrambled labels should score ~0: $s6"))
  }
}
