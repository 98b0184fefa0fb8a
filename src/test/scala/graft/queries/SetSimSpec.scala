package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture truth for the r12 rows: prefix-filter losslessness
  * (doc_setsim_join), A-ES sample determinism (doc_weighted_sample),
  * and triangle enumeration (ext_triangle_count). The registry rows'
  * oracle is the DuckDB brute force on real data; these pin the
  * algorithms on adversarial shapes the fixture may not contain. */
class SetSimSpec extends SparkSpec {

  private def bruteForce(sh: org.apache.spark.sql.DataFrame,
      tNum: Int, tDen: Int) = {
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(n.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .filter(lit(tDen) * col("n_common") >=
        lit(tNum) * (col("na") + col("nb") - col("n_common")))
      .select("doc_a", "doc_b", "n_common")
  }

  test("setSimJoinExact equals brute force on adversarial planted sets") {
    import spark.implicits._
    // shapes chosen to stress the prefix bound: exact duplicates,
    // just-at-threshold overlap (J = 4/5 via 8-of-9-and-10... built
    // explicitly below), just-below pairs, a ubiquitous token shared by
    // everything (worthless prefix candidate), disjoint singletons,
    // size-skewed containment
    val docs = Seq(
      // 1,2: identical 5-sets (J=1)
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b", "c", "d", "e")),
      // 3,4: |9-set| vs |9-set| sharing 8 -> J = 8/10 = 0.8 (AT threshold)
      (3L, Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "x1")),
      (4L, Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "x2")),
      // 5,6: sharing 7 of 9/9 -> J = 7/11 (below)
      (5L, Seq("m1", "m2", "m3", "m4", "m5", "m6", "m7", "y1", "y2")),
      (6L, Seq("m1", "m2", "m3", "m4", "m5", "m6", "m7", "z1", "z2")),
      // 7: contains doc 1's set plus 10 extras (containment, below t)
      (7L, Seq("a", "b", "c", "d", "e") ++ (1 to 10).map("w" + _)),
      // 8,9: singletons sharing the ubiquitous token "a" only
      (8L, Seq("a", "q1")),
      (9L, Seq("a", "q2")),
      // 10: disjoint
      (10L, Seq("only10a", "only10b"))
    ).toDF("doc_id", "sh")
    val sh = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    for ((tn, td) <- Seq((4, 5), (1, 2), (9, 10))) {
      val got = SetSimQ.setSimJoinExact(sh, tn, td)
        .select("doc_a", "doc_b", "n_common")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = bruteForce(sh, tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"t=$tn/$td: got $got want $want")
      spark.catalog.clearCache()
    }
    // sanity on content at t=0.8: the identical pair and the
    // at-threshold pair are in; the below pairs are out
    val at = SetSimQ.setSimJoinExact(sh, 4, 5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at == Set((1L, 2L), (3L, 4L)))
    spark.catalog.clearCache()
  }

  test("setSimJoin guard switch: exact under budget, LSH fallback over it") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b", "c", "d", "e")),            // identical to 1 (J=1)
      (3L, Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "x1")),
      (4L, Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "x2")), // J=0.8
      (5L, Seq("m1", "m2", "m3", "m4", "m5", "y1")),
      (6L, Seq("m1", "m2", "m3", "m4", "m5", "z1"))  // J=5/7 (below t)
    ).toDF("doc_id", "sh")
    val sh = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val truth = bruteForce(sh, 4, 5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // under budget: exact path, exact=true, equals brute force
    val ex = SetSimQ.setSimJoin(sh, 4, 5).collect()
    assert(ex.forall(_.getAs[Boolean]("exact")))
    assert(ex.map(r => (r.getLong(0), r.getLong(1))).toSet == truth)
    spark.catalog.clearCache()

    // cap 0 trips the guard: fallback path, exact=false, zero false
    // positives (every emitted pair is in the brute-force truth; an
    // identical pair has identical band signatures, so it survives)
    val fb = SetSimQ.setSimJoin(sh, 4, 5, maxCandidatePairs = 0L).collect()
    assert(fb.nonEmpty, "identical pair must survive the LSH fallback")
    assert(fb.forall(!_.getAs[Boolean]("exact")))
    val fbPairs = fb.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fbPairs.subsetOf(truth), s"false positives: ${fbPairs.diff(truth)}")
    assert(fbPairs.contains((1L, 2L)))
    spark.catalog.clearCache()

    // exact-only entry still refuses loudly, naming itself
    val e = intercept[IllegalArgumentException] {
      SetSimQ.setSimJoinExact(sh, 4, 5, maxCandidatePairs = 0L).collect()
    }
    assert(e.getMessage.contains("setSimJoinExact"))
    assert(e.getMessage.contains("setSimJoin"))
    spark.catalog.clearCache()
  }

  test("triangleCount enumerates planted graphs exactly") {
    import spark.implicits._
    def tri(edges: Seq[(Long, Long)]): Long =
      graft.ext.Graph.triangleCount(edges.toDF("a", "b"))
        .collect().head.getLong(0)
    // K4 (ordered edges): C(4,3) = 4 triangles
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    assert(tri(k4) == 4L)
    // 6-ring: none
    assert(tri(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (0L, 5L))) == 0L)
    // two disjoint triangles + a pendant edge
    assert(tri(Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))) == 2L)
  }

  test("doc_weighted_sample: deterministic, weight-monotone selection") {
    val out = graft.SparkEntry.queries("doc_weighted_sample")(spark, sf("sf0.01"))
      .collect()
    assert(out.length == 100)
    // repeatable bit-for-bit
    val again = graft.SparkEntry.queries("doc_weighted_sample")(spark, sf("sf0.01"))
      .collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // skey strictly within (0,1]; sorted descending
    val keys = out.map(_.getAs[Double]("skey"))
    assert(keys.forall(k => k > 0.0 && k <= 1.0))
    assert(keys.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // A-ES property direction: the sample over-represents heavy docs —
    // mean weight in the sample exceeds the corpus mean weight
    val corpus = graft.Tables.documents(spark, sf("sf0.01"))
      .select(when(col("n_chars") >= 2000, 8).when(col("n_chars") >= 1000, 4)
        .when(col("n_chars") >= 500, 2).otherwise(1).as("w"))
      .agg(avg("w")).collect().head.getDouble(0)
    val sampleMean = out.map(_.getAs[Int]("w").toDouble).sum / out.length
    assert(sampleMean > corpus,
      s"sample mean weight $sampleMean should exceed corpus mean $corpus")
  }
}
