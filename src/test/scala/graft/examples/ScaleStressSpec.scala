package graft.examples

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the derived scale fixture (SCALE.md "Measured scale
  * curve"): replication must change the workload's SIZE without
  * changing its SHAPE — same token/vector distributions, and no
  * artificial near-dup mass planted in any LSH bucket. */
class ScaleStressSpec extends SparkSpec {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("sfx-test").toString
    ScaleStress.buildFixture(spark, sf("sf0.001"), dir, 2)
    dir
  }

  test("replication multiplies row counts and keeps ids disjoint") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val base = graft.Tables.documents(spark, sf("sf0.001"))
    assert(docs.count() == 2 * base.count())
    assert(docs.select("doc_id").distinct().count() == docs.count())
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(emb.count() == 2 * graft.Tables.embeddings(spark, sf("sf0.001")).count())
    assert(emb.select("vec_id").distinct().count() == emb.count())
  }

  test("token shuffle preserves the per-doc token histogram") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val hist = docs.select(col("doc_id"),
        to_json(map_from_entries(sort_array(map_entries(
          aggregate(split(col("text"), "\\s+"), map().cast("map<string,int>"),
            (acc, t) => map_concat(
              map_filter(acc, (k, _) => k =!= t),
              map(t, coalesce(element_at(acc, t), lit(0)) + 1))))))).as("h"))
    val base = hist.filter(col("doc_id") < 1000000000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rep = hist.filter(col("doc_id") >= 1000000000L)
      .collect().map(r => r.getLong(0) - 1000000000L -> r.getString(1)).toMap
    assert(rep.nonEmpty && rep.keySet == base.keySet)
    rep.foreach { case (id, h) =>
      assert(h == base(id), s"histogram changed for doc $id")
    }
  }

  test("embedding replica transform: orthogonal (norm-exact) and decorrelated at ANY rep") {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val base = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select("embedding").limit(20)
      .collect().map(_.getSeq[Float](0))
    // reps below AND above the 64-dim wrap point: bare rotation would
    // be the identity at rep = 64 (the factor>63 planted-dup bug)
    for (rep <- Seq(1, 5, 63, 64, 70, 99); e <- base) {
      val m = ScaleStress.mutateEmbedding(e, rep)
      val n0 = math.sqrt(e.map(x => x.toDouble * x).sum)
      val n1 = math.sqrt(m.map(x => x.toDouble * x).sum)
      assert(math.abs(n0 - n1) < 1e-9, s"norm drift at rep $rep")
      assert(math.abs(cos(e, m)) < 0.6, s"rep $rep correlated: cos=${cos(e, m)}")
    }
    // distinct reps sharing a rotation (64 apart) must ALSO be decorrelated
    for (e <- base) {
      val a = ScaleStress.mutateEmbedding(e, 6)
      val b = ScaleStress.mutateEmbedding(e, 70)
      assert(math.abs(cos(a, b)) < 0.6, s"reps 6/70 correlated: ${cos(a, b)}")
    }
  }

  test("replicas are NOT shingle near-dups of their originals") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val sh = docs.select(col("doc_id"),
        array_distinct(graft.functions.TextShingles.shingle3(
          split(col("text"), "\\s+"))).as("sh"))
    val base = sh.filter(col("doc_id") < 1000000000L)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val rep = sh.filter(col("doc_id") >= 1000000000L)
      .collect().map(r => r.getLong(0) - 1000000000L -> r.getSeq[String](1).toSet).toMap
    // Jaccard(base, rotated replica) must sit FAR below the 0.5 near-dup
    // threshold for nearly all docs — rotation by 2 shifts every 3-gram
    val jac = rep.toSeq.map { case (id, s) =>
      val b = base(id); s.intersect(b).size.toDouble / s.union(b).size
    }
    val high = jac.count(_ >= 0.5)
    assert(high <= jac.size / 100,
      s"$high of ${jac.size} replicas are near-dups of their originals")
    assert(jac.sum / jac.size < 0.3, f"mean replica jaccard ${jac.sum / jac.size}%.2f")
  }
}
