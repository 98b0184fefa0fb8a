package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trainer gates for the hashed-TF logistic quality classifier — the
  * half of doc_quality_classifier the lazy oracle can't check (the
  * oracle hash-verifies SCORING with inlined weights; these tests
  * verify the weights are worth inlining). */
class QualityModelSpec extends SparkSpec {

  private def plantedDocs(n: Int) = {
    import spark.implicits._
    // fully separable: positives speak one vocabulary, negatives
    // another; doc lengths vary so tf normalization matters
    val rnd = new scala.util.Random(7)
    val pos = Array("alpha", "beta", "gamma", "delta")
    val neg = Array("zeta", "eta", "theta", "iota")
    (0 until n).map { i =>
      val vocab = if (i % 2 == 0) pos else neg
      val len = 5 + rnd.nextInt(20)
      val text = Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      (i.toLong, text, if (i % 2 == 0) 1 else 0)
    }.toDF("doc_id", "text", "y")
  }

  test("fit separates a planted two-vocabulary corpus perfectly") {
    val docs = plantedDocs(200)
    val w = QualityModel.fit(docs, col("y") === 1)
    val scored = QualityModel.score(docs, w)
      .join(docs.select("doc_id", "y"), "doc_id")
      .select("doc_id", "pred_hq", "y").collect()
    assert(scored.length === 200)
    val wrong = scored.count(r => r.getInt(1) != r.getInt(2))
    assert(wrong === 0, s"$wrong/200 misclassified on a separable corpus")
  }

  test("fit is bit-deterministic across runs (the lazy-oracle contract)") {
    val docs = plantedDocs(80)
    val w1 = QualityModel.fit(docs, col("y") === 1)
    val w2 = QualityModel.fit(docs.repartition(7), col("y") === 1)
    assert(w1.length === QualityModel.Dim + 1)
    // quantized-long gradient accumulation: identical weights regardless
    // of partitioning — bit-for-bit, not approximately
    assert(w1.toSeq === w2.toSeq)
  }

  test("scala bucket twin matches the SQL md5 bucket expression") {
    import spark.implicits._
    val toks = Seq("alpha", "beta", "value 1", "", "Zeta9").toDF("tok")
    val sql = toks.select(col("tok"), expr(
        s"cast(conv(substring(md5(cast(tok AS binary)), 1, 15), 16, 10) AS bigint) % ${QualityModel.Dim}")
      .as("b")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sql.foreach { case (t, b) =>
      assert(QualityModel.bucket(t, QualityModel.Dim).toLong === b,
        s"bucket mismatch for '$t'")
    }
  }
}
