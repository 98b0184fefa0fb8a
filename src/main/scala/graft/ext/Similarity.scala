package graft.ext

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, IDF, MinHashLSH, RegexTokenizer, StopWordsRemover}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** spark.ml-backed similarity / text-analysis operators (SURVEY §2.3
  * "Extension operators"). These are the scale paths; the exact
  * brute-force twins live in PipelineQ as recall oracles.
  *
  * 100 TB posture: every join here is LSH-bucketed (approxSimilarityJoin
  * hashes both sides and joins on bucket keys) — all-pairs products never
  * materialize. Model fits (IDF, LSH random planes) are tiny
  * driver-side matrices broadcast to executors.
  */
object Similarity {

  /** documents -> binary term vectors over word 3-gram shingles (the
    * MinHash input space; numFeatures=2^18 keeps collisions ~0 at corpus
    * vocab sizes while the vector stays sparse). */
  def shingleVectors(docs: DataFrame, numFeatures: Int = 1 << 18): DataFrame = {
    val shingled = docs
      .withColumn("toks", split(col("text"), "\\s+")) // tokenize once per row
      .withColumn("shingles", expr(
        """array_distinct(transform(sequence(1, greatest(size(toks) - 2, 0)),
          |  i -> concat_ws(' ', element_at(toks, i),
          |                      element_at(toks, i + 1),
          |                      element_at(toks, i + 2))))""".stripMargin))
      .filter(size(col("shingles")) > 0)
    new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
      .transform(shingled)
  }

  /** Near-dup pairs via ml MinHashLSH (jaccard distance <= maxDistance). */
  def minHashNearDups(docs: DataFrame, maxDistance: Double = 0.5, numTables: Int = 8): DataFrame = {
    // cache: approxSimilarityJoin evaluates the vector pipeline on BOTH
    // sides of the self-join; without this the shingling runs 2x+
    val vecs = shingleVectors(docs).cache()
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(42)
    val model = mh.fit(vecs)
    // pre-hash once and cache: approxSimilarityJoin skips its internal
    // transform when the hashes column is already present, halving the
    // pipeline evaluations on a self-join
    val hashed = model.transform(vecs).cache()
    model.approxSimilarityJoin(hashed, hashed, maxDistance, "jaccard_dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        col("jaccard_dist"))
  }

  /** embeddings -> ml dense vectors, L2-normalized so euclidean NN order
    * equals cosine NN order (BRP-LSH is a euclidean family). */
  def normalizedVectors(emb: DataFrame): DataFrame = {
    val toVec = udf { (arr: Seq[Float]) =>
      val d = arr.map(_.toDouble).toArray
      val n = math.sqrt(d.map(x => x * x).sum)
      Vectors.dense(if (n == 0) d else d.map(_ / n))
    }
    emb.withColumn("features", toVec(col("embedding")))
  }

  /** ANN top-k per query vector via BucketedRandomProjectionLSH. */
  def annTopK(
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      bucketLength: Double = 0.5,
      numTables: Int = 4): DataFrame = {
    val vecs = normalizedVectors(emb).cache()
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(42)
    val model = lsh.fit(vecs)
    val queries = vecs.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("features").as("qf"))
      .collect()
    queries.map { row =>
      val qid = row.getLong(0)
      val qf = row.getAs[Vector](1)
      model.approxNearestNeighbors(vecs.filter(col("vec_id") =!= qid), qf, k, "dist")
        .select(lit(qid).as("qid"), col("vec_id").as("cid"), col("dist"))
    }.reduce(_ unionByName _)
  }

  /** TF-IDF pipeline over documents: tokenize -> stopword filter ->
    * hashed TF -> IDF weighting. Output keeps doc_id + sparse tfidf. */
  def tfidf(docs: DataFrame, numFeatures: Int = 1 << 18): DataFrame = {
    val tokens = new RegexTokenizer().setInputCol("text").setOutputCol("raw_tokens")
      .setPattern("\\s+").transform(docs)
    val filtered = new StopWordsRemover().setInputCol("raw_tokens").setOutputCol("tokens")
      .transform(tokens)
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf")
      .setNumFeatures(numFeatures).transform(filtered)
    val idfModel = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf)
    idfModel.transform(tf).select("doc_id", "tfidf")
  }
}
