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

  /** IVF-style ANN: coarse-quantize the corpus into `nCells` cells
    * (deterministic seed centroids = the first nCells vectors, one
    * refinement sweep), then search only the `nProbe` cells nearest to
    * each query. The inverted-file shape: search cost drops from
    * |corpus| to ~|corpus| * nProbe / nCells per query, and the cell
    * assignment is a narrow map — the partition-pruning analogue for
    * vector search (complements the BRP-LSH path; both are the 100 TB
    * routes vs brute force). */
  def ivfTopK(
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = normalizedVectors(emb)
      .select(col("vec_id"), col("features")).cache()

    // deterministic seeds + one Lloyd sweep (collect is over nCells
    // centroids only — never corpus-scale)
    val seeds = vecs.orderBy("vec_id").limit(nCells)
      .collect().map(_.getAs[Vector]("features").toArray)
    def nearest(cs: Array[Array[Double]], v: Vector): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val ct = cs(c)
        while (i < ct.length) { val t = ct(i) - v(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val bc = spark.sparkContext.broadcast(seeds)
    val assigned0 = vecs.map { r =>
      (r.getLong(0), nearest(bc.value, r.getAs[Vector](1)))
    }.toDF("vec_id", "cell")
    val centroids = assigned0.join(vecs, "vec_id")
      .as[(Long, Int, Vector)].rdd
      .map { case (_, cell, v) => (cell, (v.toArray, 1L)) }
      .reduceByKey { (l: (Array[Double], Long), r: (Array[Double], Long)) =>
        (l._1.zip(r._1).map { case (x, y) => x + y }, l._2 + r._2) }
      .mapValues { case (s, n) => s.map(_ / n) }
      .collect().sortBy(_._1).map(_._2)
    val bc2 = spark.sparkContext.broadcast(centroids)
    val assigned = vecs.map { r =>
      (r.getLong(0), nearest(bc2.value, r.getAs[Vector](1)))
    }.toDF("vec_id", "cell").join(vecs, "vec_id").cache()

    // probe the nProbe nearest cells per query, brute-force inside them
    val queries = assigned.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("features").as("qf")).collect()
    queries.map { row =>
      val qid = row.getLong(0)
      val qf = row.getAs[Vector](1)
      val cells = centroids.indices
        .sortBy { c =>
          centroids(c).zipWithIndex.map { case (x, i) => val t = x - qf(i); t * t }.sum }
        .take(nProbe).toSet
      val cand = assigned
        .filter(col("cell").isin(cells.toSeq: _*) && col("vec_id") =!= qid)
      val qBc = spark.sparkContext.broadcast(qf.toArray)
      cand.map { r =>
        val v = r.getAs[Vector](2)
        val q = qBc.value
        var dot = 0.0; var i = 0
        while (i < q.length) { dot += q(i) * v(i); i += 1 }
        (r.getLong(0), dot) // unit vectors: dot == cosine
      }.toDF("cid", "cos")
        .orderBy(col("cos").desc, col("cid"))
        .limit(k)
        .select(lit(qid).as("qid"), col("cid"), col("cos"))
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
