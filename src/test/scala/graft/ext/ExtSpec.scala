package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Recall/quality bounds for the spark.ml extension operators, judged
  * against their exact brute-force twins in PipelineQ.
  */
class ExtSpec extends SparkSpec {

  test("ml MinHashLSH near-dups recall vs exact jaccard truth") {
    val found = Similarity.minHashNearDups(
        Tables.documents(spark, sf()), maxDistance = 0.5, numTables = 16)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact truth: pairs with true shingle-jaccard >= 0.5 (approxSimilarityJoin
    // post-filters candidates by true distance, so recall vs truth isolates
    // the LSH bucketing miss rate)
    val sh = Tables.documents(spark, sf())
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, greatest(size(split(text, '\\s+')) - 2, 0)),
          |  i -> concat_ws(' ', element_at(split(text, '\\s+'), i),
          |                      element_at(split(text, '\\s+'), i + 1),
          |                      element_at(split(text, '\\s+'), i + 2)))""".stripMargin))).as("shingle"))
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val truth = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("nc"))
      .join(n.withColumnRenamed("doc_id", "da").withColumnRenamed("n_sh", "na"), "da")
      .join(n.withColumnRenamed("doc_id", "db").withColumnRenamed("n_sh", "nb"), "db")
      .filter(col("nc").cast("double") / (col("na") + col("nb") - col("nc")) >= 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truth.nonEmpty)
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"ml MinHash recall $recall (found ${found.size}, truth ${truth.size})")
  }

  test("minhash hash law matches model.transform (oracle formula pin)") {
    // The ext_minhash_ml_neardups lazy oracle inlines the reflected
    // (a,b) pairs and recomputes min((1+idx)*a+b mod 2038074743) per
    // table in DuckDB. If a Spark upgrade changes MinHashLSH's hash
    // function or coefficient generation, this fails loudly here.
    import org.apache.spark.ml.linalg.Vector
    val vecs = Similarity.shingleVectors(Tables.documents(spark, sf()))
    val coef = Similarity.minHashCoefficients(vecs, numTables = 8)
    assert(coef.length === 8 && coef.forall { case (a, b) =>
      a > 0 && a < 2038074743 && b >= 0 && b < 2038074743 })
    val model = new org.apache.spark.ml.feature.MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42).fit(vecs)
    model.transform(vecs).select("features", "hashes").collect().foreach { r =>
      val idx = r.getAs[Vector](0).toSparse.indices
      val expected = coef.map { case (a, b) =>
        idx.map(i => ((1L + i) * a + b) % 2038074743L).min.toDouble }.toSeq
      val got = r.getSeq[Vector](1).map(_(0))
      assert(got === expected)
    }
    // coefficient generation is data-independent: a second fit on a
    // different frame yields the same pairs (the oracle-generator run
    // and the query run must agree)
    val coef2 = Similarity.minHashCoefficients(vecs.limit(3), numTables = 8)
    assert(coef2.toSeq === coef.toSeq)
  }

  test("ANN top-k recall vs brute-force cosine top-k") {
    val exact = graft.SparkEntry.queries("emb_cosine_topk")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(Tables.embeddings(spark, sf()), Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall $recall — LSH with 4 tables should catch most true neighbors")
  }

  test("IVF top-k recall vs brute-force cosine top-k") {
    val exact = graft.SparkEntry.queries("emb_cosine_topk")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(Tables.embeddings(spark, sf()), Seq(0L, 1L, 2L, 3L, 4L),
        k = 10, nCells = 0, nProbe = 0) // auto knobs — the registry configuration
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall with auto cells/probes")
  }

  test("annTopKRouted: BRP at fixture scale, IVF past the measured boundary") {
    import spark.implicits._
    // pure decision pins (r18, VERDICT item 6): every fixture/oracle
    // scale stays on the BRP path (rows bit-unchanged), the measured
    // crossover sends larger corpora to IVF, force overrides both ways
    assert(Similarity.annRouteChoice(2000L) == "brp")   // sf0.001 corpus
    assert(Similarity.annRouteChoice(12000L) == "brp")  // sf0.1 corpus
    assert(Similarity.annRouteChoice(Similarity.brpRouteMaxN) == "ivf")
    assert(Similarity.annRouteChoice(2000000L) == "ivf") // the 2M gate
    assert(Similarity.annRouteChoice(2000000L, force = "brp") == "brp")
    assert(Similarity.annRouteChoice(100L, force = "ivf") == "ivf")
    // routed call at fixture scale == the BRP arm with the batch knobs,
    // cos-converted exactly (cos = 1 - d²/2)
    val emb = Tables.embeddings(spark, sf())
    val n = emb.count()
    val qids = Seq(0L, 1L, 2L, 3L, 4L).toDF("vec_id")
    val routed = Similarity.annTopKRouted(emb, qids, k = 10, corpusCount = n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brp = Similarity.annTopK(emb, qids, k = 10,
        bucketLength = Similarity.autoBucketLength(n), numTables = 8,
        maxDistance = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed == brp, s"routed pairs != BRP-arm pairs at fixture scale")
    // forced-IVF arm still recalls against brute force
    val exact = graft.SparkEntry.queries("emb_cosine_topk")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annTopKRouted(emb, qids, k = 10, corpusCount = n,
        force = "ivf")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"forced-IVF routed recall $recall")
  }

  test("ANN entry points are single distributed jobs — no per-query union") {
    // VERDICT r3 item 2: the old shape was one Spark job per query vector
    // unioned on the driver. The plan must contain no Union and only a
    // bounded number of shuffles regardless of query-set size.
    // Walk the physical plan for node CLASSES (ADVICE r4): substring
    // matches on toString also hit BroadcastExchange / node renames.
    import org.apache.spark.sql.execution.UnionExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def unions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect { case _: UnionExec => 1 }.sum
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect { case _: ShuffleExchangeExec => 1 }.sum

    val ann = Similarity.annTopK(Tables.embeddings(spark, sf()), Seq(0L, 1L, 2L, 3L, 4L), k = 10)
    assert(unions(ann) == 0, s"annTopK plan has a Union:\n${ann.queryExecution.sparkPlan}")

    val ivf = Similarity.ivfTopK(Tables.embeddings(spark, sf()), Seq(0L, 1L, 2L, 3L, 4L),
      k = 10, nCells = 0, nProbe = 0)
    assert(unions(ivf) == 0, s"ivfTopK plan has a Union:\n${ivf.queryExecution.sparkPlan}")
    // query side broadcasts into the cell join (BroadcastExchange, not
    // counted); the corpus never shuffles — the only data shuffle is the
    // top-k aggregate's partial/final exchange
    val nExch = shuffles(ivf)
    assert(nExch <= 2, s"ivfTopK plan has $nExch shuffles:\n${ivf.queryExecution.sparkPlan}")
  }

  test("batch-parameter ANN (narrow buckets, 8 tables): recall vs inline brute force") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf())
    val qids = (0L until 50L)
    // inline exact top-10 per query via the codegen cosine + window
    val q = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    val exact = broadcast(q).join(c, col("qid") =!= col("cid"))
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, qids.toSeq, k = 10,
        bucketLength = 0.15, numTables = 8)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"batch-param ANN recall $recall")
  }

  test("canonicalDocs is invariant to input partitioning (deterministic CC)") {
    val docs = Tables.documents(spark, sf())
    def runIt(d: org.apache.spark.sql.DataFrame) =
      Dedup.canonicalDocs(d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(runIt(docs) == runIt(docs.repartition(7)))
  }

  test("ANN knob auto-scaling reproduces the measured SCALE.md anchor points") {
    // The formulas are anchored to measured sweet spots, not guessed —
    // pin them so a refactor can't silently detach them from the data:
    // nCells ∝ √n anchored at the measured 16 @ 2k (VERDICT r9 item 3:
    // the r9 constant-occupancy law made centroid count linear — √n is
    // the FAISS assignment/search balance and keeps the driver collect,
    // broadcast, and per-row scan sub-linear);
    // AND-width 6 @ 2k and 8 @ 20k (zero recall loss);
    // bucketLength 0.15 @ 2k and ≈0.05 @ 20k (measured hand value).
    assert(Similarity.autoNCells(2000) == 16)
    assert(Similarity.autoNCells(20000) == 51) // 16·√10
    // sub-linear growth law: 100× the corpus → 10× the cells
    assert(Similarity.autoNCells(200000) == 160)
    assert(Similarity.autoNCells(1000000000L) == 11314) // ~√n, broadcastable
    assert(Similarity.autoNProbe(16) == 4 && Similarity.autoNProbe(51) == 4)
    assert(Similarity.autoNProbe(1600) == 40) // fraction never below 2.5%
    assert(Similarity.autoHashesPerTable(2000) == 6)
    assert(Similarity.autoHashesPerTable(20000) == 8)
    assert(math.abs(Similarity.autoBucketLength(2000) - 0.15) < 1e-9)
    // r17 recall-first floor: the 1/sqrt(n) narrowing stops at 0.1 —
    // the 2M-vector gate measured recall@10 0.39 at the old 0.02 floor
    // vs 0.956 at 0.1 (see Similarity.autoBucketLength scaladoc)
    assert(math.abs(Similarity.autoBucketLength(20000) - 0.1) < 1e-9)
    assert(math.abs(Similarity.autoBucketLength(2000000) - 0.1) < 1e-9)
    // degenerate corpora stay sane
    assert(Similarity.autoNCells(0) == 1)
    assert(Similarity.autoHashesPerTable(0) >= 2)
  }

  test("auto-knob paths skip the corpus count job when corpusCount is handed in") {
    // ADVICE/VERDICT r7 item: a per-batch pipeline calling ANN in auto
    // mode paid one count() job per call. The count threads through now;
    // job accounting via job groups proves the count job disappears.
    val emb = Tables.embeddings(spark, sf()).select("vec_id", "embedding")
    val n = emb.count()
    val q = emb.select("vec_id").limit(5)

    def jobsIn(group: String)(body: => Unit): Int = {
      val sc = spark.sparkContext
      sc.setJobGroup(group, group)
      try body finally sc.clearJobGroup()
      // statusTracker is listener-fed; poll until the count stabilizes
      var prev = -1
      var cur = sc.statusTracker.getJobIdsForGroup(group).length
      while (cur != prev) {
        prev = cur; Thread.sleep(300)
        cur = sc.statusTracker.getJobIdsForGroup(group).length
      }
      cur
    }

    val auto = jobsIn("ivf-auto") {
      Similarity.ivfTopK(emb, q, k = 5).collect()
    }
    Caches.releaseAll(spark)
    val threaded = jobsIn("ivf-threaded") {
      Similarity.ivfTopK(emb, q, k = 5, corpusCount = n).collect()
    }
    Caches.releaseAll(spark)
    assert(threaded < auto,
      s"passing corpusCount should shed the count job: auto=$auto threaded=$threaded")

    // results must be identical — the threaded count feeds the same knob
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(key(Similarity.ivfTopK(emb, q, k = 5, corpusCount = n)) ==
      key(Similarity.ivfTopK(emb, q, k = 5)))
    Caches.releaseAll(spark)
  }

  test("annTopK/ivfTopK: empty query set yields empty frame, not an error") {
    assert(Similarity.annTopK(Tables.embeddings(spark, sf()), Seq(-1L), k = 5).count() == 0)
    assert(Similarity.ivfTopK(Tables.embeddings(spark, sf()), Seq(-1L),
      k = 5, nCells = 0, nProbe = 0).count() == 0)
  }

  test("tfidf: rare terms outweigh common ones") {
    val out = Similarity.tfidf(Tables.documents(spark, sf())).collect()
    assert(out.length > 0)
    val vecs = out.map(_.getAs[org.apache.spark.ml.linalg.Vector]("tfidf"))
    assert(vecs.forall(_.numNonzeros > 0))
    // idf weighting: no vector should be all-equal weights (would mean idf
    // collapsed); check some variance exists
    val v = vecs.head.toArray.filter(_ != 0)
    assert(v.distinct.length > 1 || vecs.length == 1)
  }

  test("similar-docs retrieval: planted near-copies rank first, output k-bounded and sorted") {
    import spark.implicits._
    // the word-salad fixture's shared vocabulary makes unigram TF-IDF a
    // weak signal between arbitrary docs, so plant unambiguous truth:
    // a copy of each query doc with every 5th token dropped (80% token
    // overlap) MUST be its nearest lexical neighbor
    val docs = Tables.documents(spark, sf())
    val thin = udf { (text: String) =>
      text.split("\\s+").zipWithIndex.collect { case (t, i) if i % 5 != 0 => t }
        .mkString(" ")
    }
    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val planted = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + lit(100000L)).as("doc_id"),
        thin(col("text")).as("text"), col("lang"), col("source"), col("n_chars"))
    val corpus = docs.unionByName(planted)

    val top = Similarity.similarDocsTopK(corpus, queries.toDF("doc_id"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    queries.foreach { q =>
      val rows = top(q).sortBy(-_._3)
      assert(rows.length <= 10 && rows.nonEmpty)
      assert(rows.forall(r => r._3 >= -1e-9 && r._3 <= 1.0 + 1e-9))
      assert(rows.forall(_._2 != q), "self must be excluded")
      assert(rows.head._2 == q + 100000L,
        s"query $q: planted copy not rank-1, got ${rows.take(3).mkString(";")}")
    }
  }
}
