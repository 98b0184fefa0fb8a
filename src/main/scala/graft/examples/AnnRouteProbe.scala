package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BRP→IVF routing-boundary measurement (r18, VERDICT r17 item 6):
  * wall + recall@10 for BOTH [[graft.ext.Similarity.annTopKRouted]]
  * arms at one fixture scale, against the exact 50-query brute-force
  * top-10. Run over the 10×/100×/1000× embedding fixtures
  * (20k/200k/2M vectors) to locate the crossover that sets
  * `Similarity.brpRouteMaxN`.
  *
  * Usage: runMain graft.examples.AnnRouteProbe <factor|fixtureDir> [dim]
  * (a numeric arg derives target/sfx<factor> from sf0.1, building the
  * embedding fixture if absent). One [annroute-json] line per run.
  *
  * `dim` (r19, VERDICT r18 item 5 — the d-axis of the crossover grid):
  * expand the 64-dim fixture to `dim` by concatenating dim/64
  * per-block orthogonal mutations (ScaleStress.mutateEmbedding —
  * rotation + fixed sign pattern) of each vector. The block transform
  * is identical for every vector, so EVERY pairwise cosine is
  * preserved exactly: cos(concat_b R_b(x), concat_b R_b(y)) =
  * k·⟨x,y⟩ / (k·|x||y|) = cos(x, y). Recall differences across the
  * d-sweep therefore isolate how the INDEX behaves in higher
  * dimension (BRP projection collisions, IVF cell geometry) with the
  * data's neighborhood structure held fixed — the exact top-10 sets
  * are the same at every d.
  */
object AnnRouteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baseDir = args(0).toIntOption match {
      case Some(f) =>
        val out = s"/root/repo/target/sfx$f"
        ScaleStress.buildFixture(spark, "/root/testdata/sf0.1", out, f)
        out
      case None => args(0)
    }
    val dim = if (args.length > 1) args(1).toInt else 64
    require(dim >= 64 && dim % 64 == 0, s"dim must be a multiple of 64: $dim")
    val dir = if (dim == 64) baseDir else {
      val out = s"$baseDir-d$dim"
      val guard = new java.io.File(s"$out/_built_d$dim")
      if (!guard.exists()) {
        new java.io.File(out).mkdirs()
        val blocks = dim / 64
        val expand = udf { (e: Seq[Float]) =>
          (0 until blocks).flatMap(b =>
            if (b == 0) e else ScaleStress.mutateEmbedding(e, b))
        }
        spark.read.parquet(s"$baseDir/embeddings.parquet")
          .select(col("vec_id"), expand(col("embedding")).as("embedding"),
            col("label"))
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        guard.createNewFile(): Unit
      }
      out
    }

    val embS = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = embS.count()
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val qids = embS.select("vec_id").orderBy("vec_id").limit(50)
    val qside = embS.join(broadcast(qids), "vec_id")
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val corpus = embS.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val exact = broadcast(qside).join(corpus, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr("cosine_sim(qe, ce)").as("cos"))
      .groupBy("qid").agg(expr("topk_by_score(cos, cid, 10)").as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val arms = Seq("brp", "ivf").map { force =>
      var best = Double.MaxValue
      // recall is a property of the (deterministic) result set, not of
      // a rep — compute it from rep 1 and REQUIRE the reps' pair sets
      // identical (r18 ADVICE: best-of-2 wall + last-rep recall would
      // silently mix reps if the arms ever went nondeterministic).
      var pairs: Set[(Long, Long)] = null
      (0 until 2).foreach { _ =>
        val t0 = System.nanoTime()
        val got = graft.ext.Similarity
          .annTopKRouted(embS, qids, k = 10, corpusCount = n, force = force)
          .select("qid", "cid")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        if (pairs == null) pairs = got
        else require(pairs == got,
          s"arm $force nondeterministic across reps: " +
            s"${(pairs diff got).size}+${(got diff pairs).size} pair diff")
        spark.catalog.clearCache(); graft.ext.Caches.releaseAll(spark)
      }
      val recall = (pairs & exact).size.toDouble / math.max(exact.size, 1)
      println(f"[annroute] n=$n force=$force: $best%.2f s recall=$recall%.3f")
      f""""$force":{"sec":$best%.2f,"recall":$recall%.3f}"""
    }
    val auto = graft.ext.Similarity.annRouteChoice(n)
    println(s"""[annroute-json] {"n":$n,"d":$dim,"auto":"$auto",${arms.mkString(",")}}""")
    spark.stop()
  }
}
