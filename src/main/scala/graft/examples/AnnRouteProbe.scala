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
  * Usage: runMain graft.examples.AnnRouteProbe <factor|fixtureDir>
  * (a numeric arg derives target/sfx<factor> from sf0.1, building the
  * embedding fixture if absent). One [annroute-json] line per run.
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
    val dir = args(0).toIntOption match {
      case Some(f) =>
        val out = s"/root/repo/target/sfx$f"
        ScaleStress.buildFixture(spark, "/root/testdata/sf0.1", out, f)
        out
      case None => args(0)
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
      var recall = 0.0
      (0 until 2).foreach { _ =>
        val t0 = System.nanoTime()
        val got = graft.ext.Similarity
          .annTopKRouted(embS, qids, k = 10, corpusCount = n, force = force)
          .select("qid", "cid")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        recall = (got & exact).size.toDouble / math.max(exact.size, 1)
        spark.catalog.clearCache(); graft.ext.Caches.releaseAll(spark)
      }
      println(f"[annroute] n=$n force=$force: $best%.2f s recall=$recall%.3f")
      f""""$force":{"sec":$best%.2f,"recall":$recall%.3f}"""
    }
    val auto = graft.ext.Similarity.annRouteChoice(n)
    println(s"""[annroute-json] {"n":$n,"auto":"$auto",${arms.mkString(",")}}""")
    spark.stop()
  }
}
