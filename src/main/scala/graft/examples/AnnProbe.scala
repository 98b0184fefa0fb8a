package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off knob sweep for the BRP-LSH recall collapse found by the r17
  * 1000x gate (auto bucketLength floors at 0.02, numTables=8 -> recall
  * 0.39 at 2M vectors while IVF holds 1.0). Measures (wall, recall@10)
  * for a grid of (bucketLength, numTables) on the sampled 50-query set
  * so the auto-knob revision is chosen from data, not theory.
  *
  * Usage: runMain graft.examples.AnnProbe <fixtureDir> [bl:tables,...]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val grid: Seq[(Double, Int)] =
      (if (args.length > 1) args(1) else "0.02:16,0.02:32,0.05:8,0.05:16,0.1:8")
        .split(',').toSeq.map { s =>
          val Array(bl, t) = s.split(':'); (bl.toDouble, t.toInt)
        }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embS = spark.read.parquet(s"$dir/embeddings.parquet")
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

    grid.foreach { case (bl, tables) =>
      val t0 = System.nanoTime()
      val ann = graft.ext.Similarity
        .annTopK(embS, queries = qids, k = 10, bucketLength = bl,
          numTables = tables, maxDistance = 2.0)
        .select("qid", "cid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); graft.ext.Caches.releaseAll(spark)
      val recall = (ann & exact).size.toDouble / math.max(exact.size, 1)
      println(f"[annprobe] bl=$bl%.3f tables=$tables%d: $sec%.2f s recall=$recall%.3f")
    }
    spark.stop()
  }
}
