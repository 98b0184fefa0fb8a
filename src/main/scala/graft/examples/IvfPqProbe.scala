package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Knob sweep for the IVF-PQ recall fade found by the r17 1000x gate
  * (auto knobs: m=8, ksub=16, refine=16 -> recall@10 0.448 at 2M
  * vectors vs 0.946 at 200k). Two candidate levers, measured head to
  * head on the same 50-query sample: finer codes (ksub=256 — the
  * standard FAISS 8-bit nibble->byte step, 4x the code memory) vs a
  * deeper exact-refine shortlist (refine 64/128 at 4-bit codes).
  *
  * Usage: runMain graft.examples.IvfPqProbe <fixtureDir> [m:ksub:refine,...]
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val grid: Seq[(Int, Int, Int)] =
      (if (args.length > 1) args(1) else "8:256:16,8:16:128")
        .split(',').toSeq.map { s =>
          val Array(m, k, r) = s.split(':'); (m.toInt, k.toInt, r.toInt)
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
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("qe"))
    val corpus = embS.select(col("vec_id").as("cid"),
      transform(col("embedding"), x => x.cast("double")).as("ce"))
    val exact = broadcast(qside).join(corpus, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), expr("squared_l2(qe, ce)").as("dd"))
      .groupBy("qid").agg(expr("topk_by_score(-dd, cid, 10)").as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    grid.foreach { case (m, ksub, refine) =>
      val t0 = System.nanoTime()
      val approx = graft.ext.Embeddings
        .ivfPqTopK(embS, qids, k = 10, m = m, ksub = ksub, refine = refine)
        .select("qid", "cid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); graft.ext.Caches.releaseAll(spark)
      val recall = (approx & exact).size.toDouble / math.max(exact.size, 1)
      println(f"[ivfpqprobe] m=$m%d ksub=$ksub%d refine=$refine%d: $sec%.2f s recall=$recall%.3f")
    }
    spark.stop()
  }
}
