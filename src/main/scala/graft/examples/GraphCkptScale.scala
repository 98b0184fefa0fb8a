package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Checkpoints.CutOps

/** Reliable-checkpoint mode over the ITERATIVE graph family at scale
  * (r18, VERDICT r17 item 2). r17 priced the `graft.checkpoint.dir`
  * toggle on the 5-cut corpus-build composite only; the multi-sweep
  * graph jobs are what an executor loss actually kills — PageRank's
  * per-sweep cuts, connected components' ~10 label-propagation rounds,
  * Borůvka's ceil(log2 n)+1 contraction rounds each truncate lineage
  * into (by default) unrecoverable block-manager blocks. This main
  * runs the three shapes at the given factor in BOTH modes in one
  * session and reports wall, the checkpoint-directory footprint after
  * each reliable job (with `spark.cleaner.referenceTracking.
  * cleanCheckpoints=true`, so growth across rounds shows whether the
  * cleaner keeps up), and an order-insensitive distributed hash of
  * each result so bit-identity across modes is CHECKED at scale, not
  * assumed from the fixture-scale CheckpointModeSpec pin.
  *
  * Rows: `ext_pagerank` (registry row over the `factor`-replicated
  * orders/lineitem fixtures — 3 damped sweeps), a planted
  * 1000-chains + 8-cliques CC graph at 5M nodes (the `cc_scale`
  * discipline — ext_entity_components' operator; its registry row's ER
  * candidate join is brand-blocked and replicas grow blocks, so the
  * planted graph is the honest scale vehicle for the CC loop), and
  * `ext_mst_backbone` (registry row; the session-cached kNN-fixture
  * prologue is warmed once untimed so both modes measure the Borůvka
  * contraction, which is where the per-round cuts live).
  *
  * Usage: runMain graft.examples.GraphCkptScale [factor]
  * (default 1000; fixtures under target/sfx<factor>). One
  * [graphckpt-json] line per run.
  */
object GraphCkptScale {

  /** Order-insensitive distributed fingerprint: per-row md5 over the
    * concatenated cells, folded by an executor-side SUM of the first
    * 60 bits (exact as DECIMAL) plus a row count — one pass, nothing
    * collected. Equal frames agree; a single changed row changes the
    * sum with probability ~1. */
  private def distHash(df: DataFrame): String = {
    val rowHash = md5(concat_ws("",
      df.columns.map(c => col(c).cast("string")): _*))
    val r = df.select(
      sum(conv(substring(rowHash, 1, 15), 16, 10).cast("decimal(38,0)"))
        .cast("string").as("h"),
      count(lit(1)).as("n")).collect()(0)
    s"${r.getString(0)}/${r.getLong(1)}"
  }

  private def dirBytes(p: String): Long = {
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(root)) return 0L
    val st = java.nio.file.Files.walk(root)
    try st.filter(java.nio.file.Files.isRegularFile(_: java.nio.file.Path))
      .mapToLong(java.nio.file.Files.size(_: java.nio.file.Path)).sum()
    finally st.close()
  }

  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 1000
    val src = "/root/testdata/sf0.1"
    val out = s"/root/repo/target/sfx$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    ScaleStress.buildLineitemFixture(spark, src, out, factor)
    ScaleStress.buildOrdersFixture(spark, src, out, factor)
    val ckptDir = s"/root/repo/target/relckpt-graph-$factor"

    // planted CC graph, the cc_scale discipline at 5M nodes
    def ccEdges(): DataFrame = {
      val half = 2500000L
      val chains = spark.range(half - 1).filter(col("id") % 1000 =!= 999)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val bs = 8
      val pairsDf = (for { i <- 0 until bs; j <- (i + 1) until bs }
        yield (i, j)).toDF("i", "j")
      val cliques = spark.range(half / bs).crossJoin(pairsDf)
        .select((lit(half) + col("id") * bs + col("i")).as("doc_a"),
          (lit(half) + col("id") * bs + col("j")).as("doc_b"))
      chains.unionByName(cliques)
    }

    // warm the session-cached kNN fixture once (untimed) so both modes
    // measure the Borůvka contraction, not the shared prologue
    try {
      graft.SparkEntry.queries("ext_mst_backbone")(spark, out)
        .write.format("noop").mode("overwrite").save()
      println("[graphckpt] mst kNN fixture warmed")
    } catch { case e: Throwable =>
      System.err.println(s"[graphckpt] mst warm failed: ${e.getMessage}")
    }
    graft.ext.Caches.releaseAll(spark); spark.catalog.clearCache()

    val results = scala.collection.mutable.LinkedHashMap[
      (String, String), (Double, String, Long)]()
    for (mode <- Seq("local", "reliable")) {
      if (mode == "reliable")
        spark.conf.set("graft.checkpoint.dir", ckptDir)
      else spark.conf.unset("graft.checkpoint.dir")

      def run(row: String)(mk: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val h = distHash(mk)
        val sec = (System.nanoTime() - t0) / 1e9
        val ck = dirBytes(ckptDir)
        results((row, mode)) = (sec, h, ck)
        println(f"[graphckpt] $row%-22s $mode%-8s $sec%8.1f s  hash=$h  " +
          f"ckptMiB=${ck / 1024 / 1024}")
        graft.ext.Caches.releaseAll(spark); spark.catalog.clearCache()
      }

      run("ext_pagerank") {
        graft.SparkEntry.queries("ext_pagerank")(spark, out)
      }
      run("cc_planted_5m") {
        graft.ext.Dedup.connectedComponents(ccEdges().cutLineage())
      }
      run("ext_mst_backbone") {
        graft.SparkEntry.queries("ext_mst_backbone")(spark, out)
      }
    }

    val rows = Seq("ext_pagerank", "cc_planted_5m", "ext_mst_backbone")
    val js = rows.map { r =>
      val (ls, lh, _) = results((r, "local"))
      val (rs, rh, rc) = results((r, "reliable"))
      val same = lh == rh
      println(f"[graphckpt] $r%-22s local $ls%7.1f s  reliable $rs%7.1f s " +
        f"(tax ${100 * (rs - ls) / ls}%+.1f%%)  identical=$same")
      f""""$r":{"localSec":$ls%.1f,"reliableSec":$rs%.1f,"identical":$same,"ckptMiB":${rc / 1024 / 1024}}"""
    }.mkString("{", ",", "}")
    println(s"""[graphckpt-json] {"factor":$factor,"rows":$js}""")
    spark.stop()
  }
}
