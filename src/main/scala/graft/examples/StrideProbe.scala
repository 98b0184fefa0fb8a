package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the `graft.checkpoint.stride` dial (r19, VERDICT r18
  * item 2): PageRank in RELIABLE mode with enough sweeps that the
  * in-loop rank cuts dominate the checkpoint traffic (the loop-
  * invariant edge/degree frames are pinned since r19 and write
  * nothing). stride=1 cuts every sweep (iters-1 rank frames through
  * the checkpoint FS — the recovery-recompute bound is 1 sweep);
  * stride=4 (default) cuts every 4th (recovery bound 4 sweeps at a
  * quarter of the write bytes). Wall + ckpt bytes per arm quantify
  * the k-choice law: cut cost ∝ bytes-per-cut × iters/stride.
  *
  * One JVM per invocation; do a reversed-order second run and take
  * per-arm minima (same discipline as the bench fold — session aging
  * would otherwise bias the later arm).
  *
  * Usage: runMain graft.examples.StrideProbe [factor] [iters] [stride,stride,...]
  * (defaults 1000 / 8 / 1,4). One [strideprobe-json] line.
  */
object StrideProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 1000
    val iters = if (args.length > 1) args(1).toInt else 8
    val strides = (if (args.length > 2) args(2) else "1,4")
      .split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      if (factor >= 100) "256" else cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.checkpoint.compress", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckptDir = s"/root/repo/target/strideprobe-$factor"
    spark.conf.set("graft.checkpoint.dir", ckptDir)

    def prEdges() = {
      val n = 20000L * factor
      val base = spark.range(n).select(col("id"))
      val e1 = base.select(explode(array(
          struct(col("id").as("src"),
            pmod(xxhash64(col("id"), lit(1)), lit(n)).as("dst")),
          struct(col("id").as("src"),
            pmod(xxhash64(col("id"), lit(2)), lit(n)).as("dst")),
          struct(col("id").as("src"), ((col("id") + 1) % n).as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      e1.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }
    def dirBytes(): Long = {
      val root = java.nio.file.Paths.get(ckptDir)
      if (!java.nio.file.Files.exists(root)) return 0L
      val st = java.nio.file.Files.walk(root)
      try st.filter(java.nio.file.Files.isRegularFile(_: java.nio.file.Path))
        .mapToLong(java.nio.file.Files.size(_: java.nio.file.Path)).sum()
      finally st.close()
    }

    // untimed warm (JIT + page cache) at the default stride
    graft.ext.Graph.pageRank(prEdges(), iters = 3,
        edgeRowsHint = Some(6L * 20000L * factor))
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache(); graft.ext.Caches.releaseAll(spark)

    var h0: String = null
    val arms = strides.map { k =>
      spark.conf.set("graft.checkpoint.stride", k.toString)
      val b0 = dirBytes()
      val t0 = System.nanoTime()
      val res = graft.ext.Graph.pageRank(prEdges(), iters = iters,
        edgeRowsHint = Some(6L * 20000L * factor))
      // same order-insensitive fingerprint as GraphCkptScale: non-empty
      // \u0001 field separator (landed r19 as a literal control char --
      // invisible to a grep, which read it as ""; escaped in r20 so the
      // source audits as what it is)
      val rowHash = md5(concat_ws("\u0001",
        res.columns.map(c => coalesce(col(c).cast("string"), lit("NULL"))): _*))
      val r = res.select(
        sum(conv(substring(rowHash, 1, 15), 16, 10).cast("decimal(38,0)"))
          .cast("string"), count(lit(1))).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val wrote = (dirBytes() - b0).max(0L) / 1024 / 1024
      val h = s"${r.getString(0)}/${r.getLong(1)}"
      if (h0 == null) h0 = h
      require(h == h0, s"stride $k changed the result: $h0 -> $h")
      spark.catalog.clearCache(); graft.ext.Caches.releaseAll(spark)
      println(f"[strideprobe] stride=$k: $sec%.1f s  wroteMiB=$wrote  hash=$h")
      f""""$k":{"sec":$sec%.1f,"wroteMiB":$wrote}"""
    }
    println(s"""[strideprobe-json] {"factor":$factor,"iters":$iters,${arms.mkString(",")}}""")
    spark.stop()
  }
}
