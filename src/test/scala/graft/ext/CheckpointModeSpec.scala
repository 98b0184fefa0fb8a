package graft.ext

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame

/** The `graft.checkpoint.dir` toggle (VERDICT r16 item 1): with the
  * config set, every iterative lineage cut goes through RELIABLE
  * `checkpoint(dir)` (survives executor loss on a cluster); unset, the
  * default `localCheckpoint` (fast, executor-local). The contract this
  * spec pins: the toggle changes FAULT TOLERANCE only — results are
  * identical bit-for-bit, and reliable mode demonstrably writes its
  * cut points under the configured directory.
  */
class CheckpointModeSpec extends SparkSpec {

  private def withReliable[T](body: => T): (T, java.io.File) = {
    val dir = Files.createTempDirectory("graft-reliable-ckpt").toFile
    spark.conf.set("graft.checkpoint.dir", dir.toString)
    try (body, dir)
    finally spark.conf.unset("graft.checkpoint.dir")
  }

  private def rddFiles(root: java.io.File): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.startsWith("part-")) 1 else 0
    walk(root)
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("ext_pagerank: local and reliable checkpoint modes agree bit-for-bit") {
    import spark.implicits._
    // a deterministic multi-component graph, big enough for several
    // pointer-jump rounds (each round is a lineage cut)
    val edges = (0L until 600L).flatMap { i =>
      Seq((i, (i * 7 + 1) % 600), (i, (i * 13 + 5) % 600))
    }.toDF("src", "dst")
    val local = sorted(Graph.pageRank(edges, iters = 12)
      .select("id", "r"))
    val (reliable, dir) = withReliable {
      sorted(Graph.pageRank(edges, iters = 12).select("id", "r"))
    }
    assert(local == reliable, "PageRank must be mode-independent")
    assert(rddFiles(dir) > 0,
      "reliable mode must materialize checkpoint files under the configured dir")
  }

  test("doc_lsh_verified_dedup: local and reliable checkpoint modes agree bit-for-bit") {
    val docs = Tables.documents(spark, sf())
    val local = sorted(Dedup.lshVerifiedCanonicalDocs(docs))
    Caches.releaseAll(spark)
    // stride 1 for the byte assertion (r20): the CC round loop now
    // rides `graft.checkpoint.stride` — at the default 4, a fixture
    // graph that converges in 2-3 star rounds cuts NOTHING (persist
    // rounds only), which is the stride dial working as designed, not
    // reliable mode failing to engage. Forcing per-round cuts keeps
    // this test pinning what it always pinned: configured dir in,
    // checkpoint files out.
    spark.conf.set("graft.checkpoint.stride", "1")
    val (reliable, dir) = try withReliable {
      sorted(Dedup.lshVerifiedCanonicalDocs(docs))
    } finally spark.conf.unset("graft.checkpoint.stride")
    Caches.releaseAll(spark)
    assert(local == reliable, "LSH-verified dedup must be mode-independent")
    assert(rddFiles(dir) > 0,
      "reliable mode must materialize checkpoint files under the configured dir")
  }

  test("CC stride: cut cadence rides graft.checkpoint.stride, values identical (r20)") {
    import spark.implicits._
    // a chain forest deep enough for >stride star rounds is not needed:
    // what matters is (a) identical labels at every stride and (b) at a
    // stride larger than the round count, reliable mode writes ZERO
    // checkpoint files (all persist rounds) while still converging
    val edges = (0L until 900L).filter(_ % 9 != 8)
      .map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val base = sorted(Dedup.connectedComponents(edges))
    Caches.releaseAll(spark)
    for (k <- Seq("1", "2", "50")) {
      spark.conf.set("graft.checkpoint.stride", k)
      val (got, dir) = try withReliable {
        sorted(Dedup.connectedComponents(edges))
      } finally spark.conf.unset("graft.checkpoint.stride")
      Caches.releaseAll(spark)
      assert(got == base, s"stride $k must not change CC labels")
      if (k == "1")
        assert(rddFiles(dir) > 0, "stride 1 must cut every round")
      if (k == "50")
        assert(rddFiles(dir) == 0,
          "a stride beyond the round count must leave the ckpt dir empty " +
            "(persist-only rounds)")
    }
  }

  test("reliable cuts are recoverable: frame survives a blockManager-level unpersist") {
    import spark.implicits._
    val (cut, _) = withReliable {
      Checkpoints.cut(Seq.tabulate(100)(i => (i.toLong, i * 2L)).toDF("a", "b"))
    }
    // a localCheckpoint frame dies when its blocks are dropped; a
    // reliable one recomputes from the checkpoint files
    cut.rdd.unpersist(blocking = true)
    assert(cut.count() == 100,
      "reliable checkpoint must be re-readable after its cached blocks drop")
  }

  test("checkpoint stride is configurable and value-neutral (r19)") {
    import spark.implicits._
    // default 4; conf overrides; garbage/non-positive fall back
    assert(Checkpoints.stride(spark.range(1).toDF) == 4)
    spark.conf.set("graft.checkpoint.stride", "2")
    try assert(Checkpoints.stride(spark.range(1).toDF) == 2)
    finally spark.conf.unset("graft.checkpoint.stride")
    spark.conf.set("graft.checkpoint.stride", "0")
    try assert(Checkpoints.stride(spark.range(1).toDF) == 4)
    finally spark.conf.unset("graft.checkpoint.stride")
    // the stride changes WHEN lineage is cut, never the values: the
    // identity pin that lets the tax/recovery dial move freely
    val edges = (0L until 400L).flatMap { i =>
      Seq((i, (i * 7 + 1) % 400), (i, (i * 11 + 3) % 400))
    }.toDF("src", "dst")
    val base = sorted(Graph.pageRank(edges, iters = 9).select("id", "r"))
    for (k <- Seq("1", "3", "8")) {
      spark.conf.set("graft.checkpoint.stride", k)
      try assert(sorted(Graph.pageRank(edges, iters = 9).select("id", "r"))
        == base, s"stride $k must not change PageRank values")
      finally spark.conf.unset("graft.checkpoint.stride")
    }
  }

  test("reliable eager cut leaves a caller-persisted frame cached (r19)") {
    import spark.implicits._
    val df = spark.range(50).toDF("id")
    df.persist()
    try {
      df.count()
      val (cut, _) = withReliable { Checkpoints.cut(df) }
      assert(cut.count() == 50)
      // Checkpoints.cut persists-then-releases only frames IT persisted;
      // a caller-owned cache must survive the cut untouched
      assert(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "cut must not unpersist a caller-persisted frame")
    } finally df.unpersist()
  }
}
