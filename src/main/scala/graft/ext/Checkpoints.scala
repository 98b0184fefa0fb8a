package graft.ext

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage cuts for the iterative operators (connected components,
  * PageRank, label propagation, BPE merges, k-means residuals, the
  * corpus-build stage boundaries, fixture memos).
  *
  * Every multi-sweep self-join loop in this library must cut lineage
  * periodically or the plan snowballs (the CC/PageRank O(log n) rounds
  * would otherwise re-derive round 1 at round 12). Two ways to cut:
  *
  *   - `localCheckpoint` (the DEFAULT, `graft.checkpoint.dir` unset):
  *     blocks live in the executors' block managers. Fast — no
  *     filesystem round-trip — and exactly right on local[*] or when a
  *     lost executor is acceptable grounds for a job retry. The caveat
  *     at cluster scale: those blocks are NOT recoverable; an executor
  *     loss mid-job kills every computation whose lineage was truncated
  *     into it (Spark's own scaladoc warning).
  *
  *   - RELIABLE `checkpoint` (`graft.checkpoint.dir` set, e.g. an HDFS
  *     path): materialized files survive executor loss — the mode a
  *     1000-executor 100 TB run wants for hour-long iterative jobs,
  *     paying one write+read round-trip per cut. The reference embodies
  *     the same decision: samsa's entire changelog design
  *     (samsa/kafka/storage.py:151-184) exists to rebuild state after
  *     exactly this class of failure.
  *
  * The two modes produce IDENTICAL results (CheckpointModeSpec pins
  * PageRank + LSH-verified dedup bit-for-bit across the toggle) — the
  * config trades wall time for fault tolerance, never semantics.
  *
  * Set via `spark.conf.set("graft.checkpoint.dir", dir)` or submit-time
  * `--conf spark.graft.checkpoint.dir=dir` (both keys honored).
  * Housekeeping: reliable checkpoint files are NOT auto-deleted unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; long-lived
  * sessions should enable that or clean the directory between jobs.
  */
object Checkpoints {

  /** Set the SparkContext checkpoint dir at most once per (context,
    * configured dir): setCheckpointDir creates a fresh UUID child per
    * call, so calling it per-cut would scatter files and defeat the
    * cleaner. */
  private val applied =
    new java.util.concurrent.ConcurrentHashMap[(SparkContext, String), String]()

  private def configuredDir(df: DataFrame): Option[String] = {
    val conf = df.sparkSession.conf
    conf.getOption("graft.checkpoint.dir")
      .orElse(conf.getOption("spark.graft.checkpoint.dir"))
      .filter(_.nonEmpty)
  }

  /** True when `graft.checkpoint.dir` is configured — i.e. [[cut]]
    * would write a RELIABLE checkpoint. Iterative loops use this to
    * pick their in-loop cadence (r20): in LOCAL mode a per-round
    * `localCheckpoint` is nearly free AND keeps every round's plan a
    * flat `LogicalRDD` leaf, while a persist-only round nests the full
    * round plan inside an `InMemoryRelation` — re-analyzed every
    * subsequent round and re-rendered by AQE per stage, which at
    * fixture scale swamped the actual work (measured r20: the
    * CC-consuming registry family regressed 2-8× per row under
    * unconditional persist rounds — emb_dbscan_grid 4.1→32.8 s,
    * ext_entity_components 4.8→16.5 s — while the 5M-node reliable-
    * mode A/B showed the same persist rounds costing ~nothing next to
    * the checkpoint I/O they avoid). So: local mode cuts every round;
    * reliable mode cuts every [[stride]] rounds and persists between,
    * trading bounded recompute for proportionally fewer write-
    * throughs. */
  def reliableModeOn(df: DataFrame): Boolean = configuredDir(df).isDefined

  /** Cut `df`'s lineage: reliable `checkpoint` when
    * `graft.checkpoint.dir` is configured, `localCheckpoint` otherwise.
    * `eager = false` defers materialization to the first action (the
    * BPE merge-loop shape).
    *
    * A persist-before-checkpoint variant was tried and MEASURED WORSE
    * (r19, SCALE.md): Spark's checkpoint-write job mostly re-reads the
    * cut frame's existing shuffle output, so the "avoid computing
    * twice" persist only adds a second full write of the data through
    * the block manager — PageRank's 1000× reliable tax went +28→+30%,
    * CC +5→+25%, Borůvka +4.5→+194% (the persist evicted the MST kNN
    * session cache). Cuts stay plain `checkpoint`; what actually cut
    * the tax is [[pin]] below — most of PageRank's checkpoint bytes
    * were a loop-INVARIANT frame that never needed a lineage cut.
    *
    * Two companion knobs for the reliable mode, both measured in
    * SCALE.md r19: `spark.checkpoint.compress=true` (core conf — set it
    * at session build; lz4 on the checkpoint stream cuts the write
    * bytes) and `graft.checkpoint.stride` (how many iterative sweeps
    * run between in-loop cuts, default 4 — recovery recompute after an
    * executor loss is bounded by stride sweeps, while the per-cut bytes
    * are paid iters/stride times; see [[Graph.pageRank]]). */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    configuredDir(df) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        applied.computeIfAbsent((sc, dir), _ => {
          sc.setCheckpointDir(dir); dir
        })
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  /** Materialize a LOOP-INVARIANT frame once, WITHOUT cutting lineage
    * (r19, VERDICT r18 item 2): eager MEMORY_AND_DISK persist. The
    * distinction from [[cut]] is what executor loss means: a persisted
    * frame's lost blocks RECOMPUTE from lineage (its upstream is a
    * one-shot batch stage that still exists), so durability is free —
    * no checkpoint write in either mode. Only frames whose lineage
    * GROWS (the per-sweep rank/label/component frames of an iterative
    * loop) need [[cut]]; a loop-invariant input (PageRank's edge list,
    * PPR's seed base) materialized with `cut` was paying the full
    * reliable write-through for nothing — the 120M-edge frame was
    * ~1 GiB of PageRank's ~1 GiB checkpoint footprint and most of its
    * +28% reliable tax (SCALE.md r18 vs r19). The plan-depth cost of
    * keeping lineage is constant (the prologue appears once per sweep
    * plan, never compounds). */
  def pin(df: DataFrame): DataFrame = pinCounted(df)._1

  /** [[pin]] that also returns the row count its materializing action
    * learns — callers that need the count for a layout/strategy gate
    * (Graph.pinByKey) were re-counting the frame they just pinned. */
  def pinCounted(df: DataFrame): (DataFrame, Long) = {
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    val n = df.count()
    (df, n)
  }

  /** Sweeps between in-loop lineage cuts for the iterative operators
    * (`graft.checkpoint.stride`, default 4). The k-choice law, measured
    * at 1000× in SCALE.md r19: total cut cost ∝ bytes-per-cut ×
    * iters/stride, while an executor-loss recovery in reliable mode
    * recomputes at most `stride` sweeps from the last cut — so larger
    * strides trade bounded extra recovery work for proportionally
    * cheaper steady-state wall. Plan/lineage depth between cuts grows
    * linearly in stride (multiplicative analysis cost per sweep), which
    * is why the default stays small. */
  def stride(df: DataFrame): Int =
    df.sparkSession.conf.getOption("graft.checkpoint.stride")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(4)

  /** `.cutLineage()` / `.cutLineageLazy()` postfix forms so operator
    * code keeps the chaining shape `.distinct().cutLineage()`. */
  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df, eager = true)
    def cutLineageLazy(): DataFrame = cut(df, eager = false)
    /** Loop-invariant materialization — see [[Checkpoints.pin]]. */
    def pinInvariant(): DataFrame = pin(df)
  }
}
