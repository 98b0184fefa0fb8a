package graft.ext

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

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

  /** Cut `df`'s lineage: reliable `checkpoint` when
    * `graft.checkpoint.dir` is configured, `localCheckpoint` otherwise.
    * `eager = false` defers materialization to the first action (the
    * BPE merge-loop shape). */
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

  /** `.cutLineage()` / `.cutLineageLazy()` postfix forms so operator
    * code keeps the chaining shape `.distinct().cutLineage()`. */
  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df, eager = true)
    def cutLineageLazy(): DataFrame = cut(df, eager = false)
  }
}
