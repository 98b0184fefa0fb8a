package graft.ext

import org.apache.spark.sql.DataFrame

/** Adaptive input spreading for heavy NARROW preludes (r11).
  *
  * A parquet scan parallelizes at row-group granularity; a small
  * corpus fixture is often one row group, so every per-row text stage
  * downstream of the scan — shingling, k-gram explode, md5 hashing,
  * feature extraction — runs in ONE task until the first shuffle
  * (measured: the span-dedup gram pipeline spent 2-4 s serial on a
  * 5000-doc single-row-group file while 31 cores idled). This helper
  * repartitions to the session's parallelism ONLY when the input has
  * materially fewer partitions than cores; at production scale a scan
  * already has >= cores splits and this is a strict no-op — no shuffle
  * is ever added to a properly-partitioned input.
  *
  * Partition-order independence: every consumer below is order-free
  * (distinct/groupBy aggregates, quantized-long sums), so the
  * round-robin redistribution cannot change results. */
private[graft] object Spread {

  import org.apache.spark.sql.catalyst.plans.logical._

  /** True when the plan is narrow ops over leaves only — the
    * precondition under which `df.rdd.getNumPartitions` plans the scan
    * without launching a job. On an AQE plan with upstream shuffles,
    * `df.rdd` can materialize query stages (i.e. RUN jobs) and reads
    * pre-AQE partition counts (ADVICE r11), so anything wider is left
    * untouched rather than probed. */
  private def narrowScanRooted(plan: LogicalPlan): Boolean = plan match {
    case p: Project       => narrowScanRooted(p.child)
    case f: Filter        => narrowScanRooted(f.child)
    case s: SubqueryAlias => narrowScanRooted(s.child)
    case g: Generate      => narrowScanRooted(g.child)
    case _: LeafNode      => true
    case _                => false
  }

  def apply(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val cores = sc.defaultParallelism
    if (!narrowScanRooted(df.queryExecution.analyzed)) df
    else if (df.rdd.getNumPartitions * 2 >= cores) df
    else df.repartition(cores)
  }
}
