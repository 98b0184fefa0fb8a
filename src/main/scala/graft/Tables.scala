package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md). All queries take a scale-factor directory and read
  * through here so filter pushdown / column pruning reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.ts` is parquet timestamp[ns], which Spark's vectorized reader
    * rejects. With `spark.sql.legacy.parquet.nanosAsLong=true` (set in our
    * session builders) it arrives as nanos-since-epoch LongType; we truncate
    * to micros — exactly DuckDB's CAST(TIMESTAMP_NS AS TIMESTAMP) — so both
    * engines see identical event times. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (for spark.sql-driven tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** EXACT row count of a parquet table read on the DRIVER from file
    * footers — no Spark job (r21, guide §1.2/§5: several operators need
    * a table's row count only to pick a physical layout or a join
    * strategy, and were paying a full count(*) job — ~0.3-0.5 s of pure
    * task scheduling per call at fixture scale, once per rep under the
    * bench's cache-clearing protocol). A parquet footer records the
    * file's row count; summing footers is milliseconds for any sane
    * file count and scales with FILE count, not row count — the same
    * metadata a table format's statistics would serve. Handles both a
    * single-file table (the test fixtures) and a directory of part
    * files (ScaleStress replicas). Not a cache: re-read per call. */
  def parquetRowCount(spark: SparkSession, dir: String, name: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = root.getFileSystem(conf)
    def leafFiles(st: org.apache.hadoop.fs.FileStatus)
        : Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(leafFiles)
      else if (st.getPath.getName.endsWith(".parquet") && st.getLen > 0) Seq(st)
      else Nil
    leafFiles(fs.getFileStatus(root)).map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }
}
