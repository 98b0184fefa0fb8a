package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway debug main (not part of the library surface). */
object DebugDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("debug").getOrCreate()
    val docs = graft.Tables.documents(spark, args(0))
    graft.ext.Similarity.tfidfExactTerms(docs)
      .coalesce(1).write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
