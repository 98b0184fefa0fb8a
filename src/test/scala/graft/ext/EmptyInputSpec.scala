package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Degenerate-input behavior of every extension entry point: an empty
  * corpus must yield an empty (correctly-typed) result, never a crash —
  * at 100 TB a partition-pruned read or an over-aggressive upstream
  * filter routinely hands a pipeline zero rows.
  */
class EmptyInputSpec extends SparkSpec {

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row],
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType))))

  private def emptyEmb = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row],
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", StringType))))

  test("dedup entry points: empty corpus -> empty result, no crash") {
    assert(Dedup.nearDupEdges(emptyDocs).count() == 0)
    assert(Dedup.minhashCandidates(emptyDocs, Int.MaxValue).count() == 0)
    assert(Dedup.canonicalDocs(emptyDocs).count() == 0)
    assert(Dedup.lshVerifiedCanonicalDocs(emptyDocs).count() == 0)
    assert(Dedup.bloomNewDocs(emptyDocs, emptyDocs).count() == 0)
    assert(Dedup.connectedComponents(
      emptyDocs.selectExpr("doc_id AS doc_a", "doc_id AS doc_b")).count() == 0)
  }

  test("embedding entry points: empty corpus -> empty result, no crash") {
    assert(Similarity.cosineCandidatePairs(emptyEmb).count() == 0)
    assert(Dedup.cosineCanonical(emptyEmb).count() == 0)
    assert(Dedup.cosineCanonicalLsh(emptyEmb).count() == 0)
    assert(Dedup.semanticCanonical(emptyEmb).count() == 0)
    assert(Similarity.annTopK(emptyEmb, Seq(1L, 2L)).count() == 0)
  }

  test("text entry points: empty corpus -> empty result, no crash") {
    assert(Similarity.shingleVectors(emptyDocs).count() == 0)
    assert(Similarity.tfidf(emptyDocs).count() == 0)
    assert(Dedup.repeatedSpans(emptyDocs).count() == 0)
  }

  test("multimodal entry points: empty payload set -> empty result, no crash") {
    val emptyPayloads = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
    assert(Multimodal.decodeImages(emptyPayloads).count() == 0)
    assert(Multimodal.decodeAudio(emptyPayloads).count() == 0)
    assert(Multimodal.decodeVideoMeta(emptyPayloads).count() == 0)
    assert(Multimodal.phashNearDups(
      Multimodal.decodeImages(emptyPayloads).toDF()
        .select("doc_id", "phash")).count() == 0)
  }

  test("graph entry points: empty edges/nodes -> consistent result, no crash") {
    val emptyEdges = emptyDocs.selectExpr("doc_id AS a", "doc_id AS b")
    // label propagation: no edges -> everyone keeps their own label
    val nodes = spark.range(5).selectExpr("id AS node")
    val labs = Graph.labelPropagation(nodes, emptyEdges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs == (0L until 5L).map(i => i -> i).toMap)
    // and with zero nodes the result is empty, not a crash
    assert(Graph.labelPropagation(
      nodes.limit(0), emptyEdges, iters = 1).count() == 0)
  }

  test("profiler + event ops: empty tables -> typed results, no crash") {
    import org.apache.spark.sql.functions._
    // profiler: one row per column even on an empty table, all stats 0/null
    val prof = graft.queries.ProfileQ.profile(emptyDocs).collect()
    assert(prof.length == emptyDocs.schema.fields.length)
    prof.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.isNullAt(4) && r.isNullAt(5))
    }
    // funnel + retention + MAD over an empty events table
    val dir = java.nio.file.Files.createTempDirectory("empty-evt").toString
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val funnel = graft.SparkEntry.queries("evt_funnel")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(funnel == Map(1 -> 0L, 2 -> 0L, 3 -> 0L))
    assert(graft.SparkEntry.queries("evt_retention_cohort")(spark, dir).count() == 0)
    assert(graft.SparkEntry.queries("evt_anomaly_mad")(spark, dir).count() == 0)
  }

  test("r10 part-3 rows: empty tables -> empty results, no crash") {
    val dir = java.nio.file.Files.createTempDirectory("empty-evt3").toString
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq("ts_gapfill_interp", "ts_resample_ohlc", "etl_merge_upsert",
        "evt_transition_matrix", "evt_session_stats", "profile_drift_psi")
      .foreach { q =>
        assert(graft.SparkEntry.queries(q)(spark, dir).count() == 0,
          s"$q not empty on empty events")
      }
    val edir = java.nio.file.Files.createTempDirectory("empty-emb3").toString
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
      .write.mode("overwrite").parquet(s"$edir/embeddings.parquet")
    assert(graft.SparkEntry.queries("emb_knn_label_acc")(spark, edir).count() == 0,
      "emb_knn_label_acc not empty on empty embeddings")
  }

  test("r12 rows: empty tables -> empty/typed results, no crash") {
    val dir = java.nio.file.Files.createTempDirectory("empty-r12").toString
    emptyDocs.withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(0L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_suppkey", LongType),
        StructField("l_partkey", LongType), StructField("l_quantity", DoubleType),
        StructField("l_extendedprice", DoubleType),
        StructField("l_discount", DoubleType),
        StructField("l_returnflag", StringType),
        StructField("l_shipdate", TimestampType))))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq("doc_setsim_join", "doc_setsim_dedup", "doc_weighted_sample",
        "ts_seasonal_decompose", "ext_clustering_coeff")
      .foreach { q =>
        assert(graft.SparkEntry.queries(q)(spark, dir).count() == 0,
          s"$q not empty on empty input")
      }
    // triangle count on an empty graph is the 1-row (0 nodes, 0 edges,
    // 0 triangles) summary... except empty aggregates with no groups
    // still emit their single global row — assert the zeros, not absence
    val tri = graft.SparkEntry.queries("ext_triangle_count")(spark, dir).collect()
    assert(tri.length == 1 && tri.head.getLong(0) == 0L
      && tri.head.getLong(1) == 0L && tri.head.getLong(2) == 0L)
    spark.catalog.clearCache()
  }
}
