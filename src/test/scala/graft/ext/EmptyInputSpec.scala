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
    assert(Dedup.minhashCandidates(emptyDocs).count() == 0)
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
}
