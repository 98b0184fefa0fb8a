package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The multimodal plumbing contract: schema, determinism, partitioning
  * neutrality, null payload safety. The decode body is a stub (no media
  * libs in-container); these tests pin the parts a real codec would slot
  * into.
  */
class MultimodalSpec extends SparkSpec {

  private def payloads() = Tables.documents(spark, sf())
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("decode is deterministic and schema-stable") {
    val a = Multimodal.decodeImages(payloads()).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeImages(payloads()).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => f.width >= 64 && f.height >= 64 && f.n_bytes > 0))
    assert(a.forall(f => f.mean_luma >= 0.0 && f.mean_luma <= 1.0))
  }

  test("decode output is invariant to input partitioning (no shuffle dependence)") {
    val one = Multimodal.decodeImages(payloads().repartition(1)).collect().sortBy(_.doc_id).toSeq
    val many = Multimodal.decodeImages(payloads().repartition(7)).collect().sortBy(_.doc_id).toSeq
    assert(one == many)
  }

  test("null payloads decode to empty features, not exceptions") {
    import spark.implicits._
    val df = Seq((1L, "x".getBytes), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImages(df).collect().sortBy(_.doc_id)
    assert(out.length == 2)
    assert(out(1).n_bytes == 0 && out(1).mean_luma == 0.0)
  }

  test("frame sampling: stride keeps every Nth frame, sizes bounded") {
    val frames = Multimodal.sampleFrames(payloads(), frameSize = 64, stride = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getInt(1) % 2 == 0, "only even frame indexes survive stride=2")
      assert(r.getAs[Array[Byte]](2).length <= 64)
    }
  }
}
