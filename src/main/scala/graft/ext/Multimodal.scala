package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, processed per-partition (the Scala analogue
  * of mapInPandas batch UDFs — one iterator per partition, vectorizable).
  *
  * The actual media decode is STUBBED — no image/audio libraries exist in
  * this container — with a deterministic fake keyed on the payload bytes,
  * so the Spark-side contract (schema, partitioning, batch iteration,
  * null-safety) is real and tested while the decoder body is swappable.
  * A production build replaces `StubDecoder` with the codec bridge; the
  * pipeline shape does not change.
  *
  * 100 TB posture: payloads never hit the driver; decode is a narrow
  * per-partition map (no shuffle); metadata-only queries prune the binary
  * column at the parquet scan.
  */
object Multimodal {

  /** Decoded-image feature row (what a real decoder would emit). */
  final case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Int,
      mean_luma: Double,
      phash: Long)

  /** Deterministic stand-in for the codec: dimensions and luma derived
    * from the payload hash, perceptual hash from a byte fold. Replace with
    * the real decode; signature and batch shape stay identical. */
  object StubDecoder {
    def decode(docId: Long, payload: Array[Byte]): ImageFeatures = {
      val h = java.util.Arrays.hashCode(payload)
      val w = 64 + math.abs(h % 960)
      val ht = 64 + math.abs((h / 7) % 960)
      var acc = 1125899906842597L // rolling byte fold = fake phash
      var luma = 0.0
      var i = 0
      while (i < payload.length) {
        acc = acc * 31 + (payload(i) & 0xff)
        luma += (payload(i) & 0xff)
        i += 1
      }
      ImageFeatures(docId, w, ht, payload.length,
        if (payload.length == 0) 0.0 else luma / payload.length / 255.0, acc)
    }
  }

  /** Per-partition batch decode — the mapInPandas shape: one iterator in,
    * one iterator out, no per-row task overhead, no shuffle. */
  def decodeImages(df: DataFrame): Dataset[ImageFeatures] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          StubDecoder.decode(id, if (bytes == null) Array.emptyByteArray else bytes)
        }
      }
  }

  /** Frame sampling contract for video-like payloads: split the payload
    * into fixed-size "frames", keep every `stride`-th — emits (doc_id,
    * frame_idx, frame_bytes). Real impl swaps the chunker for the codec's
    * keyframe iterator. */
  def sampleFrames(df: DataFrame, frameSize: Int = 1024, stride: Int = 4): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          b.grouped(frameSize).zipWithIndex
            .filter { case (_, idx) => idx % stride == 0 }
            .map { case (frame, idx) => (id, idx, frame) }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }
}
