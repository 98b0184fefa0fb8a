package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, processed per-partition (the Scala analogue
  * of mapInPandas batch UDFs — one iterator per partition, vectorizable).
  *
  * IMAGE decode is REAL (r7): `ImageIODecoder` reads PNG/JPEG/GIF/BMP
  * through the JDK's own `javax.imageio` — no external codec library
  * needed — emitting true dimensions, mean luma, and the standard 8×8
  * average-hash perceptual hash (box-sampled grayscale, bit per cell
  * vs the mean — the aHash near-dup key an image dedup pipeline
  * buckets on). Payloads ImageIO cannot parse (synthetic fixtures,
  * audio/video containers) fall back to the deterministic
  * `StubDecoder`, keeping the batch contract total; audio/video
  * decode remains honestly stubbed (no codecs in the JDK).
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

  /** Real image decode via the JDK's built-in codecs (PNG/JPEG/GIF/BMP).
    * Returns None for payloads ImageIO cannot parse — callers fall back
    * to [[StubDecoder]] so the batch map stays total. */
  object ImageIODecoder {
    def decode(docId: Long, payload: Array[Byte]): Option[ImageFeatures] = {
      if (payload == null || payload.length == 0) return None
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          // 8x8 box-sampled grayscale: cell luma = mean of its pixel
          // block (ITU-R BT.601 weights), then aHash = bit per cell
          // set when the cell is at or above the global mean
          val cells = new Array[Double](64)
          var cy = 0
          while (cy < 8) {
            val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
            var cx = 0
            while (cx < 8) {
              val x0 = cx * w / 8; val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
              var s = 0.0; var n = 0
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  s += 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  n += 1; x += 1
                }
                y += 1
              }
              cells(cy * 8 + cx) = s / n
              cx += 1
            }
            cy += 1
          }
          val mean = cells.sum / 64.0
          var hash = 0L
          var i = 0
          while (i < 64) {
            if (cells(i) >= mean) hash |= (1L << i)
            i += 1
          }
          Some(ImageFeatures(docId, w, h, payload.length, mean / 255.0, hash))
        }
      } catch { case _: Exception => None }
    }
  }

  /** Per-partition batch decode — the mapInPandas shape: one iterator in,
    * one iterator out, no per-row task overhead, no shuffle. Real
    * ImageIO decode first; deterministic stub for undecodable bytes. */
  def decodeImages(df: DataFrame): Dataset[ImageFeatures] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          ImageIODecoder.decode(id, b).getOrElse(StubDecoder.decode(id, b))
        }
      }
  }

  /** Decoded-audio feature row (what the WAV path emits). */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      duration_sec: Double,
      rms: Double,
      zero_crossing_rate: Double)

  /** Real audio decode for WAV/PCM via the JDK's `javax.sound.sampled`
    * (headless-safe — it parses containers, no audio device involved).
    * Emits true sample rate/channels/duration plus the two classic
    * cheap audio-quality signals: RMS energy (silence / clipping
    * detection) and zero-crossing rate (noisiness proxy), both over
    * channel-averaged 16-bit samples. None for payloads that aren't a
    * parseable audio container (callers fall back to metadata-only). */
  object AudioDecoder {
    def decode(docId: Long, payload: Array[Byte]): Option[AudioFeatures] = {
      if (payload == null || payload.length == 0) return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val channels = fmt.getChannels
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          if (bytesPerSample != 2) return None // 16-bit PCM only
          val frameBytes = bytesPerSample * channels
          val big = fmt.isBigEndian
          val buf = in.readAllBytes()
          val nFrames = buf.length / frameBytes
          var i = 0
          var sumSq = 0.0
          var crossings = 0L
          var prevSign = 0
          while (i < nFrames) {
            var c = 0
            var acc = 0.0
            while (c < channels) {
              val off = i * frameBytes + c * bytesPerSample
              val s =
                if (big) ((buf(off) << 8) | (buf(off + 1) & 0xff)).toShort
                else ((buf(off + 1) << 8) | (buf(off) & 0xff)).toShort
              acc += s / 32768.0
              c += 1
            }
            val v = acc / channels
            sumSq += v * v
            val sign = if (v > 0) 1 else if (v < 0) -1 else prevSign
            if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
            if (sign != 0) prevSign = sign
            i += 1
          }
          val rate = fmt.getSampleRate.toInt
          val dur = if (rate == 0) 0.0 else nFrames.toDouble / rate
          Some(AudioFeatures(docId, rate, channels, nFrames, dur,
            if (nFrames == 0) 0.0 else math.sqrt(sumSq / nFrames),
            if (nFrames <= 1) 0.0 else crossings.toDouble / (nFrames - 1)))
        } finally in.close()
      } catch { case _: Exception => None }
    }
  }

  /** Per-partition batch audio decode, same mapInPandas shape as
    * [[decodeImages]]. Non-audio payloads yield a metadata-only row
    * (zeroed signal fields) instead of failing the batch. */
  def decodeAudio(df: DataFrame): Dataset[AudioFeatures] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          AudioDecoder.decode(id, b)
            .getOrElse(AudioFeatures(id, 0, 0, 0L, 0.0, 0.0, 0.0))
        }
      }
  }

  /** Image near-dup pairs by perceptual hash — the image twin of
    * simhash text dedup, over [[decodeImages]] output (doc_id, phash).
    * 8 bands of 8 bits: by pigeonhole, any pair within hamming
    * distance ≤ 7 shares at least one exact band, so banding loses NO
    * pair under the default threshold; candidates from the band-key
    * equi-join (Σ bucket², never all-pairs) are verified with the
    * exact `bit_count(a XOR b)`. Output: (doc_a, doc_b, hamming),
    * doc_a < doc_b. */
  def phashNearDups(feats: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming < 8,
      "8-band pigeonhole only guarantees recall for hamming <= 7; " +
        "re-band (more, narrower bands) for a looser threshold")
    val banded = feats.select(col("doc_id"), col("phash"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), b * 8).bitwiseAND(0xffL).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("phash"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("doc_id").as("doc_a"), col("phash").as("pa"),
      col("band"), col("key"))
    val r = banded.select(col("doc_id").as("doc_b"), col("phash").as("pb"),
      col("band").as("band_r"), col("key").as("key_r"))
    l.join(r, col("band") === col("band_r") && col("key") === col("key_r")
        && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
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
