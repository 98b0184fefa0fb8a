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

  test("real PNG/JPEG payloads decode through ImageIO: true dims, luma, aHash near-dups") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // draw: a 100x60 half-black/half-white PNG, a 1-pixel-perturbed
    // near-dup, and a small inverted image (a far image in aHash space)
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val half: (Int, Int) => Int = (x, _) => if (x < 50) 0x000000 else 0xffffff
    val base = png(100, 60, half)
    val nearDup = png(100, 60, (x, y) =>
      if (x == 0 && y == 0) 0x010101 else half(x, y))
    val inverted = png(100, 60, (x, _) => if (x < 50) 0xffffff else 0x000000)

    import spark.implicits._
    val df = Seq((1L, base), (2L, nearDup), (3L, inverted))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImages(df).collect().sortBy(_.doc_id)
    assert(out.map(f => (f.width, f.height)).toSeq == Seq((100, 60), (100, 60), (100, 60)),
      "ImageIO decode must report TRUE dimensions (stub fabricates >=64 from a hash)")
    // half black / half white -> mean luma ~0.5
    assert(out.forall(f => math.abs(f.mean_luma - 0.5) < 0.02), out.mkString(";"))
    // aHash: identical for the 1-px perturbation, far for the inversion
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(0).phash, out(1).phash) <= 2,
      s"near-dup aHash distance ${ham(out(0).phash, out(1).phash)}")
    assert(ham(out(0).phash, out(2).phash) >= 32,
      s"inverted aHash distance ${ham(out(0).phash, out(2).phash)}")
    // undecodable bytes still flow through the (stub) fallback
    val garbage = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.decodeImages(garbage).collect().head.n_bytes == 3)
  }

  test("phash near-dups: banded bucket join finds the perturbed PNG pair, not the inverted one") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val half: (Int, Int) => Int = (x, _) => if (x < 50) 0x000000 else 0xffffff
    import spark.implicits._
    val df = Seq(
      (1L, png(100, 60, half)),
      (2L, png(100, 60, (x, y) => if (x == 0 && y == 0) 0x010101 else half(x, y))),
      (3L, png(100, 60, (x, _) => if (x < 50) 0xffffff else 0x000000)))
      .toDF("doc_id", "payload")
    val feats = Multimodal.decodeImages(df).toDF().select("doc_id", "phash")
    val pairs = Multimodal.phashNearDups(feats)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the perturbed pair, got $pairs")
    // threshold wider than the pigeonhole guarantee must refuse loudly
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(feats, maxHamming = 20)
    }
  }

  test("mm_phash_neardups registry row decodes REAL PNGs and finds every planted pair") {
    import org.apache.spark.sql.functions._
    // VERDICT r7 item 2: the row used to feed text bytes, so only the
    // StubDecoder path ever ran in the gated bench/correctness lane.
    // Now it synthesizes real PNGs; if ImageIO stopped parsing them,
    // the width==16 gate inside the query would empty the row — so a
    // non-empty, exactly-planted result proves the real decoder ran.
    val rows = graft.SparkEntry.queries("mm_phash_neardups")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = graft.Tables.documents(spark, sf())
      .filter(col("doc_id") % 25 === 0).select("doc_id")
      .collect().map(_.getLong(0))
      .map(id => (id, id + 10000000L)).toSet
    assert(expected.nonEmpty)
    val found = rows.map(r => (r._1, r._2)).toSet
    assert(found == expected,
      s"planted-pair mismatch: missing=${expected -- found} extra=${found -- expected}")
    // the ±16-luma nudge is far below the 0/255 cell contrast: the
    // aHash must be unchanged, i.e. every planted pair at hamming 0
    assert(rows.forall(_._3 == 0), s"nonzero hamming: ${rows.filter(_._3 != 0).take(3)}")
  }

  test("real WAV payloads decode through javax.sound: rate, duration, RMS, ZCR") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // synthesize 0.5 s of a 440 Hz sine at amplitude 0.5, 16-bit mono PCM
    val rate = 8000
    val n = rate / 2
    val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val silent = {
      val b = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(
          new java.io.ByteArrayInputStream(new Array[Byte](n * 2)), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, b)
      b.toByteArray
    }
    import spark.implicits._
    val df = Seq((1L, bos.toByteArray), (2L, silent), (3L, Array[Byte](9, 9)))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeAudio(df).collect().sortBy(_.doc_id)
    val sine = out(0)
    assert(sine.sample_rate == rate && sine.channels == 1 && sine.n_samples == n)
    assert(math.abs(sine.duration_sec - 0.5) < 1e-9)
    // sine RMS = amp/sqrt(2); ZCR = 2 crossings per cycle = 2*440/8000
    assert(math.abs(sine.rms - amp / math.sqrt(2)) < 0.01, s"rms ${sine.rms}")
    assert(math.abs(sine.zero_crossing_rate - 2.0 * 440 / rate) < 0.005,
      s"zcr ${sine.zero_crossing_rate}")
    assert(out(1).rms == 0.0 && out(1).zero_crossing_rate == 0.0)
    assert(out(2).sample_rate == 0, "garbage must fall through to metadata-only")
  }

  test("video container parse: MP4 box walk and AVI chunk walk round-trip the built params") {
    import spark.implicits._
    val mp4 = Multimodal.syntheticMp4(
      timescale = 1000, duration = 5000L, width = 320, height = 240, codec = "avc1")
    val avi = Multimodal.syntheticAvi(
      microSecPerFrame = 40000, frames = 250, width = 640, height = 480, codec = "XVID")
    val df = Seq((1L, mp4), (2L, avi), (3L, "not a video at all..".getBytes))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeVideoMeta(df).collect()
      .map(v => v.doc_id -> v).toMap
    assert(rows(1L).container == "mp4" && rows(1L).duration_sec == 5.0 &&
      rows(1L).width == 320 && rows(1L).height == 240 && rows(1L).codec == "avc1",
      s"mp4 parse: ${rows(1L)}")
    assert(rows(2L).container == "avi" && rows(2L).duration_sec == 10.0 &&
      rows(2L).width == 640 && rows(2L).height == 480 && rows(2L).codec == "XVID",
      s"avi parse: ${rows(2L)}")
    assert(rows(3L).container == "unknown" && rows(3L).codec == "",
      s"junk must fall to the unknown row: ${rows(3L)}")
  }

  test("video container parse: v1 mvhd (64-bit duration) and truncated boxes are safe") {
    // hand-build a moov with a VERSION-1 mvhd (the builder emits v0):
    // fullbox v1: flags, c8, m8, ts4, d8
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ t.getBytes("ISO-8859-1") ++ body
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
        be32(90000) ++ be32(0) ++ be32(90000L * 7))
    val payload = box("ftyp", "isom".getBytes ++ be32(0)) ++ box("moov", mvhdV1)
    val v = Multimodal.VideoContainerParser.parse(9L, payload)
    assert(v.exists(m => m.container == "mp4" && m.duration_sec == 7.0 &&
      m.width == 0 && m.codec == ""), s"v1 mvhd: $v")
    // truncation at every prefix length must return None/unknown, never throw
    val full = Multimodal.syntheticMp4(1000, 5000L, 320, 240)
    (0 until full.length by 7).foreach { n =>
      Multimodal.VideoContainerParser.parse(1L, full.take(n)) // must not throw
    }
    val fullAvi = Multimodal.syntheticAvi(40000, 250, 640, 480)
    (0 until fullAvi.length by 7).foreach { n =>
      Multimodal.VideoContainerParser.parse(1L, fullAvi.take(n))
    }
  }

  test("video container parse: odd-sized RIFF chunks are word-aligned, not misparsed") {
    // RIFF chunks pad to even offsets; a walker that forgets the pad
    // byte desynchronizes and misses every later chunk. Build an AVI
    // with an odd-sized junk chunk BEFORE the hdrl list.
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val junk = "JUNK".getBytes("ISO-8859-1") ++ le32(5) ++
      Array[Byte](1, 2, 3, 4, 5, 0) // 5 data bytes + 1 pad
    val clean = Multimodal.syntheticAvi(40000, 250, 640, 480, codec = "MJPG")
    // splice: RIFF hdr (12 bytes) + junk + rest, fixing the RIFF size
    val body = junk ++ clean.drop(12)
    val patched = "RIFF".getBytes("ISO-8859-1") ++ le32(4L + body.length) ++
      "AVI ".getBytes("ISO-8859-1") ++ body
    val v = Multimodal.VideoContainerParser.parse(5L, patched)
    assert(v.exists(m => m.container == "avi" && m.width == 640 &&
      m.height == 480 && m.codec == "MJPG" && m.duration_sec == 10.0),
      s"odd-chunk walk broke: $v")
  }

  test("mm_video_meta registry row: both container families parsed, params keyed on doc_id") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("mm_video_meta")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val expectDur = if (id % 2 == 0) (id % 120 + 1).toDouble
                      else 0.04 * 25 * (id % 120 + 1)
      assert(r.getString(1) == (if (id % 2 == 0) "mp4" else "avi"), s"row $r")
      assert(math.abs(r.getDouble(2) - expectDur) < 1e-3, s"duration: $r vs $expectDur")
      assert(r.getInt(3) == 320 + 16 * (id % 8).toInt, s"width: $r")
      assert(r.getString(5).nonEmpty, s"codec: $r")
    }
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

  test("MJPEG frame decode: movi walk + ImageIO round-trip, planted dup at hamming 0") {
    import spark.implicits._
    def jpeg(seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val r = new java.util.Random(seed)
      for (by <- 0 until 8; bx <- 0 until 8) {
        val v = if (r.nextBoolean()) 0xffffff else 0x000000
        for (dy <- 0 until 4; dx <- 0 until 4)
          img.setRGB(bx * 4 + dx, by * 4 + dy, v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = (0 until 6).map(f => jpeg(100 + f))
    val planted = frames.updated(3, frames(0)) // frame 3 == frame 0
    val avi = Multimodal.syntheticMjpegAvi(planted, 40000, 32, 32)

    // container still parses as AVI/MJPG through the metadata walk
    val meta = Multimodal.decodeVideoMeta(
      Seq((7L, avi)).toDF("doc_id", "payload")).collect().head
    assert(meta.container == "avi" && meta.codec == "MJPG", meta.toString)

    // every frame decodes with true dims; planted dup collapses to an
    // IDENTICAL aHash (hamming 0); distinct frames get distinct hashes
    val out = Multimodal.decodeMjpegFrames(
      Seq((7L, avi)).toDF("doc_id", "payload")).collect().sortBy(_.frame_idx)
    assert(out.length == 6, s"expected 6 frames, got ${out.length}")
    assert(out.forall(f => f.width == 32 && f.height == 32))
    assert(out(3).phash == out(0).phash,
      "planted duplicate frame must hash identically (hamming 0)")
    assert(out.map(_.phash).distinct.length == 5,
      s"5 distinct patterns expected: ${out.map(_.phash).mkString(",")}")
    // decoded bytes are the exact staged JPEGs (dup = byte-identical)
    assert(out(3).n_bytes == out(0).n_bytes)
  }

  test("MJPEG frame decode: maxFrames sampling keeps first and last; truncation is safe") {
    import spark.implicits._
    def jpeg(seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val r = new java.util.Random(seed)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, if (r.nextBoolean()) 0xffffff else 0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = Multimodal.syntheticMjpegAvi(
      (0 until 10).map(f => jpeg(f)), 40000, 16, 16)
    val sampled = Multimodal.decodeMjpegFrames(
      Seq((1L, avi)).toDF("doc_id", "payload"), maxFrames = 3)
      .collect().map(_.frame_idx).sorted
    assert(sampled.head == 0 && sampled.last == 9,
      s"first/last must survive sampling: ${sampled.mkString(",")}")
    assert(sampled.length == 3, sampled.mkString(","))
    // truncation fuzz: every cut length decodes to a (possibly empty)
    // prefix of frames, never a throw
    Seq(0, 4, 11, 12, 40, avi.length / 2, avi.length - 3).foreach { cut =>
      val t = java.util.Arrays.copyOf(avi, cut)
      val got = Multimodal.MjpegDecoder.decode(1L, t)
      assert(got.map(_.frame_idx) == got.map(_.frame_idx).sorted)
    }
    // non-AVI bytes: empty, no throw
    assert(Multimodal.MjpegDecoder.decode(1L, "not a container".getBytes).isEmpty)
    assert(Multimodal.MjpegDecoder.decode(1L, null).isEmpty)
  }
}
