package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame

/** Byte-stability oracle for the structurally no-oracle decode kernels
  * (r18, VERDICT r17 item 5).
  *
  * The six multimodal rows (`mm_decode_features`, `mm_frame_sample`,
  * `mm_audio_features`, `mm_video_meta`, `mm_phash_neardups`,
  * `mm_frame_decode`) decode synthesized containers, so DuckDB can
  * never be their oracle — but their raw outputs (aHash bits,
  * per-frame luma, WAV RMS, container params) are fully deterministic
  * given the fixture. A JDK/ImageIO behavior change would previously
  * shift these rows SILENTLY (the rollup twins hash only the
  * downstream aggregation). This module hashes each kernel's full
  * result against a hash COMMITTED in the repo
  * (`src/main/resources/graft/golden_mm.txt`), checked both by
  * `GoldenHashSpec` (sf0.001, every `sbt test`) and by `graft.Verify`
  * (sf0.01, every driver run → `golden_check.json`), so a decode
  * drift fails loudly in both gates.
  *
  * Canonical form: every cell rendered to a stable string (binary →
  * hex, arrays/seqs → bracketed join, null → literal `\N`), cells
  * tab-joined, rows SORTED (output order is not part of the contract —
  * parquet round-trips reorder), then one md5 over the newline-joined
  * block. Doubles use `toString` — the kernels' per-row arithmetic is
  * reduction-order-free, so the bits are stable across partitionings.
  */
object GoldenHash {

  /** The kernels under golden-hash control, in registry order. */
  val kernels: Seq[String] = Seq(
    "mm_decode_features", "mm_frame_sample", "mm_audio_features",
    "mm_video_meta", "mm_phash_neardups", "mm_frame_decode")

  private def renderCell(v: Any): String = v match {
    case null => "\\N"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case s: Seq[_] => s.map(renderCell).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${renderCell(k)}=${renderCell(x)}" }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(renderCell).mkString("(", ",", ")")
    case x => x.toString
  }

  /** Order-insensitive md5 of the full result (see canonical form). */
  def canonicalHash(df: DataFrame): String = {
    val lines = df.collect()
      .map(r => r.toSeq.map(renderCell).mkString("\t"))
      .sorted
    val md = MessageDigest.getInstance("MD5")
    md.update(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    md.digest().map(b => f"$b%02x").mkString
  }

  /** sf tag from a fixture dir ("/root/testdata/sf0.01" -> "sf0.01"). */
  def sfTag(sfDir: String): String =
    sfDir.stripSuffix("/").split('/').last

  /** Committed hashes: lines of `<sfTag> <query> <md5>` (comments #). */
  lazy val committed: Map[(String, String), String] = {
    val in = getClass.getResourceAsStream("/graft/golden_mm.txt")
    if (in == null) Map.empty
    else try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val p = l.split("\\s+")
          ((p(0), p(1)), p(2))
        }.toMap
    } finally in.close()
  }

  final case class Check(name: String, computed: String,
      expected: Option[String]) {
    def ok: Boolean = expected.contains(computed)
  }

  /** Hash every kernel at `sfDir` and compare to the committed file.
    * A kernel with no committed entry reports expected=None (treated
    * as a failure by both gates — the file must cover all six). */
  def check(spark: org.apache.spark.sql.SparkSession, sfDir: String)
      : Seq[Check] = {
    val tag = sfTag(sfDir)
    kernels.map { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      Check(name, canonicalHash(df), committed.get((tag, name)))
    }
  }
}
