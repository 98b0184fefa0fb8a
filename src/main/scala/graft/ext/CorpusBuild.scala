package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call corpus build — the public LLM pretraining-data recipe end
  * to end, each stage one of this library's own operators (every stage
  * is individually oracle- or spec-verified by its registry twin):
  *
  *   1. quality filter (C4-style bounds: token count, TTR) — narrow
  *   2. span-level boilerplate handling ([[Dedup.repeatedSpans]]):
  *      docs mostly boilerplate (coverage ≥ `spanCoverageDrop`) are
  *      DROPPED; the rest get their repeated spans CUT from the text
  *   3. exact dedup on the normalized cut text (min-id canonical) —
  *      one hash shuffle
  *   4. near-dup dedup, LSH-verified
  *      ([[Dedup.lshVerifiedCanonicalDocs]]: banded MinHash →
  *      exact-Jaccard verify → connected components)
  *   5. sequence packing ([[graft.operators.GlobalRank
  *      .withGlobalCumSumBefore]] — scale-safe two-pass prefix sum)
  *
  * Returns the packed corpus plus the per-stage yield report a
  * production build logs on every run. Call
  * [[Caches.releaseAll]] when done (stages 2/4/5 cache intermediates);
  * write shards with `graft.io.Sinks.trainingShards(packed, ...)`.
  *
  * Scale posture: no stage introduces a plan shape beyond its
  * registry twin's (audited in SCALE.md); the report costs one count
  * job per stage boundary (5 total), each over an already-computed
  * stage output.
  */
object CorpusBuild {

  final case class Config(
      minTokens: Int = 20,
      maxTokens: Int = 1000,
      minTtr: Double = 0.2,
      spanK: Int = 8,
      spanMinDf: Int = 2,
      spanCoverageDrop: Double = 0.5,
      nearDupThreshold: Double = 0.5,
      seqBudget: Long = 512L)

  /** Stage-by-stage surviving-document counts (the funnel). */
  final case class Report(
      nRaw: Long,
      nQuality: Long,
      nAfterSpanPolicy: Long,
      nExactCanonical: Long,
      nNearDupCanonical: Long)

  /** Runs the full recipe over `docs` (doc_id, text, ... passthrough
    * columns ignored). Output columns: doc_id, clean_text, n_tokens,
    * seq_id, seq_offset, spans_boundary. */
  def run(docs: DataFrame, cfg: Config = Config()): (DataFrame, Report) = {
    val toks = split(col("text"), "\\s+")
    val nRaw = docs.count()

    // 1. quality bounds — narrow per-row flags
    val quality = docs.select(col("doc_id"), col("text"))
      .filter(size(toks).between(cfg.minTokens, cfg.maxTokens)
        && size(array_distinct(toks)).cast("double") / size(toks) >= cfg.minTtr)
    val qualityC = Caches.track(quality.cache())
    val nQuality = qualityC.count()

    // 2. span policy: coverage ≥ threshold -> drop doc; else cut spans.
    // spans feeds BOTH the coverage policy and the token anti-join —
    // cache it or the whole gram/df/merge pipeline runs twice.
    val spans = Caches.track(
      Dedup.repeatedSpans(qualityC, cfg.spanK, cfg.spanMinDf).cache())
    val cov = spans.groupBy("doc_id").agg(sum("span_len").as("covered"))
    val tok = qualityC.select(col("doc_id"), posexplode(toks).as(Seq("pos", "t")))
    val keptDocs = qualityC
      .join(cov, Seq("doc_id"), "left")
      .withColumn("n_tok", size(toks))
      .filter(coalesce(col("covered"), lit(0L)).cast("double") / col("n_tok")
        < cfg.spanCoverageDrop)
      .select("doc_id")
    val keptTok = tok
      .join(keptDocs, Seq("doc_id"), "left_semi")
      .join(spans,
        tok("doc_id") === spans("doc_id")
          && col("pos").between(col("span_start"), col("span_end")),
        "left_anti")
    val cut = keptTok.groupBy("doc_id")
      .agg(expr("listagg(t, ' ') WITHIN GROUP (ORDER BY pos)").as("text"),
        count(lit(1)).cast("long").as("n_tokens"))
    val cutC = Caches.track(cut.cache())
    val nAfterSpan = cutC.count()

    // 3. exact dedup on normalized cut text — min-id canonical survives
    val wFp = Window.partitionBy("fp")
    val exact = cutC
      .withColumn("fp", md5(lower(trim(col("text"))).cast("binary")))
      .withColumn("keep", col("doc_id") === min("doc_id").over(wFp))
      .filter(col("keep")).drop("fp", "keep")
    val exactC = Caches.track(exact.cache())
    val nExact = exactC.count()

    // 4. near-dup dedup (LSH candidates -> exact verify -> CC); only
    //    canonical docs survive
    val canon = Dedup.lshVerifiedCanonicalDocs(exactC, cfg.nearDupThreshold)
      .filter(col("is_canonical")).select("doc_id")
    val deduped = Caches.track(exactC.join(canon, Seq("doc_id"), "left_semi").cache())
    val nNearDup = deduped.count()

    // 5. sequence packing over the survivors
    val packed = graft.operators.GlobalRank
      .withGlobalCumSumBefore(
        deduped.select(col("doc_id"), col("text").as("clean_text"), col("n_tokens")),
        Seq(col("doc_id")), col("n_tokens"), "cum0")
      .select(col("doc_id"), col("clean_text"), col("n_tokens"),
        expr(s"cum0 div ${cfg.seqBudget}").cast("long").as("seq_id"),
        pmod(col("cum0"), lit(cfg.seqBudget)).cast("long").as("seq_offset"),
        (pmod(col("cum0"), lit(cfg.seqBudget)) + col("n_tokens") > cfg.seqBudget)
          .as("spans_boundary"))

    (packed, Report(nRaw, nQuality, nAfterSpan, nExact, nNearDup))
  }
}
