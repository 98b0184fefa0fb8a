package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** spark.ml extension operators as registry entries. No DuckDB oracle —
  * LSH internals are implementation-defined — so these are rows-only
  * checks here; recall/quality bounds are asserted in ExtSpec.
  */
object ExtQ {

  val all: Seq[QueryDef] = Seq(
    // r10: LAZY oracle — the one LSH row whose hash state lives inside
    // spark.ml (MinHashLSHModel's seed-42 coefficient pairs) gets the
    // inlined-model treatment: Verify reflects the (a,b) pairs and the
    // HashingTF shingle→index vocabulary (murmur3 mod 2^18 — the non-SQL
    // step) and DuckDB reproduces EVERYTHING downstream bit-for-bit:
    // per-doc distinct 3-gram shingling, the df<=20 prune, the binary
    // index sets, the minhash law min((1+idx)*a+b mod 2038074743) per
    // table, the any-table OR-collision candidate join, the exact
    // jaccard distance 1 - i/(na+nb-i), the STRICT < 0.5 threshold.
    QueryDef.lazyOracle("ext_minhash_ml_neardups") { (s, d) =>
      minhashMlOracleSql(s, d)
    } { (s, d) =>
      Similarity.minHashNearDups(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b")
    },

    // r10: LAZY oracle — the BRP-LSH planes are a pure function of
    // (dim, numTables, m) under seed 42 (Similarity.lshPlanes), so
    // Verify inlines them and DuckDB reproduces the bucket ids
    // (floor(v̂·w / bucketLength); with m=1 the JVM's folded long key is
    // an affine map of that floor — identical collision structure), the
    // candidate join, the exact cosine verify and the (cos DESC, cid)
    // top-k bit-for-bit. Recall-vs-brute-force stays asserted in ExtSpec.
    QueryDef.lazyOracle("ext_ann_topk") { (s, d) =>
      annOracleSql(s, d, numTables = 4, bucketLength = 0.5,
        qFilter = "AND q.vec_id < 5")
    } { (s, d) =>
      Similarity.annTopK(Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
    },

    // Query-cardinality scale demonstration (VERDICT r3/r4): the query
    // set is the ENTIRE corpus, passed as a DataFrame and semi-joined —
    // plan size is independent of |Q| (the r4 isin(ids) literal form
    // compiled a predicate per id), and it is still ONE bucket join +
    // ONE bounded-heap aggregate, not |Q| jobs. This is the all-pairs
    // ANN shape a near-dup sweep over an embedding corpus runs.
    // r10: same lazy oracle as ext_ann_topk (whole-corpus query set,
    // auto-derived bucket width inlined as an exact literal).
    QueryDef.lazyOracle("ext_ann_topk_batch") { (s, d) =>
      val n = Tables.embeddings(s, d).count()
      annOracleSql(s, d, numTables = 8,
        bucketLength = Similarity.autoBucketLength(n), qFilter = "")
    } { (s, d) =>
      // Narrow buckets (vs the 5-query default 0.5): at batch query
      // cardinality the candidate volume is queries x collision-rate x
      // corpus, so bucket width is the knob a real corpus-scale
      // deployment turns. Since r7 it DERIVES from the corpus count
      // (autoBucketLength: 0.15 at the 2k fixture, ∝ 1/sqrt(n), floored
      // at 0.1 since r17 — the recall-first revision; see the
      // Similarity.autoBucketLength scaladoc for the 2M-vector grid)
      // while 8 OR-tables hold recall.
      val emb = Tables.embeddings(s, d)
      Similarity.annTopK(emb, queries = emb.select("vec_id"),
        k = 10, bucketLength = Similarity.autoBucketLength(emb.count()),
        numTables = 8, maxDistance = 2.0)
    },

    // The auto-routing ANN front door as its own oracle row (r18,
    // VERDICT r17 item 6): one call that picks BRP below
    // Similarity.brpRouteMaxN corpus vectors and IVF at/above (the
    // measured two-sided crossover — at 2k IVF recall collapses to
    // 0.656, at 20k+ IVF wins both wall and recall; SCALE.md r18). At
    // every fixture scale the route is BRP with the batch knobs, so
    // the same dual-engine LSH oracle reproduces it bit-for-bit —
    // emitting the router's unified contract, the RAW codegen'd
    // cosine (annTopKScores; a dist→cos round-trip would round twice).
    // The decision function and the forced-IVF arm are pinned in
    // ExtSpec; the crossover table lives in SCALE.md.
    QueryDef.lazyOracle("ext_ann_topk_routed") { (s, d) =>
      val n = Tables.embeddings(s, d).count()
      annOracleSql(s, d, numTables = 8,
        bucketLength = Similarity.autoBucketLength(n), qFilter = "",
        emitCos = true)
    } { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.annTopKRouted(emb, emb.select("vec_id"), k = 10)
    },

    // Incremental dedup prefilter: docs with even ids form the "existing
    // corpus", odd ids are the incoming batch; only genuinely-new odd
    // docs survive. No oracle (bloom bit layout is implementation-
    // defined → FP set varies); the no-false-negative guarantee and FP
    // bound are asserted in DedupSpec.
    QueryDef.noOracle("doc_bloom_prefilter") { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Dedup.bloomNewDocs(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1))
        .select("doc_id").orderBy("doc_id")
    },

    // The Bloom prefilter's deterministic complement (VERDICT r8 item
    // 7): the EXACT incremental-dedup decision the sketch approximates —
    // candidates (odd ids) whose text fingerprint appears nowhere in the
    // corpus (even ids). Anti-join on md5, not raw text: the shuffle
    // carries 16-byte keys instead of documents (the 100 TB shape), and
    // md5 is bit-identical across engines so the oracle hash-verifies
    // the whole decision. The same query also REQUIREs the Bloom row's
    // no-false-negative contract against this exact answer (bloom-kept
    // must be a subset of exactly-new; the sketch may only err by
    // dropping genuinely-new docs), so the sketch operator is now
    // oracle-anchored, not test-only.
    QueryDef(
      "doc_bloom_exact_twin",
      """SELECT d.doc_id FROM documents d
        |WHERE d.doc_id % 2 = 1
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents e
        |    WHERE e.doc_id % 2 = 0 AND md5(e.text) = md5(d.text))
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val fp = md5(col("text").cast("binary")).as("fp")
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val cand = docs.filter(col("doc_id") % 2 === 1)
      val exactNew = cand.select(col("doc_id"), fp)
        .join(corpus.select(fp), Seq("fp"), "left_anti")
        .select("doc_id")
      val falseNegPasses = graft.ext.Dedup.bloomNewDocs(corpus, cand)
        .select("doc_id")
        .join(exactNew, Seq("doc_id"), "left_anti")
        .count()
      require(falseNegPasses == 0,
        s"bloomNewDocs passed $falseNegPasses duplicate docs — " +
          "violates the Bloom no-false-negative guarantee")
      exactNew.orderBy("doc_id")
    },

    // Stratified corpus subsampling — the language-rebalancing op every
    // training-data pipeline runs (here: keep 50% of 'en', 100% of the
    // rest). HASH-based, not RNG-based (VERDICT r7 task 5): the keep
    // decision is md5(doc_id) % 100 < pct — deterministic across
    // engines, sessions, AND retries (a seeded RNG stream is stable
    // only within one engine), re-runnable incrementally (a doc's fate
    // never changes as the corpus grows), and exactly
    // oracle-expressible. Narrow filter over the scan — no shuffle, no
    // driver-side distinct-langs collect (the old sampleBy form needed
    // one to build its fraction map).
    QueryDef(
      "doc_sample_stratified",
      """SELECT doc_id, lang FROM documents
        |WHERE lang <> 'en'
        |   OR CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 50""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(col("lang") =!= "en"
          || pmod(expr(
               "cast(conv(substring(md5(cast(cast(doc_id AS string) AS binary)), 1, 15), 16, 10) AS bigint)"),
             lit(100L)) < 50)
        .select("doc_id", "lang").orderBy("doc_id")
    },

    // Per-doc TF-IDF vector stats over EXACT terms (VERDICT r5 item 2:
    // converted from no_oracle to hash-matched). tf = in-doc token count,
    // smooth idf quantized to a DECIMAL(9,6) grid so the L2 sum is exact
    // decimal in both engines; sqrt is IEEE-exact. The hashed
    // Similarity.tfidf path stays the bounded-state scale variant
    // (exercised by ext_minhash_ml_neardups + ExtSpec).
    // BM25 ranked retrieval (r9): the standard probabilistic relevance
    // scorer over a fixed query term set — decontamination scoring /
    // query-targeted corpus audits. Same cross-engine float discipline
    // as ext_tfidf_stats: ln quantized to the DECIMAL(9,6) grid, each
    // per-term contribution rounded to DECIMAL(18,6), exact decimal
    // sum; every unquantized double op (+,-,*,/ on integer-derived
    // values) is IEEE-correctly-rounded identically in both engines.
    QueryDef(
      "ext_bm25_topk",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |stats AS (
        |  SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM dl),
        |tf AS (
        |  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE t IN ('spark', 'vector', 'query') GROUP BY doc_id, t),
        |dfreq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
        |c AS (
        |  SELECT tf.doc_id,
        |         CAST(FLOOR(
        |           (CAST(CAST(FLOOR(ln((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5) / 1e6
        |                  AS DECIMAL(9,6)) AS DOUBLE)
        |             * (tf * (1.2 + 1.0))) /
        |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |           * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6)) AS c
        |  FROM tf JOIN dfreq USING (t) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id, CAST(CAST(ROUND(SUM(c), 6) AS DECIMAL(20,6)) AS DOUBLE) AS bm25
        |FROM c GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id
        |LIMIT 50""".stripMargin) { (s, d) =>
      Similarity.bm25TopK(Tables.documents(s, d),
        terms = Seq("spark", "vector", "query"), k = 50)
    },

    // Hybrid retrieval by reciprocal-rank fusion (r11) — the standard
    // way production search/decontamination stacks combine a lexical
    // ranker with a vector ranker (Cormack et al. 2009 RRF; the
    // fusion every hybrid-search engine ships): for one query term
    // set, fuse the BM25 ranking with the tf-idf-cosine ranking of the
    // SAME terms (the exact-term stand-in for a dense retriever — the
    // embedding-side rankers ext_ivf_topk/ext_ann_topk plug into the
    // identical fusion shape), score = Σ 1/(60 + rank). Determinism:
    // both input rankings are the established exact-decimal scorers
    // with (score DESC, doc_id) ties, ranks are ints, and the fused
    // score is two IEEE divisions and one add evaluated identically in
    // both engines. Scale: both branches are top-100 LIMITed before
    // ranking, so the global rank windows run over ≤100 rows by
    // construction (bounded, not data-sized) and the fusion join is
    // ≤200 rows.
    QueryDef(
      "ext_hybrid_rrf",
      s"""WITH ${Similarity.tfidfExactTermsSql},
        |l2 AS (
        |  SELECT doc_id,
        |         sqrt(CAST(CAST(ROUND(SUM(w * w), 6) AS DECIMAL(20,6)) AS DOUBLE)) AS l2
        |  FROM w GROUP BY doc_id),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |stats AS (
        |  SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM dl),
        |tfq AS (
        |  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE t IN ('spark', 'vector', 'query') GROUP BY doc_id, t),
        |dfq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY t),
        |c AS (
        |  SELECT tfq.doc_id,
        |         CAST(FLOOR(
        |           (CAST(CAST(FLOOR(ln((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5) / 1e6
        |                  AS DECIMAL(9,6)) AS DOUBLE)
        |             * (tf * (1.2 + 1.0))) /
        |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |           * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6)) AS c
        |  FROM tfq JOIN dfq USING (t) JOIN dl USING (doc_id) CROSS JOIN stats),
        |bm AS (
        |  SELECT doc_id, CAST(CAST(ROUND(SUM(c), 6) AS DECIMAL(20,6)) AS DOUBLE) AS bm25
        |  FROM c GROUP BY doc_id
        |  ORDER BY bm25 DESC, doc_id LIMIT 100),
        |lex AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS r_lex
        |  FROM bm),
        |qd AS (
        |  SELECT doc_id, CAST(CAST(ROUND(SUM(w), 6) AS DECIMAL(20,6)) AS DOUBLE) AS num
        |  FROM w WHERE t IN ('spark', 'vector', 'query') GROUP BY doc_id),
        |cosv AS (
        |  SELECT qd.doc_id, num / l2.l2 AS cos
        |  FROM qd JOIN l2 ON l2.doc_id = qd.doc_id WHERE l2.l2 > 0),
        |den0 AS (SELECT doc_id, cos FROM cosv ORDER BY cos DESC, doc_id LIMIT 100),
        |den AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INT) AS r_dense
        |  FROM den0)
        |SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
        |       COALESCE(1.0 / (60 + lex.r_lex), 0) +
        |         COALESCE(1.0 / (60 + den.r_dense), 0) AS rrf,
        |       lex.r_lex, den.r_dense
        |FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 50""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val terms = Seq("spark", "vector", "query")
      val wAll = Similarity.tfidfExactTerms(docs)
      val l2 = Similarity.tfidfExactL2(wAll)
      // both rank windows run AFTER a LIMIT 100 — bounded input by
      // construction, so the single-partition window is safe at scale
      val lex = Similarity.bm25TopK(docs, terms, k = 100)
        .withColumn("r_lex", row_number()
          .over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("int"))
        .select("doc_id", "r_lex")
      val qd = wAll.filter(col("t").isin(terms: _*))
        .groupBy("doc_id").agg(Similarity.decimalSum6(col("w")).as("num"))
      val den = qd.join(l2, "doc_id").filter(col("l2") > 0)
        .select(col("doc_id"), (col("num") / col("l2")).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(100)
        .withColumn("r_dense", row_number()
          .over(Window.orderBy(col("cos").desc, col("doc_id"))).cast("int"))
        .select("doc_id", "r_dense")
      lex.join(den, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_dense")), lit(0.0))).as("rrf"),
          col("r_lex"), col("r_dense"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(50)
    },

    QueryDef(
      "ext_tfidf_stats",
      s"""WITH ${Similarity.tfidfExactTermsSql}
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS nnz,
        |       sqrt(CAST(CAST(ROUND(SUM(w * w), 6) AS DECIMAL(20,6)) AS DOUBLE)) AS l2
        |FROM w GROUP BY doc_id""".stripMargin) { (s, d) =>
      val w = Similarity.tfidfExactTerms(Tables.documents(s, d))
      w.groupBy("doc_id")
        .agg(
          count(lit(1)).as("nnz"),
          sqrt(Similarity.decimalSum6(col("w") * col("w"))).as("l2"))
        .orderBy("doc_id")
    }
  )

  /** Shared BRP-LSH lazy-oracle SQL (ext_ann_topk / ext_ann_topk_batch,
    * both m=1): regenerates the seed-42 planes (Similarity.lshPlanes —
    * pure function of (dim, numTables, 1)), inlines them, and
    * reproduces Similarity.annTopK end to end: per-table bucket id
    * floor(v̂·w / bucketLength) (the JVM folds it into a long key, an
    * affine map with identical collision structure at m=1), the
    * DISTINCT cross-table candidate union, the exact cosine verify and
    * the (cos DESC, cid) top-10 with dist = sqrt(2 - 2·cos). Every fold
    * mirrors the JVM accumulation order: norm Σx², inv = 1/sqrt(n),
    * projection Σ (e[j]·inv)·w[j]. */
  /** DuckDB twin of [[Similarity.minHashNearDups]]. Two pieces of
    * Verify-time model state are inlined (the VecOracle discipline —
    * training/hashing state inlined, every CONSUMPTION verified):
    *   - the shingle→index vocabulary (HashingTF murmur3 mod 2^18 is
    *     the one step SQL can't express; ~16k rows at the sf0.01 gate —
    *     the collect is generator-only, never on the query path);
    *   - the 8 (a, b) minhash coefficient pairs (seed-42 draws,
    *     data-independent — [[Similarity.minHashCoefficients]]).
    * Everything else recomputes in SQL: per-doc DISTINCT word-3-gram
    * shingles, document-frequency prune (df <= 20 — sh rows are already
    * per-doc distinct, so COUNT(*) IS document frequency), per-table
    * minhash over the index set (BIGINT cast before the multiply:
    * (1+2^18)*2^31 overflows INT32, which DuckDB makes an error, not a
    * wrap), the OR-amplified candidate join on (table, hash), and
    * spark.ml's exact jaccard keyDistance with its strict-< threshold. */
  private def minhashMlOracleSql(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val docs = Tables.documents(s, d)
    val shingles = docs
      .select(explode(graft.functions.TextShingles.shingle3(
        split(col("text"), "\\s+"))).as("sh"))
      .distinct().collect().map(_.getString(0)).sorted
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setNumFeatures(1 << 18)
    val vocabRows = shingles
      .map(x => s"('${x.replace("'", "''")}', ${tf.indexOf(x)})")
      .mkString(",\n    ")
    val coef = Similarity.minHashCoefficients(
      Similarity.shingleVectors(docs), numTables = 8)
    val coefRows = coef.zipWithIndex
      .map { case ((a, b), t) => s"($t, $a, $b)" }.mkString(", ")
    s"""WITH vocab AS (SELECT sh, CAST(idx AS BIGINT) AS idx FROM (VALUES
       |    $vocabRows) AS _v(sh, idx)),
       |coef AS (SELECT CAST(t AS INT) AS t, CAST(a AS BIGINT) AS a,
       |                CAST(b AS BIGINT) AS b
       |         FROM (VALUES $coefRows) AS _c(t, a, b)),
       |toksrc AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS arr FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS sh
       |  FROM toksrc, LATERAL (SELECT UNNEST(range(1, len(arr) - 1)) AS i) _r
       |  WHERE len(arr) >= 3),
       |dfok AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 20),
       |feat AS (
       |  SELECT DISTINCT s.doc_id, v.idx
       |  FROM sh s JOIN dfok USING (sh) JOIN vocab v USING (sh)),
       |nsz AS (SELECT doc_id, COUNT(*) AS n FROM feat GROUP BY doc_id),
       |mh AS (
       |  SELECT f.doc_id, c.t, MIN(((1 + f.idx) * c.a + c.b) % 2038074743) AS h
       |  FROM feat f CROSS JOIN coef c GROUP BY f.doc_id, c.t),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM mh x JOIN mh y ON x.t = y.t AND x.h = y.h
       |  WHERE x.doc_id < y.doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
       |  FROM cand c
       |  JOIN feat fa ON fa.doc_id = c.doc_a
       |  JOIN feat fb ON fb.doc_id = c.doc_b AND fb.idx = fa.idx
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |       1 - CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i) AS jaccard_dist
       |FROM inter i
       |JOIN nsz na ON na.doc_id = i.doc_a
       |JOIN nsz nb ON nb.doc_id = i.doc_b
       |WHERE 1 - CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i) < 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private def annOracleSql(s: org.apache.spark.sql.SparkSession,
      d: String, numTables: Int, bucketLength: Double,
      qFilter: String, emitCos: Boolean = false): String = {
    val dim = Tables.embeddings(s, d)
      .select(size(col("embedding"))).head().getInt(0)
    val planes = Similarity.lshPlanes(dim, numTables, 1)
    val rows = planes.zipWithIndex.map { case (t, i) =>
      s"($i, ${VecOracle.dlst(t(0))})" }.mkString(",\n    ")
    s"""WITH pl AS (SELECT CAST(t AS INT) AS tbl, w FROM (VALUES
       |    $rows) AS _pl(t, w)),
       |b AS (
       |  SELECT vec_id, ev,
       |         CASE WHEN nn = 0 THEN 0.0 ELSE 1.0 / sqrt(nn) END AS inv
       |  FROM (SELECT vec_id, embedding AS ev,
       |          list_reduce(list_transform(embedding,
       |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |            (a, b2) -> a + b2) AS nn
       |        FROM embeddings)),
       |bk AS (
       |  SELECT b.vec_id, pl.tbl,
       |         CAST(FLOOR(list_reduce(list_transform(range(1, len(b.ev) + 1),
       |           j -> (CAST(b.ev[j] AS DOUBLE) * b.inv) * pl.w[j]),
       |           (x, y) -> x + y) / $bucketLength) AS BIGINT) AS h
       |  FROM b CROSS JOIN pl),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
       |  FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.h = c.h
       |  WHERE q.vec_id <> c.vec_id $qFilter),
       |vv AS (
       |  SELECT vec_id, ev,
       |         sqrt(list_reduce(list_transform(ev,
       |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |           (a, b2) -> a + b2)) AS nrm
       |  FROM (SELECT vec_id, embedding AS ev FROM embeddings)),
       |sc AS (
       |  SELECT cand.qid, cand.cid,
       |         list_reduce(list_transform(range(1, len(a.ev) + 1),
       |           i -> CAST(a.ev[i] AS DOUBLE) * CAST(c2.ev[i] AS DOUBLE)),
       |           (x, y) -> x + y) / (a.nrm * c2.nrm) AS cos
       |  FROM cand JOIN vv a ON a.vec_id = cand.qid
       |            JOIN vv c2 ON c2.vec_id = cand.cid)
       |SELECT qid, cid, ${if (emitCos) "cos"
           else "sqrt(greatest(0.0, 2.0 - 2.0 * cos)) AS dist"} FROM (
       |  SELECT qid, cid, cos,
       |         ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY cos DESC, cid) AS rn
       |  FROM sc WHERE cos >= -1.0)
       |WHERE rn <= 10""".stripMargin
  }
}
