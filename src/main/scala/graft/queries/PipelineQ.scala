package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (north star, BASELINE.json): deduplication, text analysis, similarity
  * search, multimodal plumbing. Ref: ABSENT in /root/reference — these are
  * the engine's extension surface (SURVEY §2.3 "Extension operators").
  *
  * Scale posture (100 TB):
  *   - dedup/fingerprint/quality are embarrassingly parallel per-row maps
  *     plus one hash-partitioned groupBy;
  *   - n-gram Jaccard and MinHash candidate generation join on the
  *     shingle/band key — never all-pairs: cost is Σ per-key bucket², the
  *     LSH shape that survives 1000 executors;
  *   - brute-force cosine top-k is the small-side oracle: |Q| is broadcast,
  *     candidates stream — linear in the corpus, never corpus × corpus.
  */
object PipelineQ {

  /** Whitespace tokens, the shared tokenizer of this family. */
  private def toks = split(col("text"), "\\s+")

  /** doc_id + exploded distinct shingles, shared by the dedup family.
    * Shingling is the compiled UDF in [[graft.functions.TextShingles]]
    * (9x the interpreted-HOF form; output bit-identical to the DuckDB
    * oracle's list_transform expression including first-seen order). */
  private def shingled(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextShingles.shingle3(toks)).as("shingle"))

  /** Shared DuckDB CTE prefix: banded-MinHash LSH candidates ->
    * exact-Jaccard verify -> recursive-CTE closure, ending in
    * `canon(node, canonical_id)`. Used by doc_lsh_verified_dedup and
    * doc_leakage_safe_split so the hash/band/verify semantics live
    * once. */
  private val LshCanonPrefix: String =
    """WITH RECURSIVE sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
         |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
         |           string_split_regex(text, '\s+')[i+1] || ' ' ||
         |           string_split_regex(text, '\s+')[i+2]))) AS shingle
         |  FROM documents),
         |base AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
         |           % 2147483647 AS h0
         |  FROM sh),
         |mins AS (
         |  SELECT doc_id,
         |         MIN((1 * h0 + 0) % 2147483647) AS m0,
         |         MIN((2 * h0 + 999999937) % 2147483647) AS m1,
         |         MIN((3 * h0 + 1999999874) % 2147483647) AS m2,
         |         MIN((4 * h0 + 852516164) % 2147483647) AS m3,
         |         MIN((5 * h0 + 1852516101) % 2147483647) AS m4,
         |         MIN((6 * h0 + 705032391) % 2147483647) AS m5,
         |         MIN((7 * h0 + 1705032328) % 2147483647) AS m6,
         |         MIN((8 * h0 + 557548618) % 2147483647) AS m7
         |  FROM base GROUP BY doc_id),
         |sig AS (
         |            SELECT doc_id, 0 AS band, m0 AS b0, m1 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 1 AS band, m2 AS b0, m3 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 2 AS band, m4 AS b0, m5 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 3 AS band, m6 AS b0, m7 AS b1 FROM mins),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sig a JOIN sig b
         |    ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
         |       AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY c.doc_a, c.doc_b),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN n na ON na.doc_id = doc_a
         |  JOIN n nb ON nb.doc_id = doc_b
         |  WHERE CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) >= 0.5),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS r FROM edges
         |  UNION
         |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node),
         |canon AS (SELECT node, MIN(r) AS canonical_id FROM reach GROUP BY node)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------- //
    // Deduplication                                                     //
    // ----------------------------------------------------------------- //

    // Exact dedup: canonical representative (min doc_id) per distinct text.
    QueryDef(
      "doc_exact_dedup",
      """SELECT MIN(doc_id) AS doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies,
        |       md5(text) AS text_hash
        |FROM documents GROUP BY text""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"), md5(col("text").cast("binary")).as("text_hash"))
    },

    // n-gram Jaccard near-dup scoring: pairs sharing >=1 rare shingle.
    // Join on the shingle key (LSH shape) — intersection counts fall out
    // of one groupBy; no all-pairs product is ever materialized. Shingles
    // in > DF_CAP docs are pruned first: ubiquitous shingles contribute no
    // dedup signal but quadratic join cost (the df-pruning every
    // web-scale dedup pipeline applies). Jaccard is over the rare-shingle
    // space on BOTH engines, so the oracle matches exactly.
    QueryDef(
      "doc_ngram_jaccard",
      """WITH sh0 AS (
         |  SELECT doc_id, lang, unnest(list_distinct(
         |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
         |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
         |           string_split_regex(text, '\s+')[i+1] || ' ' ||
         |           string_split_regex(text, '\s+')[i+2]))) AS shingle
         |  FROM documents),
         |df AS (SELECT shingle, COUNT(*) AS c FROM sh0 GROUP BY shingle),
         |sh AS (SELECT sh0.* FROM sh0 JOIN df USING (shingle) WHERE df.c <= 20),
         |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM sh a JOIN sh b
         |    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, n_common,
         |       CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) AS jaccard
         |FROM inter
         |JOIN n na ON na.doc_id = doc_a
         |JOIN n nb ON nb.doc_id = doc_b
         |WHERE CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) >= 0.2""".stripMargin) { (s, d) =>
      // r20 (guide §2.3): all join/aggregate keys downstream of the
      // shingle explode are the 8-byte xxhash64 of the shingle string —
      // the Dedup.nearDupEdges narrowing (see its scaladoc for the
      // collision argument); df counts / intersection counts / jaccard
      // are unchanged, the df join + self-join shuffles move ~1/3 the
      // bytes. The oracle still speaks strings: counts agree exactly.
      val sh0 = shingled(s, d)
        .select(col("doc_id"), col("lang"), xxhash64(col("shingle")).as("shingle"))
      val sh = sh0.join(
          sh0.groupBy("shingle").agg(count(lit(1)).as("c")).filter(col("c") <= 20),
          "shingle")
        .select("doc_id", "lang", "shingle")
        .cache()
      val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val a = sh.select(col("doc_id").as("doc_a"), col("lang"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"), col("shingle").as("shingle_b"))
      val inter = a.join(b,
          col("shingle") === col("shingle_b") && col("lang") === col("lang_b")
            && col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_common"))
      val na = n.select(col("doc_id").as("doc_a"), col("n_sh").as("na_sh"))
      val nb = n.select(col("doc_id").as("doc_b"), col("n_sh").as("nb_sh"))
      inter.join(na, "doc_a").join(nb, "doc_b")
        .withColumn("jaccard",
          col("n_common").cast("double") / (col("na_sh") + col("nb_sh") - col("n_common")))
        .filter(col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    },

    // SimHash: 60-bit per-doc signature by bit-majority over token hashes.
    // Token hash = first 15 hex chars of md5 (60 bits, sign-safe in BIGINT)
    // — md5 exists in BOTH engines, so unlike the earlier xxhash64 form
    // this is fully DuckDB-oracle-paired (VERDICT r4 item 4). Invariance
    // properties additionally asserted in the test suite.
    QueryDef(
      "doc_simhash",
      """WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
         |  FROM tok),
         |bits AS (
         |  SELECT doc_id, j,
         |         SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
         |  GROUP BY doc_id, j)
         |SELECT doc_id,
         |       CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id""".stripMargin) { (s, d) =>
      // codegen-friendly shape: explode token hashes once, then ONE
      // HashAggregate with 60 bit-vote sums (whole-stage codegen'd) —
      // nested HOF folds evaluate lambdas interpreted per element and
      // were ~5x slower here
      val tok = Tables.documents(s, d)
        .selectExpr("doc_id",
          "explode(transform(split(text, '\\\\s+'), " +
            "t -> cast(conv(substring(md5(cast(t AS binary)), 1, 15), 16, 10) AS bigint))) AS h")
      val votes = (0 until 60).map { j =>
        sum(when(expr(s"(shiftright(h, $j) & 1) = 1"), 1).otherwise(-1)).as(s"b$j")
      }
      val packed = (0 until 60)
        .map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j}L ELSE 0L END)")
        .mkString(" | ")
      tok.groupBy("doc_id")
        .agg(votes.head, votes.tail: _*)
        .selectExpr("doc_id", s"($packed) AS simhash")
    },

    // MinHash + banded LSH candidate pairs: 8 hash seeds, 4 bands x 2 rows.
    // Candidates = docs agreeing on a full band signature — the 100 TB path
    // (band-key groupBy; bucket join) vs exact Jaccard's shingle join.
    //
    // Hashing: ONE md5 per shingle (60-bit base from the first 15 hex
    // chars, sign-safe in BIGINT), then the 8 "seeds" are linear
    // permutations h_s = ((s+1)*h0 + s*C) mod p over p = 2^31-1 — the
    // classic LCG MinHash family ((a*h+b) mod p is a permutation of Z_p
    // for a != 0). All arithmetic stays < 2^35, so Spark and DuckDB agree
    // exactly (no overflow divergence) and the whole LSH candidate
    // generation is DuckDB-hash-verified (VERDICT r4 item 4).
    //
    // Shape: a single HashAggregate computes all 8 per-seed minima as
    // conditional-min columns (no 8x seed explode), stack() turns them
    // into 4 band rows, and the self-join key is (band, m0, m1) — 20
    // bytes of fixed-width longs instead of the r4 JSON string whose fat
    // allocation-heavy key caused the 2x bench regression (VERDICT r4
    // item 1).
    QueryDef(
      "doc_minhash_candidates",
      """WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
         |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
         |           string_split_regex(text, '\s+')[i+1] || ' ' ||
         |           string_split_regex(text, '\s+')[i+2]))) AS shingle
         |  FROM documents),
         |base AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
         |           % 2147483647 AS h0
         |  FROM sh),
         |mins AS (
         |  SELECT doc_id,
         |         MIN((1 * h0 + 0) % 2147483647) AS m0,
         |         MIN((2 * h0 + 999999937) % 2147483647) AS m1,
         |         MIN((3 * h0 + 1999999874) % 2147483647) AS m2,
         |         MIN((4 * h0 + 852516164) % 2147483647) AS m3,
         |         MIN((5 * h0 + 1852516101) % 2147483647) AS m4,
         |         MIN((6 * h0 + 705032391) % 2147483647) AS m5,
         |         MIN((7 * h0 + 1705032328) % 2147483647) AS m6,
         |         MIN((8 * h0 + 557548618) % 2147483647) AS m7
         |  FROM base GROUP BY doc_id),
         |sig AS (
         |            SELECT doc_id, 0 AS band, m0 AS b0, m1 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 1 AS band, m2 AS b0, m3 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 2 AS band, m4 AS b0, m5 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 3 AS band, m6 AS b0, m7 AS b1 FROM mins)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM sig a JOIN sig b
         |  ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
         |     AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      graft.ext.Dedup.minhashCandidates(Tables.documents(s, d), maxBucket = Int.MaxValue)
        .orderBy("doc_a", "doc_b")
    },

    // END-TO-END dedup (VERDICT r3 item 7): near-dup edges (exact
    // jaccard >= 0.5 over df-capped shingles) -> connected components
    // (min-label propagation, graft.ext.Dedup) -> canonical = min doc_id
    // per group. The DuckDB oracle computes the SAME closure with a
    // recursive CTE, so the whole pipeline — not just the edge scoring —
    // is hash-verified.
    QueryDef(
      "doc_dedup_pipeline",
      """WITH RECURSIVE sh0 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
         |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
         |           string_split_regex(text, '\s+')[i+1] || ' ' ||
         |           string_split_regex(text, '\s+')[i+2]))) AS shingle
         |  FROM documents),
         |df AS (SELECT shingle, COUNT(*) AS c FROM sh0 GROUP BY shingle),
         |sh AS (SELECT sh0.* FROM sh0 JOIN df USING (shingle) WHERE df.c <= 20),
         |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN n na ON na.doc_id = doc_a
         |  JOIN n nb ON nb.doc_id = doc_b
         |  WHERE CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) >= 0.5),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS r FROM edges
         |  UNION
         |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node),
         |canon AS (SELECT node, MIN(r) AS canonical_id FROM reach GROUP BY node)
         |SELECT d.doc_id,
         |       COALESCE(c.canonical_id, d.doc_id) AS canonical_id,
         |       COALESCE(c.canonical_id, d.doc_id) = d.doc_id AS is_canonical
         |FROM documents d LEFT JOIN canon c ON c.node = d.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Dedup.canonicalDocs(Tables.documents(s, d))
    },

    // Sketch-accuracy report (r11): per LSH candidate pair, the
    // MinHash Jaccard ESTIMATE (agreeing minhashes / 8) next to the
    // exact Jaccard and the absolute error — the calibration table a
    // pipeline publishes before trusting banded-LSH recall at a new
    // threshold. All md5/LCG arithmetic (the doc_minhash_candidates
    // family), so the whole row is hash-exact cross-engine: est is an
    // exact k/8 rational, exact Jaccard is one integer division, and
    // the error is a single IEEE subtract/abs. Scale: signatures are
    // one groupBy over shingle rows; the exact side touches only
    // candidate pairs (semi-restricted shingle join).
    QueryDef(
      "doc_minhash_jaccard_est",
      """WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
         |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
         |           string_split_regex(text, '\s+')[i+1] || ' ' ||
         |           string_split_regex(text, '\s+')[i+2]))) AS shingle
         |  FROM documents),
         |base AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
         |           % 2147483647 AS h0
         |  FROM sh),
         |mins AS (
         |  SELECT doc_id,
         |         MIN((1 * h0 + 0) % 2147483647) AS m0,
         |         MIN((2 * h0 + 999999937) % 2147483647) AS m1,
         |         MIN((3 * h0 + 1999999874) % 2147483647) AS m2,
         |         MIN((4 * h0 + 852516164) % 2147483647) AS m3,
         |         MIN((5 * h0 + 1852516101) % 2147483647) AS m4,
         |         MIN((6 * h0 + 705032391) % 2147483647) AS m5,
         |         MIN((7 * h0 + 1705032328) % 2147483647) AS m6,
         |         MIN((8 * h0 + 557548618) % 2147483647) AS m7
         |  FROM base GROUP BY doc_id),
         |sig AS (
         |            SELECT doc_id, 0 AS band, m0 AS b0, m1 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 1 AS band, m2 AS b0, m3 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 2 AS band, m4 AS b0, m5 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 3 AS band, m6 AS b0, m7 AS b1 FROM mins),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sig a JOIN sig b
         |    ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
         |       AND a.doc_id < b.doc_id),
         |agree AS (
         |  SELECT c.doc_a, c.doc_b,
         |         ((CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END) +
         |          (CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END) +
         |          (CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END) +
         |          (CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END) +
         |          (CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END) +
         |          (CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END) +
         |          (CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END) +
         |          (CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END)) AS k
         |  FROM cand c JOIN mins x ON x.doc_id = c.doc_a
         |              JOIN mins y ON y.doc_id = c.doc_b),
         |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.doc_a
         |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY c.doc_a, c.doc_b)
         |SELECT g.doc_a, g.doc_b,
         |       CAST(g.k AS DOUBLE) / 8 AS est_jaccard,
         |       CAST(COALESCE(cm.n_common, 0) AS DOUBLE) /
         |         (na.n_sh + nb.n_sh - COALESCE(cm.n_common, 0)) AS jaccard,
         |       abs(CAST(g.k AS DOUBLE) / 8 -
         |           CAST(COALESCE(cm.n_common, 0) AS DOUBLE) /
         |             (na.n_sh + nb.n_sh - COALESCE(cm.n_common, 0))) AS abs_err
         |FROM agree g
         |LEFT JOIN common cm ON cm.doc_a = g.doc_a AND cm.doc_b = g.doc_b
         |JOIN n na ON na.doc_id = g.doc_a
         |JOIN n nb ON nb.doc_id = g.doc_b
         |ORDER BY g.doc_a, g.doc_b""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val p = 2147483647L
      val sh = graft.ext.Dedup.distinctShingles(docs)
      val base = sh.withColumn("h0", expr(
        s"cast(conv(substring(md5(cast(shingle AS binary)), 1, 15), 16, 10) AS bigint) % $p"))
      val bsv = (0 until 8).map(i => (i.toLong * 999999937L) % p)
      val minsCols = (0 until 8).map { i =>
        min(expr(s"(${i + 1} * h0 + ${bsv(i)}) % $p")).as(s"m$i")
      }
      val mins = base.groupBy("doc_id").agg(minsCols.head, minsCols.tail: _*)
      val cand = graft.ext.Dedup.minhashCandidates(docs, maxBucket = Int.MaxValue)
      val sa = mins.select(col("doc_id").as("doc_a") +:
        (0 until 8).map(i => col(s"m$i").as(s"a$i")): _*)
      val sb = mins.select(col("doc_id").as("doc_b") +:
        (0 until 8).map(i => col(s"m$i").as(s"b$i")): _*)
      val k = (0 until 8)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      // r21 (guide §2.3): the exact-common count join ships xxhash64
      // keys, not shingle strings (the nearDupEdges/lshVerifiedEdges
      // narrowing applied to this row's verify stage) — counts equal
      // modulo the standard 2^-64 collision bound; the oracle still
      // counts strings and stays hash-green.
      val shH = sh.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      val common = cand
        .join(shH.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
        .join(shH.select(col("doc_id").as("doc_b"), col("shingle")),
          Seq("doc_b", "shingle"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
      val jac = coalesce(col("n_common"), lit(0L)).cast("double") /
        (col("na") + col("nb") - coalesce(col("n_common"), lit(0L)))
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (k.cast("double") / lit(8)).as("est_jaccard"))
        .join(common, Seq("doc_a", "doc_b"), "left")
        .join(n.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
        .join(n.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
          jac.as("jaccard"),
          abs(col("est_jaccard") - jac).as("abs_err"))
        .orderBy("doc_a", "doc_b")
    },

    // Dedup REPORT (r11): the duplicate-group size histogram + bytes
    // reclaimed — the summary table every corpus dedup run publishes
    // (how much of the corpus was duplicated, at what group sizes, how
    // many bytes the cut saves). Same closure as doc_dedup_pipeline
    // (singletons included via the left join), then two aggregations:
    // component → (size, bytes) → histogram keyed by group size. Bytes
    // saved per group = group bytes − the canonical (min doc_id) doc's
    // bytes. Scale: everything after the (already-measured) dedup
    // pipeline is two map-side-combinable aggregates on doc-level rows.
    QueryDef(
      "doc_dedup_stats",
      """WITH RECURSIVE sh0 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
         |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
         |           string_split_regex(text, '\s+')[i+1] || ' ' ||
         |           string_split_regex(text, '\s+')[i+2]))) AS shingle
         |  FROM documents),
         |df AS (SELECT shingle, COUNT(*) AS c FROM sh0 GROUP BY shingle),
         |sh AS (SELECT sh0.* FROM sh0 JOIN df USING (shingle) WHERE df.c <= 20),
         |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN n na ON na.doc_id = doc_a
         |  JOIN n nb ON nb.doc_id = doc_b
         |  WHERE CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) >= 0.5),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS r FROM edges
         |  UNION
         |  SELECT e.a AS node, reach.r AS r FROM edges e JOIN reach ON e.b = reach.node),
         |canon AS (SELECT node, MIN(r) AS canonical_id FROM reach GROUP BY node),
         |lab AS (
         |  SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS component,
         |         d.n_chars
         |  FROM documents d LEFT JOIN canon c ON c.node = d.doc_id),
         |grp AS (
         |  SELECT component, CAST(COUNT(*) AS BIGINT) AS group_size,
         |         CAST(SUM(n_chars) AS BIGINT) AS grp_bytes,
         |         CAST(MIN(CASE WHEN doc_id = component THEN n_chars END) AS BIGINT)
         |           AS canon_bytes
         |  FROM lab GROUP BY component)
         |SELECT group_size,
         |       CAST(COUNT(*) AS BIGINT) AS n_groups,
         |       CAST(SUM(group_size) AS BIGINT) AS n_docs,
         |       CAST(SUM(group_size - 1) AS BIGINT) AS n_dup_docs,
         |       CAST(SUM(grp_bytes - canon_bytes) AS BIGINT) AS bytes_saved
         |FROM grp GROUP BY group_size
         |ORDER BY group_size""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val lab = graft.ext.Dedup.canonicalDocs(docs)
        .select(col("doc_id"), col("canonical_id").as("component"))
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      val grp = lab.groupBy("component").agg(
        count(lit(1)).as("group_size"),
        sum("n_chars").as("grp_bytes"),
        min(when(col("doc_id") === col("component"), col("n_chars")))
          .as("canon_bytes"))
      grp.groupBy("group_size").agg(
          count(lit(1)).as("n_groups"),
          sum("group_size").as("n_docs"),
          sum(col("group_size") - 1).as("n_dup_docs"),
          sum(col("grp_bytes") - col("canon_bytes")).as("bytes_saved"))
        .orderBy("group_size")
    },

    // The TRUE 100 TB dedup recipe as ONE entry (VERDICT r4 item 7):
    // banded-MinHash LSH candidates -> exact Jaccard verification of
    // ONLY the candidate pairs -> connected components -> canonical doc.
    // Because the LSH hashing is the md5/LCG family, EVERY stage is
    // DuckDB-expressible, and the oracle below recomputes the whole
    // composition — candidates, restricted verify, recursive-CTE
    // closure — so this is hash-verified end to end.
    QueryDef(
      "doc_lsh_verified_dedup",
      LshCanonPrefix + """
         |SELECT d.doc_id,
         |       COALESCE(c.canonical_id, d.doc_id) AS canonical_id,
         |       COALESCE(c.canonical_id, d.doc_id) = d.doc_id AS is_canonical
         |FROM documents d LEFT JOIN canon c ON c.node = d.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Dedup.lshVerifiedCanonicalDocs(Tables.documents(s, d))
    },

    // Leakage-safe train/val/test split (r15): the split decision keys
    // on the near-dup CANONICAL id, not the document id — so a whole
    // near-duplicate group lands in ONE split and eval can never see a
    // paraphrase of a training doc (the contamination mode a plain
    // per-doc hash split ships silently; Lee et al. 2107.06499 §6.2
    // measure exactly this train-test overlap). Composition of two
    // already-verified operators: the LSH-verified canonical map and
    // the salted-md5 coin ('split:' salt keeps it independent of the
    // sampling stages' coins). 80/10/10 on the canonical hash; every
    // stage is the one-shuffle shape of its parent operator.
    QueryDef(
      "doc_leakage_safe_split",
      LshCanonPrefix + """,
         |cmap AS (
         |  SELECT d.doc_id,
         |         COALESCE(c.canonical_id, d.doc_id) AS canonical_id
         |  FROM documents d LEFT JOIN canon c ON c.node = d.doc_id)
         |SELECT doc_id, canonical_id,
         |       CASE WHEN b < 80 THEN 'train'
         |            WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, canonical_id,
         |         CAST(concat('0x', substr(md5('split:' || CAST(canonical_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
         |  FROM cmap)""".stripMargin) { (s, d) =>
      val canon = graft.ext.Dedup
        .lshVerifiedCanonicalDocs(Tables.documents(s, d))
        .select(col("doc_id"), col("canonical_id"))
      canon
        .withColumn("b", pmod(expr(
          "cast(conv(substring(md5(cast(concat('split:', cast(canonical_id AS string)) AS binary)), 1, 15), 16, 10) AS bigint)"),
          lit(100L)))
        .select(col("doc_id"), col("canonical_id"),
          when(col("b") < 80, "train")
            .when(col("b") < 90, "val")
            .otherwise("test").as("split"))
    },

    // Incremental near-dup ingest (even doc_ids = existing corpus, odd =
    // incoming batch, the bloom-prefilter convention): banded-MinHash
    // collisions BETWEEN the sides only, exact-Jaccard verified. The
    // md5/LCG hashing makes the whole path DuckDB-expressible, so the
    // candidates AND the verification are hash-checked.
    QueryDef(
      "doc_incremental_neardups",
      """WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
         |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
         |           string_split_regex(text, '\s+')[i+1] || ' ' ||
         |           string_split_regex(text, '\s+')[i+2]))) AS shingle
         |  FROM documents),
         |base AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
         |           % 2147483647 AS h0
         |  FROM sh),
         |mins AS (
         |  SELECT doc_id,
         |         MIN((1 * h0 + 0) % 2147483647) AS m0,
         |         MIN((2 * h0 + 999999937) % 2147483647) AS m1,
         |         MIN((3 * h0 + 1999999874) % 2147483647) AS m2,
         |         MIN((4 * h0 + 852516164) % 2147483647) AS m3,
         |         MIN((5 * h0 + 1852516101) % 2147483647) AS m4,
         |         MIN((6 * h0 + 705032391) % 2147483647) AS m5,
         |         MIN((7 * h0 + 1705032328) % 2147483647) AS m6,
         |         MIN((8 * h0 + 557548618) % 2147483647) AS m7
         |  FROM base GROUP BY doc_id),
         |sig AS (
         |            SELECT doc_id, 0 AS band, m0 AS b0, m1 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 1 AS band, m2 AS b0, m3 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 2 AS band, m4 AS b0, m5 AS b1 FROM mins
         |  UNION ALL SELECT doc_id, 3 AS band, m6 AS b0, m7 AS b1 FROM mins),
         |cand AS (
         |  SELECT DISTINCT c.doc_id AS doc_corpus, b.doc_id AS doc_new
         |  FROM sig c JOIN sig b
         |    ON c.band = b.band AND c.b0 = b.b0 AND c.b1 = b.b1
         |  WHERE c.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
         |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT cand.doc_corpus, cand.doc_new, CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM cand
         |  JOIN sh a ON a.doc_id = cand.doc_corpus
         |  JOIN sh b ON b.doc_id = cand.doc_new AND b.shingle = a.shingle
         |  GROUP BY cand.doc_corpus, cand.doc_new)
         |SELECT doc_corpus, doc_new, n_common,
         |       CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) AS jaccard
         |FROM inter
         |JOIN n na ON na.doc_id = doc_corpus
         |JOIN n nb ON nb.doc_id = doc_new
         |WHERE CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) >= 0.5""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Dedup.incrementalNearDups(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    },

    // ----------------------------------------------------------------- //
    // Text analysis                                                     //
    // ----------------------------------------------------------------- //

    QueryDef(
      "doc_token_stats",
      """SELECT doc_id,
        |       CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_tokens,
        |       CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS INT) AS n_distinct,
        |       CAST(list_reduce(list_transform(string_split_regex(text, '\s+'),
        |              t -> CAST(length(t) AS BIGINT)), (a, b) -> a + b) AS BIGINT) AS sum_tok_len
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        aggregate(transform(toks, t => length(t).cast("bigint")),
          lit(0L), (a, b) => a + b).as("sum_tok_len"))
    },

    // PII redaction (r16): the scrubbing stage every production corpus
    // build runs before training — emails, simple phone forms, and
    // IPv4s replaced with typed placeholders, with per-doc counts for
    // the compliance report. Pure regexp_replace/regexp_extract_all
    // (codegen'd, no UDF), so at 100 TB this is a map-only scan.
    // The fixture vocabulary contains no real PII, so deterministic
    // synthetic PII is INJECTED first (keyed on doc_id, identical
    // expressions in both engines) — the redaction then has real work
    // on ~2/3 of docs and provably leaves clean docs untouched. The
    // regex subset used (char classes, bounded repetition, \b, \d) has
    // identical semantics in Java regex (Spark) and RE2 (DuckDB).
    QueryDef(
      "doc_pii_redact",
      """WITH injected AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN
        |                concat(text, ' contact user', doc_id, '@example.com now')
        |              WHEN doc_id % 3 = 1 THEN
        |                concat(text, ' call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        |                       ' or ping 10.0.', CAST(doc_id % 256 AS VARCHAR), '.1')
        |              ELSE text END AS txt
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(txt,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |       CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
        |       CAST(len(regexp_extract_all(txt,
        |         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |       regexp_replace(regexp_replace(regexp_replace(txt,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |         '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM injected""".stripMargin) { (s, d) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phoneRe = "\\b\\d{3}-\\d{4}\\b"
      val txt = when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com now")))
        .when(col("doc_id") % 3 === 1,
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" or ping 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".1")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), txt.as("txt"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("txt"), lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("txt"), lit(phoneRe), lit(0))).as("n_phones"),
          size(regexp_extract_all(col("txt"), lit(ipRe), lit(0))).as("n_ips"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("txt"), emailRe, "<EMAIL>"),
              ipRe, "<IP>"),
            phoneRe, "<PHONE>").as("redacted"))
    },

    // Shannon entropy of the per-doc token histogram (H = ln N -
    // (Σ c·ln c)/N) + distinct ratio: the gibberish/boilerplate signal
    // a pretraining quality filter thresholds on (repeated-phrase spam
    // scores low, natural prose high). Explode -> two HashAggregates —
    // embarrassingly parallel. ln is transcendental -> half-up
    // FLOOR-quantized onto the 1e6 grid (Det.u6), the established
    // cross-engine discipline for libm-backed values (r10: ROUND on a
    // raw double is banned from the oracle surface).
    QueryDef(
      "doc_token_entropy",
      """WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
         |  FROM documents),
         |tc AS (
         |  SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS c
         |  FROM tok GROUP BY doc_id, t),
         |agg AS (
         |  SELECT doc_id, SUM(c) AS n, SUM(c * ln(c)) AS clnc,
         |         CAST(COUNT(*) AS BIGINT) AS n_distinct
         |  FROM tc GROUP BY doc_id)
         |SELECT doc_id,
         |       CAST(FLOOR((ln(n) - clnc / n) * 1e6 + 0.5) AS BIGINT) AS token_entropy_u6,
         |       CAST(FLOOR(n_distinct / n * 1e6 + 0.5) AS BIGINT) AS distinct_ratio_u6
         |FROM agg""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("t"))
      val tc = tok.groupBy("doc_id", "t").agg(count(lit(1)).cast("double").as("c"))
      tc.groupBy("doc_id")
        .agg(
          sum("c").as("n"),
          sum(col("c") * log(col("c"))).as("clnc"),
          count(lit(1)).as("n_distinct"))
        .select(
          col("doc_id"),
          graft.Det.u6(log(col("n")) - col("clnc") / col("n")).as("token_entropy_u6"),
          graft.Det.u6(col("n_distinct") / col("n")).as("distinct_ratio_u6"))
    },

    // Quality scoring: length, type-token ratio, stopword ratio — the
    // classic pretraining-corpus quality features, all exact arithmetic.
    QueryDef(
      "doc_quality",
      """SELECT doc_id, n_chars,
        |       CAST(n_tok AS INT) AS n_tokens,
        |       CAST(n_uniq AS DOUBLE) / n_tok AS type_token_ratio,
        |       CAST(n_stop AS DOUBLE) / n_tok AS stopword_ratio,
        |       CAST(n_chars AS DOUBLE) / n_tok AS avg_tok_span
        |FROM (
        |  SELECT doc_id, n_chars,
        |         len(string_split_regex(text, '\s+')) AS n_tok,
        |         len(list_distinct(string_split_regex(text, '\s+'))) AS n_uniq,
        |         len(list_filter(string_split_regex(text, '\s+'),
        |               t -> list_contains(['the', 'a'], t))) AS n_stop
        |  FROM documents)""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          size(toks).as("n_tok"),
          size(array_distinct(toks)).as("n_uniq"),
          size(filter(toks, t => t.isin("the", "a"))).as("n_stop"))
        .select(col("doc_id"), col("n_chars"),
          col("n_tok").cast("int").as("n_tokens"),
          (col("n_uniq").cast("double") / col("n_tok")).as("type_token_ratio"),
          (col("n_stop").cast("double") / col("n_tok")).as("stopword_ratio"),
          (col("n_chars").cast("double") / col("n_tok")).as("avg_tok_span"))
    },

    // Language-ID heuristic: English-stopword fraction. (A char-n-gram
    // scorer lives in the ext module; this is the SQL-expressible variant.)
    QueryDef(
      "doc_lang_heuristic",
      """SELECT doc_id, lang,
        |       score,
        |       CASE WHEN score >= 0.05 THEN 'en-like' ELSE 'other' END AS lang_guess
        |FROM (
        |  SELECT doc_id, lang,
        |         CAST(len(list_filter(string_split_regex(text, '\s+'),
        |                t -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'], t))) AS DOUBLE)
        |           / len(string_split_regex(text, '\s+')) AS score
        |  FROM documents)""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          (size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in", "is", "it"))).cast("double")
            / size(toks)).as("score"))
        .withColumn("lang_guess",
          when(col("score") >= 0.05, "en-like").otherwise("other"))
    },

    // Document fingerprint: md5 over whitespace-normalized lowercase text —
    // the canonical-form content hash for cross-shard dedup.
    QueryDef(
      "doc_fingerprint",
      """SELECT doc_id,
        |       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary")).as("fp"))
    },

    // ----------------------------------------------------------------- //
    // Similarity search (embeddings)                                    //
    // ----------------------------------------------------------------- //

    // L2 norm + mean per vector: sequential double fold, identical shape in
    // both engines (left fold from 0.0 == DuckDB's no-init fold, IEEE-exact).
    QueryDef(
      "emb_norms",
      """SELECT vec_id, label,
        |       sqrt(list_reduce(list_transform(embedding,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS l2_norm,
        |       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a + b)
        |         / len(embedding) AS mean_val
        |FROM embeddings""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (a, b) => a + b)).as("l2_norm"),
        (aggregate(transform(col("embedding"), x => x.cast("double")),
          lit(0.0), (a, b) => a + b) / size(col("embedding"))).as("mean_val"))
    },

    // Embedding-cosine near-dup dedup, EXACT path: all-pairs cosine >=
    // 0.42 edges -> connected components -> canonical vector. The DuckDB
    // oracle recomputes the identical composition (same sequential
    // cosine folds, recursive-CTE closure) — hash-verified end to end.
    // O(n^2): this is the oracle baseline; emb_dedup_lsh is the scale
    // path over the same semantics.
    QueryDef(
      "emb_dedup_exact",
      """WITH RECURSIVE v AS (
         |  SELECT vec_id, embedding AS e,
         |         sqrt(list_reduce(list_transform(embedding,
         |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id
         |  WHERE list_reduce(list_transform(range(1, len(a.e) + 1),
         |          i -> CAST(a.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE)), (x, y) -> x + y)
         |        / (a.nrm * b.nrm) >= 0.42),
         |edges AS (SELECT va AS x, vb AS y FROM p
         |          UNION ALL SELECT vb, va FROM p),
         |reach AS (
         |  SELECT x AS node, x AS r FROM edges
         |  UNION
         |  SELECT e.x AS node, reach.r AS r FROM edges e JOIN reach ON e.y = reach.node),
         |canon AS (SELECT node, MIN(r) AS canonical_id FROM reach GROUP BY node)
         |SELECT v.vec_id,
         |       COALESCE(c.canonical_id, v.vec_id) AS canonical_id,
         |       COALESCE(c.canonical_id, v.vec_id) = v.vec_id AS is_canonical
         |FROM v LEFT JOIN canon c ON c.node = v.vec_id""".stripMargin) { (s, d) =>
      // the one legitimate all-pairs caller: this IS the oracle
      // baseline, so it opts in explicitly past the O(n²) guard
      graft.ext.Dedup.cosineCanonical(Tables.embeddings(s, d),
        allowExactAllPairs = true)
    },

    // Embedding-cosine near-dup dedup, LSH path: AND-amplified BRP
    // bucket-collision candidates -> exact cosine verify -> same
    // closure, at the REAL near-dup threshold (0.9 — see
    // Dedup.cosineCanonicalLsh on why lower thresholds are
    // un-prunable). r10: LAZY oracle — the seed-42 planes are pure
    // functions of (dim, numTables, m), so Verify inlines all 12·m of
    // them and DuckDB reproduces the m-wide AND-amplified bucket key
    // EXACTLY, including the JVM's wrapping-long fold
    // key = key·1000003 + floor(proj/bl): HUGEINT arithmetic with an
    // explicit signed mod-2^64 at each step. Candidates, cosine verify
    // and the component closure then hash-match bit-for-bit. The
    // fixture plants no embedding near-dups, so the output is the
    // identity map; recall-1.0 + ~1%-candidate-fraction behavior is
    // proven in DedupSpec on a corpus WITH planted near-dups.
    QueryDef.lazyOracle("emb_dedup_lsh") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val m = graft.ext.Similarity.autoHashesPerTable(emb.count())
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val planes = graft.ext.Similarity.lshPlanes(dim, 12, m)
      s"""WITH RECURSIVE ${VecOracle.brpPlanesValues(planes)},
         |src AS (SELECT vec_id, embedding AS ev FROM embeddings),
         |${VecOracle.brpBucketCtes("src", 0.15, "c")},
         |cand AS (
         |  SELECT DISTINCT l.vec_id AS va, r.vec_id AS vb
         |  FROM cbk l JOIN cbk r
         |    ON l.tbl = r.tbl AND l.h = r.h AND l.vec_id < r.vec_id),
         |${VecOracle.normCte("src", "vv")},
         |pr AS (
         |  SELECT cand.va, cand.vb
         |  FROM cand JOIN vv a2 ON a2.vec_id = cand.va
         |            JOIN vv b3 ON b3.vec_id = cand.vb
         |  WHERE ${VecOracle.cosExpr("a2", "b3")} >= 0.9),
         |edges AS (SELECT va AS x, vb AS y FROM pr
         |          UNION ALL SELECT vb, va FROM pr),
         |reach AS (
         |  SELECT x AS node, x AS r FROM edges
         |  UNION
         |  SELECT e2.x AS node, reach.r AS r
         |  FROM edges e2 JOIN reach ON e2.y = reach.node),
         |canon AS (SELECT node, MIN(r) AS canonical_id FROM reach GROUP BY node)
         |SELECT v.vec_id,
         |       COALESCE(c.canonical_id, v.vec_id) AS canonical_id,
         |       COALESCE(c.canonical_id, v.vec_id) = v.vec_id AS is_canonical
         |FROM embeddings v LEFT JOIN canon c ON c.node = v.vec_id""".stripMargin
    } { (s, d) =>
      graft.ext.Dedup.cosineCanonicalLsh(Tables.embeddings(s, d))
        .orderBy("vec_id")
    },

    // Brute-force cosine top-k: |Q|=5 query vectors broadcast against the
    // corpus, rank inside each query partition. The exact-recall oracle for
    // the LSH path; linear in corpus size.
    QueryDef(
      "emb_cosine_topk",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
        |p AS (
        |  SELECT qid, cid,
        |         list_reduce(list_transform(range(1, len(qe) + 1),
        |             i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), (a, b) -> a + b)
        |           / (sqrt(list_reduce(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
        |            * sqrt(list_reduce(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))) AS cos_sim
        |  FROM q, c WHERE qid <> cid)
        |SELECT qid, cid, cos_sim, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT qid, cid, cos_sim,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
        |  FROM p) WHERE rn <= 10""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      def norm(a: org.apache.spark.sql.Column) =
        sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, v) => acc + v))
      val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("cid"))
      broadcast(q).join(c, col("qid") =!= col("cid"))
        .withColumn("cos_sim", dot(col("qe"), col("ce")) / (norm(col("qe")) * norm(col("ce"))))
        .select(col("qid"), col("cid"), col("cos_sim"),
          row_number().over(w).cast("bigint").as("rn"))
        .filter(col("rn") <= 10)
    },

    // Maximum inner-product search top-k (r14, part 3): the retrieval
    // scoring for DOT-PRODUCT-trained embeddings (two-tower recommender
    // / DPR-style retrievers), where the un-normalized score is the
    // model's ranking function and cosine would re-rank it wrongly.
    // Brute-force exact here (the recall oracle); at ANN scale MIPS
    // reduces to cosine via the augmented dimension x -> [x,
    // sqrt(M^2-|x|^2)] (Bachrach et al. RecSys'14) and rides the same
    // IVF machinery. The dot fold is index-ordered on both engines
    // (zip_with/aggregate ≡ list_reduce), so scores are bit-identical.
    QueryDef(
      "emb_mips_topk",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
        |p AS (
        |  SELECT qid, cid,
        |         list_reduce(list_transform(range(1, len(qe) + 1),
        |             i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)), (a, b) -> a + b) AS dot
        |  FROM q, c WHERE qid <> cid)
        |SELECT qid, cid, dot, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT qid, cid, dot,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rn
        |  FROM p) WHERE rn <= 10""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("cid"))
      broadcast(q).join(c, col("qid") =!= col("cid"))
        .withColumn("dot", dot(col("qe"), col("ce")))
        .select(col("qid"), col("cid"), col("dot"),
          row_number().over(w).cast("bigint").as("rn"))
        .filter(col("rn") <= 10)
    },

    // Per-label centroid: posexplode + decimal-exact dimension sums — the
    // shuffle is on (label, dim), 640 keys, scales to any corpus size.
    QueryDef(
      "emb_centroid_per_label",
      // Double sums are accumulation-order-dependent, and decimal casts of
      // float values round differently across engines. Folding a SORTED
      // list of doubles fixes the order on both sides -> bit-identical.
      // (At 100 TB you'd use plain sum(); this exact variant is the oracle
      // discipline for a 50-rows-per-group fixture.)
      """SELECT label, CAST(pos AS INT) AS dim,
        |       list_reduce(list_sort(list(CAST(x AS DOUBLE))), (a, b) -> a + b)
        |         / COUNT(*) AS centroid
        |FROM (
        |  SELECT label, i AS pos, embedding[i] AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i))
        |GROUP BY label, pos""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "x")))
        .select(col("label"), (col("pos0") + 1).cast("int").as("dim"), col("x"))
        .groupBy("label", "dim")
        .agg(sort_array(collect_list(col("x").cast("double"))).as("xs"),
          count(lit(1)).as("n"))
        .select(col("label"), col("dim"),
          (aggregate(col("xs"), lit(0.0), (a, b) => a + b) / col("n")).as("centroid"))
    },

    // ----------------------------------------------------------------- //
    // Multimodal plumbing                                               //
    // ----------------------------------------------------------------- //

    // Opaque binary payload + typed metadata: the schema/partitioning
    // contract for image/audio columns. Decode itself is stubbed (no media
    // libs in this container) behind MultimodalOps; here the Spark-side
    // plumbing — byte length, content hash, metadata projection — is real.
    QueryDef(
      "mm_binary_meta",
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS INT) AS payload_len,
        |       md5(text) AS payload_md5,
        |       source AS meta_source,
        |       n_chars AS meta_n_chars
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          struct(col("source"), col("n_chars")).as("meta"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("payload_len"),
          md5(col("payload")).as("payload_md5"),
          col("meta.source").as("meta_source"),
          col("meta.n_chars").as("meta_n_chars"))
    }
  )
}
