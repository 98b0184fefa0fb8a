package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join (prefix filtering) and weighted corpus
  * sampling — round-12 additions to the curation family.
  *
  * `doc_setsim_join` is the EXACT complement of the MinHash rows: the
  * same "find all pairs with Jaccard >= t" question, answered with zero
  * false negatives/positives at sub-quadratic cost via the prefix
  * filtering principle (Chaudhuri et al. ICDE'06; Bayardo et al.
  * WWW'07 "Scaling Up All Pairs Similarity Search"). Tokens are
  * ordered by global document frequency ascending; a set with n tokens
  * keeps only its first n - ceil(t*n) + 1 (its RAREST tokens) as join
  * keys. Losslessness: if J(a,b) >= t then the smallest common token in
  * the global order lies inside BOTH prefixes (the >= ceil(t*|x|)
  * common tokens cannot all hide in a suffix shorter than that), so the
  * prefix-prefix equi-join misses no qualifying pair. All thresholds
  * are INTEGER arithmetic (t = 4/5: prefix n - floor((4n+4)/5) + 1,
  * verify 5*inter >= 4*union) — bit-identical across engines, no float
  * ceil hazard. At 100 TB: prefixes are the rarest shingles, so
  * candidate bucket sizes stay near 1 and the shingle-key shuffle cost
  * tracks the true near-dup pair count, not n^2; the df table and
  * windows shuffle on shingle/doc_id keys only.
  */
object SetSimQ {

  private val T_NUM = 4 // threshold t = T_NUM / T_DEN = 0.8
  private val T_DEN = 5

  private def toks = split(col("text"), "\\s+")

  /** [[setSimJoinImpl]] with fallback disabled: throws when the
    * candidate-mass guard trips (the spec-facing exact-only contract;
    * output schema has no `exact` column). */
  def setSimJoinExact(shIn: org.apache.spark.sql.DataFrame,
      tNum: Int, tDen: Int,
      maxCandidatePairs: Long = 100_000_000L): org.apache.spark.sql.DataFrame =
    setSimJoinImpl(shIn, tNum, tDen, maxCandidatePairs, fallbackToLsh = false)
      .drop("exact")

  /** Production entry (r13, VERDICT r12 item 1): exact PPJoin when the
    * candidate-mass probe is under budget; otherwise DEGRADE GRACEFULLY
    * to banded-MinHash candidates with the SAME exact verification —
    * zero false positives always, and the output carries an `exact`
    * flag (false on the fallback path, where recall is 1-(1-t^2b)^n_b
    * per band theory — 1-(1-0.8²·²)^4 ≈ 0.983 for the 4-band × 2-row
    * family reused from [[graft.ext.Dedup]]; measured in SCALE.md)
    * instead of refusing the job. */
  def setSimJoin(shIn: org.apache.spark.sql.DataFrame,
      tNum: Int, tDen: Int,
      maxCandidatePairs: Long = 100_000_000L): org.apache.spark.sql.DataFrame =
    setSimJoinImpl(shIn, tNum, tDen, maxCandidatePairs, fallbackToLsh = true)

  /** All pairs with Jaccard >= tNum/tDen over a (doc_id, shingle)
    * frame — EXACT, via df-ordered prefix filtering with the full
    * PPJoin pruning stack (Xiao et al. WWW'08), all lossless:
    *
    *  - prefix filter: a set keeps its n - ceil(t*n) + 1 RAREST
    *    shingles as join keys (pigeonhole on the df-ordered suffix);
    *  - length filter: J >= t forces tDen*min(|a|,|b|) >= tNum*max;
    *  - position filter: for the smallest common shingle at ranks
    *    (ra, rb), every common shingle sorts at-or-after it, so
    *    overlap <= min(na-ra, nb-rb) + 1, which must reach
    *    alpha = ceil(tNum*(na+nb)/(tNum+tDen)). A true pair's
    *    minimum-common-shingle row always satisfies this (o >= alpha
    *    and all o common shingles sit at ranks >= ra resp. rb), so
    *    per-row pruning before the pair-distinct loses nothing.
    *
    * Verification runs on per-doc sorted arrays of INT vocabulary ids
    * (GlobalRank two-pass assigns ids in global df order — vocab-sized,
    * no SinglePartition): size(array_intersect(aa, ab)) per candidate
    * pair instead of re-exploding candidate docs' shingles through a
    * pair-keyed shuffle (measured 97 s -> see SCALE.md at 10x; the
    * explode form shuffles |cand| * |doc| rows, the array form |cand|).
    * All thresholds integer arithmetic — no float-ceil hazard. */
  private def setSimJoinImpl(shIn: org.apache.spark.sql.DataFrame,
      tNum: Int, tDen: Int,
      maxCandidatePairs: Long,
      fallbackToLsh: Boolean): org.apache.spark.sql.DataFrame = {
    require(tNum > 0 && tDen >= tNum)
    // r21 (guide §2.3, the nearDupEdges discipline): every shuffle of
    // this operator downstream of the explode keys on the 8-byte
    // xxhash64 of the shingle, not the ~25-byte string — the df
    // aggregate and the vocab join move a third of the bytes. The
    // GLOBAL ORDER the prefix filter needs changes its tiebreak from
    // (df, shingle-string) to (df, shingle-hash); the losslessness
    // proof (pigeonhole over ANY fixed total order) is order-agnostic,
    // and verification is exact, so emitted pairs are identical —
    // modulo a 64-bit collision (P ≈ n²/2^65, the repo-standard bound;
    // a collision would fuse two vocab entries and the oracle hash gate
    // would catch it on the fixtures).
    val sh = shIn.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val vocab = graft.operators.GlobalRank.withGlobalRowNumber(
      sh.groupBy("shingle").agg(count(lit(1)).as("c")),
      Seq(col("c"), col("shingle")), "sid")._1
      .select(col("shingle"), col("sid"))
    // (doc_id, sid): hashes leave the pipeline here; sid order IS the
    // global (df, hash) order, so per-doc rank and sorted arrays
    // both come from the one int column
    val ids = sh.join(vocab, "shingle").select(col("doc_id"), col("sid"))
    val w = Window.partitionBy("doc_id").orderBy("sid")
    // persist RANKED, not just the prefix slice (r21, guide §2.4): the
    // guard aggregate materializes it, prefix is a filter over it (no
    // exchange), and `arrs` below aggregates it BY THE SAME doc_id key
    // the window hash-partitioned on — the cached partitioning
    // satisfies the groupBy, so the former separate `ids → arrs`
    // exchange (a full re-shuffle of every (doc_id, sid) row) is gone.
    val ranked = graft.ext.Caches.track(ids
      .withColumn("rn", row_number().over(w))
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
      .persist())
    val prefix = ranked
      .filter(col("rn") <=
        col("n_sh") - floor((col("n_sh") * tNum + (tDen - 1)) / tDen) + 1)
      .select(col("doc_id"), col("sid"), col("rn"), col("n_sh"))
    // Candidate-mass guard (the cosineCanonical maxExactRows
    // discipline): the exact join's cost is Θ(Σ bucket²) over prefix
    // buckets. On a Zipfian high-cardinality shingle vocabulary the
    // rarest-shingle prefixes keep buckets near 1 and the join tracks
    // the true near-dup mass — but on a vocabulary-DENSE corpus
    // (measured: the 30k-shingle derived fixture at 500k docs reaches
    // ~10⁹ candidate rows and fills local spill disk) the honest move
    // is a loud upfront refusal, not a mid-job OOM. One cheap
    // aggregate over the prefix rows; raise the cap to insist.
    val mass = prefix.groupBy("sid").agg(count(lit(1)).as("k"))
      .agg(coalesce(sum(col("k") * (col("k") - 1) / 2), lit(0.0))
        .cast("long").as("m"))
      .collect().head.getLong(0)
    val underBudget = mass <= maxCandidatePairs
    if (!underBudget && !fallbackToLsh) {
      throw new IllegalArgumentException(
        s"setSimJoinExact: prefix-bucket candidate mass $mass exceeds " +
        s"$maxCandidatePairs. The shingle vocabulary is too dense for an " +
        "exact threshold join at this scale — raise maxCandidatePairs to " +
        "insist, tighten the threshold, or call setSimJoin (falls back " +
        "automatically to banded-MinHash candidates, still exactly " +
        "verified, flagged exact=false).")
    }
    val cand = if (underBudget) {
      // integer ceil of tNum*(na+nb)/(tNum+tDen): floor-div on exact
      // integer-valued doubles (numerator << 2^53)
      val alpha = floor(
        (lit(tNum) * (col("na") + col("nb")) + lit(tNum + tDen - 1))
          / lit(tNum + tDen))
      prefix.as("pa")
        .join(prefix.as("pb"),
          col("pa.sid") === col("pb.sid")
            && col("pa.doc_id") < col("pb.doc_id"))
        .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"),
          col("pa.n_sh").as("na"), col("pb.n_sh").as("nb"),
          col("pa.rn").as("ra"), col("pb.rn").as("rb"))
        .filter(lit(tDen) * least(col("na"), col("nb"))
          >= lit(tNum) * greatest(col("na"), col("nb")))
        .filter(least(col("na") - col("ra"), col("nb") - col("rb")) + 1 >= alpha)
        .select("doc_a", "doc_b")
        .distinct()
    } else {
      // Fallback (VERDICT r12 item 1): candidate mass is genuinely
      // quadratic here (vocabulary-dense corpus), so route through the
      // banded-MinHash family shared with doc_lsh_verified_dedup —
      // 4 bands × 2 rows over the SAME (doc_id, shingle) rows; cost is
      // Σ bucket² over 2-long band keys, never all-pairs. The
      // verification below is unchanged and exact, so this branch can
      // only LOSE pairs (band recall ≈ 1-(1-t²)⁴ ≈ 0.983 at t=0.8 with
      // 4 bands × 2 rows/band, matching the setSimJoin scaladoc;
      // measured in SCALE.md), never emit a false positive.
      // maxBucket = 8 explicitly: this branch only fires when candidate
      // mass is already quadratic, exactly where the min-star cap's
      // bounded-recall tradeoff is the point (ADVICE r15 made the cap
      // an explicit caller decision rather than a default).
      // Signatures are built from the ORIGINAL string shingles (r21):
      // the md5/LCG band family is the oracle-reproducible contract and
      // must not see the xxhash64-narrowed keys — fallback candidates
      // stay bit-identical to every previous round.
      graft.ext.Dedup.candidatesFromSignatures(
        graft.ext.Dedup.bandSignaturesFrom(shIn.select("doc_id", "shingle")),
        maxBucket = 8)
    }
    val arrs = ranked.groupBy("doc_id")
      .agg(sort_array(collect_list(col("sid"))).as("arr"))
    cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("arr").as("aa")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("arr").as("ab")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("aa"), col("ab"))).cast("long").as("n_common"),
        size(col("aa")).cast("long").as("na"), size(col("ab")).cast("long").as("nb"))
      .filter(lit(tDen) * col("n_common") >=
        lit(tNum) * (col("na") + col("nb") - col("n_common")))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_common").cast("double")
          / (col("na") + col("nb") - col("n_common"))).as("jaccard"),
        lit(underBudget).as("exact"))
  }

  /** doc_id + exploded distinct 3-shingles (the PipelineQ tokenizer). */
  private def shingles(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.TextShingles.shingle3(toks)).as("shingle"))

  val all: Seq[QueryDef] = Seq(

    // All pairs with shingle-Jaccard >= 0.8, exactly, via df-ordered
    // prefix filtering. The oracle is the brute-force all-pairs join —
    // equality with it on real data is the losslessness proof the spec
    // asserts again on planted fixtures.
    QueryDef(
      "doc_setsim_join",
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
        |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
        |           string_split_regex(text, '\s+')[i+1] || ' ' ||
        |           string_split_regex(text, '\s+')[i+2]))) AS shingle
        |  FROM documents),
        |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |       CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common) AS jaccard
        |FROM inter
        |JOIN n na ON na.doc_id = doc_a
        |JOIN n nb ON nb.doc_id = doc_b
        |WHERE 5 * n_common >= 4 * (na.n_sh + nb.n_sh - n_common)""".stripMargin) { (s, d) =>
      setSimJoinExact(shingles(s, d), T_NUM, T_DEN)
    },

    // Fully EXACT near-dup dedup: prefix-join edges (Jaccard >= 0.8,
    // zero false negatives) -> connected components -> min-id
    // canonical per group. The exact twin of doc_lsh_verified_dedup
    // (banded MinHash candidates, probabilistic recall): same output
    // contract, provably complete edge set — the pair a pipeline runs
    // when the dedup SLO is "no near-dup survives" rather than "high
    // recall at lower cost". Oracle: brute-force pairs + recursive-CTE
    // transitive closure (the doc_dedup_pipeline pattern).
    QueryDef(
      "doc_setsim_dedup",
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(string_split_regex(text, '\s+')) - 1, 1)),
        |      i -> string_split_regex(text, '\s+')[i] || ' ' ||
        |           string_split_regex(text, '\s+')[i+1] || ' ' ||
        |           string_split_regex(text, '\s+')[i+2]))) AS shingle
        |  FROM documents),
        |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN n na ON na.doc_id = doc_a
        |  JOIN n nb ON nb.doc_id = doc_b
        |  WHERE 5 * n_common >= 4 * (na.n_sh + nb.n_sh - n_common)),
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
      val docs = Tables.documents(s, d)
      val edges = setSimJoinExact(shingles(s, d), T_NUM, T_DEN)
        .select(col("doc_a"), col("doc_b"))
      val cc = graft.ext.Dedup.connectedComponents(edges)
      docs.join(cc, docs("doc_id") === cc("node"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("canonical_id"),
          (coalesce(col("component"), col("doc_id")) === col("doc_id"))
            .as("is_canonical"))
    },

    // Weighted reservoir sample (Efraimidis–Spirtsis A-ES): global
    // top-100 docs by key u^(1/w), u a deterministic md5-derived
    // uniform, w a power-of-two length weight — so u^(1/w) is a chain
    // of IEEE-exact sqrt()s (pow/ln are NOT correctly rounded across
    // libms; sqrt is, which is what makes this row hash-exact in both
    // engines). One narrow scan + TakeOrderedAndProject: no shuffle,
    // no driver loop — the standard "sample k docs proportional to
    // weight" primitive at any corpus size.
    QueryDef(
      "doc_weighted_sample",
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN n_chars >= 2000 THEN 8 WHEN n_chars >= 1000 THEN 4
        |         WHEN n_chars >= 500 THEN 2 ELSE 1 END AS w,
        |    CAST(concat('0x', substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      / CAST(1152921504606846976 AS DOUBLE) AS u
        |  FROM documents),
        |s AS (SELECT doc_id, n_chars, w,
        |        CASE w WHEN 1 THEN u WHEN 2 THEN sqrt(u)
        |               WHEN 4 THEN sqrt(sqrt(u)) ELSE sqrt(sqrt(sqrt(u))) END AS skey
        |      FROM k)
        |SELECT doc_id, n_chars, w, skey
        |FROM s ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
      val k = Tables.documents(s, d).select(
        col("doc_id"), col("n_chars"),
        when(col("n_chars") >= 2000, 8).when(col("n_chars") >= 1000, 4)
          .when(col("n_chars") >= 500, 2).otherwise(1).as("w"),
        (conv(substring(md5(concat(lit("ws:"), col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10)
          .cast("bigint") / lit(1152921504606846976L).cast("double")).as("u"))
      k.select(col("doc_id"), col("n_chars"), col("w"),
          when(col("w") === 1, col("u"))
            .when(col("w") === 2, sqrt(col("u")))
            .when(col("w") === 4, sqrt(sqrt(col("u"))))
            .otherwise(sqrt(sqrt(sqrt(col("u"))))).as("skey"))
        .orderBy(col("skey").desc, col("doc_id"))
        .limit(100)
    }
  )
}
