package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** BPE tokenizer training as oracle-paired registry rows (r14) — the
  * tokenizer-fitting stage of an LLM data pipeline, on-cluster via
  * [[graft.ext.Bpe]]. Unlike the trained-model rows (quality
  * classifier, langid) whose oracles inline fitted weights, these
  * oracles RECOMPUTE the training: the SQL unrolls all `NMerges`
  * greedy merge steps — per step a weighted pair count, an argmax with
  * (count DESC, left, right) tie-break, and the windowed
  * run-parity merge — so DuckDB independently derives the identical
  * merge table, segmentations, and token counts. Pure integer and
  * binary-ASCII string comparisons end to end; nothing float crosses
  * the engine boundary.
  */
object BpeQ {

  /** Fixed merge budget shared by the Spark loop and the unrolled
    * oracle. [[graft.ext.Bpe.train]] fails loud if the vocabulary
    * exhausts early — a silent stop would diverge from the oracle's
    * fixed unroll. */
  private val NMerges = 12

  /** Shared CTE prologue: corpus word counts, initial char+marker
    * sequences, then `n` unrolled merge steps s1..s{n}. */
  private def bpeChainSql(n: Int): String = {
    val base =
      """wc0 AS MATERIALIZED (
        |  SELECT word, COUNT(*) AS wc FROM (
        |    SELECT unnest(string_split_regex(text, '\s+')) AS word
        |    FROM documents) tw
        |  WHERE len(word) > 0 GROUP BY word),
        |s0 AS MATERIALIZED (
        |  SELECT word, wc, pos,
        |         CASE WHEN pos <= len(word) THEN substr(word, pos, 1)
        |              ELSE '</w>' END AS sym
        |  FROM (SELECT word, wc, unnest(range(1, len(word) + 2)) AS pos
        |        FROM wc0) tp)""".stripMargin
    val steps = (1 to n).map { s =>
      val prev = s"s${s - 1}"
      s"""p$s AS MATERIALIZED (
         |  SELECT a, b, SUM(wc) AS cnt FROM (
         |    SELECT wc, sym AS a,
         |           LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS b
         |    FROM $prev) tl
         |  WHERE b IS NOT NULL GROUP BY a, b),
         |bp$s AS MATERIALIZED (
         |  SELECT a, b, cnt FROM p$s ORDER BY cnt DESC, a, b LIMIT 1),
         |m$s AS MATERIALIZED (
         |  SELECT word, wc, pos, sym, a, b,
         |         (COALESCE(sym = a AND nxt = b, FALSE)
         |          AND (a <> b OR off % 2 = 0)) AS ms
         |  FROM (
         |    SELECT word, wc, pos, sym, nxt, a, b,
         |           pos - MIN(pos) OVER (PARTITION BY word, sym, grp) AS off
         |    FROM (
         |      SELECT sq.word, sq.wc, sq.pos, sq.sym,
         |             LEAD(sq.sym) OVER (PARTITION BY sq.word
         |                                ORDER BY sq.pos) AS nxt,
         |             sq.pos - ROW_NUMBER() OVER (PARTITION BY sq.word, sq.sym
         |                                         ORDER BY sq.pos) AS grp,
         |             bp.a, bp.b
         |      FROM $prev sq CROSS JOIN bp$s bp) tg) to_),
         |s$s AS MATERIALIZED (
         |  SELECT word, wc,
         |         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         |         CASE WHEN ms THEN a || b ELSE sym END AS sym
         |  FROM (
         |    SELECT word, wc, pos, sym, a, b, ms,
         |           COALESCE(LAG(ms) OVER (PARTITION BY word ORDER BY pos),
         |                    FALSE) AS skip
         |    FROM m$s) tk
         |  WHERE NOT skip)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  val all: Seq[QueryDef] = Seq(

    // The learned merge table itself: which pair was merged at each
    // step and its weighted corpus count at selection time — the
    // tokenizer artifact a pipeline ships. Spark trains on-cluster;
    // the oracle re-derives every step in SQL.
    QueryDef(
      "doc_bpe_train",
      s"WITH ${bpeChainSql(NMerges)}\n" +
      (1 to NMerges).map(s =>
        s"SELECT CAST($s AS INT) AS step, a AS left_sym, b AS right_sym, " +
        s"CAST(cnt AS BIGINT) AS pair_count FROM bp$s").mkString("\nUNION ALL\n") +
      "\nORDER BY step") { (s, d) =>
      val merges = graft.ext.Bpe.trainMergesCached(
        Tables.documents(s, d), NMerges, d)
      s.createDataFrame(merges).toDF("step", "left_sym", "right_sym", "pair_count")
        .orderBy("step")
    },

    // Final subword vocabulary with corpus frequencies (occurrences
    // weighted by word count) — the unigram table over the learned
    // segmentation.
    QueryDef(
      "doc_bpe_vocab",
      s"""WITH ${bpeChainSql(NMerges)}
         |SELECT sym AS token, CAST(SUM(wc) AS BIGINT) AS freq
         |FROM s$NMerges GROUP BY sym
         |ORDER BY freq DESC, token""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val seq = graft.ext.Bpe.applyMerges(docs,
        graft.ext.Bpe.trainMergesCached(docs, NMerges, d))
      seq.groupBy(col("sym").as("token")).agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("token"))
    },

    // Per-document token counts under the learned merges — the
    // "how many tokens is this corpus" accounting every training-data
    // budget needs, exact. Joins the per-word segment length back to
    // the exploded corpus; the corpus-sized side touches only
    // (doc_id, word).
    QueryDef(
      "doc_bpe_tokenize",
      s"""WITH ${bpeChainSql(NMerges)},
         |vs AS MATERIALIZED (
         |  SELECT word, COUNT(*) AS n_sym FROM s$NMerges GROUP BY word),
         |dw AS (
         |  SELECT doc_id, word FROM (
         |    SELECT doc_id,
         |           unnest(string_split_regex(text, '\\s+')) AS word
         |    FROM documents) tw
         |  WHERE len(word) > 0)
         |SELECT dw.doc_id, COUNT(*) AS n_words,
         |       CAST(SUM(vs.n_sym) AS BIGINT) AS n_tokens
         |FROM dw JOIN vs ON vs.word = dw.word
         |GROUP BY dw.doc_id
         |ORDER BY dw.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val seq = graft.ext.Bpe.applyMerges(docs,
        graft.ext.Bpe.trainMergesCached(docs, NMerges, d))
      val vs = seq.groupBy("word").agg(count(lit(1)).as("n_sym"))
      val dw = graft.ext.Spread(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
      dw.join(broadcast(vs), "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_tokens"))
        .orderBy("doc_id")
    }
  )
}
