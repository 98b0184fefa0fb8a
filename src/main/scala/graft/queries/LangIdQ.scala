package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Trained language identification (r14, VERDICT r12 item 4) — the
  * fastText-langid stage every public corpus recipe (CCNet 1911.00359,
  * C4) runs before quality filtering, as a first-class oracle-paired
  * row. Training happens ON THE CLUSTER via
  * [[graft.ext.LangIdModel.fit]] (one treeAggregate per softmax sweep,
  * split-long 1e-12-quantized gradients, bit-identical weights across
  * partitionings — gated by LangIdSpec's planted multilingual corpus);
  * the lazy oracle inlines the trained weights as literals and
  * hash-checks the SCORING arithmetic end-to-end: hashed char-bigram
  * frequencies, per-class exact DECIMAL logits, argmax by integer
  * comparison with class-index tie-break. No transcendental crosses
  * the engine boundary.
  */
object LangIdQ {

  private val Dim = graft.ext.LangIdModel.Dim

  val all: Seq[QueryDef] = Seq(

    QueryDef.lazyOracle("doc_langid_trained") { (s, d) =>
      val docs = Tables.documents(s, d)
      val (classes, w) = graft.ext.LangIdModel.fit(docs)
      val wRows = (for {
        (cw, k) <- w.zipWithIndex
        b <- 0 until Dim
      } yield s"($k, $b, ${VecOracle.dbl(cw(b))})").mkString(",\n    ")
      val cRows = classes.zipWithIndex.map { case (lang, k) =>
        s"($k, '$lang', ${math.floor(w(k)(Dim) * 1e12).toLong})"
      }.mkString(",\n    ")
      s"""WITH w AS (SELECT CAST(k AS INT) AS k, CAST(b AS BIGINT) AS b, wv
         |  FROM (VALUES
         |    $wRows) AS _w(k, b, wv)),
         |cls AS (SELECT CAST(k AS INT) AS k, lang,
         |               CAST(bq AS DECIMAL(38,0)) AS bq
         |  FROM (VALUES
         |    $cRows) AS _c(k, lang, bq)),
         |ng AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(text)),
         |                               i -> substr(text, i, 2))) AS g,
         |         len(text) - 1 AS t
         |  FROM documents WHERE len(text) >= 2),
         |bt AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)
         |           % $Dim AS b,
         |         t, COUNT(*) AS cnt
         |  FROM ng GROUP BY doc_id, b, t),
         |lq AS (
         |  SELECT bt.doc_id, w.k,
         |         SUM(CAST(FLOOR(w.wv *
         |             (CAST(bt.cnt AS DOUBLE) / CAST(bt.t AS DOUBLE))
         |             * 1e12) AS DECIMAL(38,0))) AS l
         |  FROM bt JOIN w ON w.b = bt.b
         |  GROUP BY bt.doc_id, w.k),
         |sc AS (
         |  SELECT lq.doc_id, cls.lang AS pred_lang,
         |         CAST(lq.l + cls.bq AS DOUBLE) / 1e12 AS logit,
         |         ROW_NUMBER() OVER (PARTITION BY lq.doc_id
         |                            ORDER BY lq.l + cls.bq DESC, lq.k) AS rn
         |  FROM lq JOIN cls ON cls.k = lq.k)
         |SELECT s.doc_id, d.lang, s.pred_lang, s.logit,
         |       CAST(s.pred_lang = d.lang AS INT) AS hit
         |FROM sc s JOIN documents d ON d.doc_id = s.doc_id
         |WHERE s.rn = 1
         |ORDER BY s.doc_id""".stripMargin
    } { (s, d) =>
      val docs = Tables.documents(s, d)
      val (classes, w) = graft.ext.LangIdModel.fit(docs)
      graft.ext.LangIdModel.score(docs, classes, w)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("pred_lang"), col("logit"),
          (col("pred_lang") === col("lang")).cast("int").as("hit"))
        .orderBy("doc_id")
    }
  )
}
