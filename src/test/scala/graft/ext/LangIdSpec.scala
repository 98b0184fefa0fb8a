package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trainer gates for the multiclass char-bigram langid — the half of
  * doc_langid_trained the lazy oracle can't check (the oracle
  * hash-verifies SCORING with inlined weights; these verify the
  * trained model actually identifies languages and is bit-stable).
  * The registry fixture's lang labels are synthetic (token
  * distributions identical across langs), so discrimination power is
  * pinned HERE on a corpus whose classes genuinely differ in
  * character statistics. */
class LangIdSpec extends SparkSpec {

  // four planted "languages" with distinct character inventories —
  // the char-bigram analogue of QualityModelSpec's two vocabularies
  private val vocabs = Map(
    "aa" -> Array("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "with", "and"),
    "bb" -> Array("der", "schnelle", "braune", "fuchs", "springt", "ueber", "faulen", "hund", "und", "mit"),
    "cc" -> Array("le", "renard", "brun", "rapide", "saute", "par", "dessus", "chien", "paresseux", "avec"),
    "dd" -> Array("zorro", "marron", "salta", "sobre", "perro", "perezoso", "con", "muy", "rapido", "los"))

  private def plantedDocs(nPerLang: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val langs = vocabs.keys.toSeq.sorted
    (for {
      (lang, li) <- langs.zipWithIndex
      i <- 0 until nPerLang
    } yield {
      val v = vocabs(lang)
      val len = 8 + rnd.nextInt(25)
      val text = Array.fill(len)(v(rnd.nextInt(v.length))).mkString(" ")
      ((li * nPerLang + i).toLong, text, lang)
    }).toDF("doc_id", "text", "lang")
  }

  test("fit + score identify planted languages with high accuracy") {
    val docs = plantedDocs(50)
    val (classes, w) = LangIdModel.fit(docs)
    assert(classes.toSeq === Seq("aa", "bb", "cc", "dd"))
    assert(w.length === 4 && w.forall(_.length === LangIdModel.Dim + 1))
    val scored = LangIdModel.score(docs, classes, w)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "pred_lang", "lang").collect()
    assert(scored.length === 200)
    val wrong = scored.count(r => r.getString(1) != r.getString(2))
    assert(wrong <= 10, s"$wrong/200 misclassified on distinct char inventories")
  }

  test("fit is bit-deterministic across partitionings (lazy-oracle contract)") {
    val docs = plantedDocs(20)
    val (c1, w1) = LangIdModel.fit(docs.repartition(3))
    val (c2, w2) = LangIdModel.fit(docs.repartition(11))
    assert(c1.toSeq === c2.toSeq)
    assert(w1.map(_.toSeq).toSeq === w2.map(_.toSeq).toSeq)
  }

  test("chargrams2 UDF matches the HOF/DuckDB substring form") {
    import spark.implicits._
    val texts = Seq("abcd", "xy", "q", "", "hello world").toDF("text")
    val got = texts.select(col("text"),
        graft.functions.TextShingles.chargrams2(col("text")).as("u"))
      .withColumn("h", expr(
        "CASE WHEN length(text) < 2 THEN array() ELSE transform(sequence(1, length(text)-1), i -> substring(text, i, 2)) END"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"mismatch for '${r.getString(0)}'")
    }
  }

  test("argmax tie-break is the smallest class index") {
    import spark.implicits._
    // two classes with IDENTICAL weights -> equal logits on any doc;
    // the emitted prediction must be the k=0 class deterministically
    val docs = Seq((1L, "aaaa", "x1"), (2L, "bbbb", "x2")).toDF("doc_id", "text", "lang")
    val w = Array.fill(2)(Array.fill(LangIdModel.Dim + 1)(0.25))
    val out = LangIdModel.score(docs, Array("x1", "x2"), w).collect()
    assert(out.forall(_.getAs[String]("pred_lang") == "x1"))
  }
}
