package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-truth gates for the BPE trainer. The registry rows'
  * unrolled oracle re-derives training in SQL, so the engine-vs-engine
  * hash catches divergence — what it can't catch is BOTH being the
  * same WRONG algorithm. These pin the algorithm against hand-computed
  * classic-BPE truth, including the one genuinely subtle case: greedy
  * left-to-right application of an (a,a) self-pair over odd/even runs,
  * which the implementation expresses as run-parity window algebra
  * rather than a sequential scan. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def seqOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    df.orderBy("word", "pos").collect()
      .map(r => (r.getString(0), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("initSeq: chars plus end-of-word marker, positions dense") {
    val s = Bpe.initSeq(Bpe.wordCounts(docsOf("ab a")))
    assert(seqOf(s) == Map(
      "ab" -> Seq("a", "b", Bpe.Marker),
      "a" -> Seq("a", Bpe.Marker)))
  }

  test("pair counts are word-count weighted, overlaps included") {
    // "aaa" x2 and "ab" x1: pairs of "aaa" = (a,a) twice per occurrence
    val seq = Bpe.initSeq(Bpe.wordCounts(docsOf("aaa aaa ab")))
    val pc = Bpe.pairCounts(seq).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(pc(("a", "a")) == 4L)   // 2 adjacent pairs x wc 2
    assert(pc(("a", Bpe.Marker)) == 2L)
    assert(pc(("a", "b")) == 1L)
    assert(pc(("b", Bpe.Marker)) == 1L)
  }

  test("self-pair merge is greedy left-to-right: run parity") {
    val seq = Bpe.initSeq(Bpe.wordCounts(docsOf("aa aaa aaaa aaaaa")))
    val m = seqOf(Bpe.mergeStep(seq, "a", "a"))
    assert(m("aa") == Seq("aa", Bpe.Marker))
    assert(m("aaa") == Seq("aa", "a", Bpe.Marker))
    assert(m("aaaa") == Seq("aa", "aa", Bpe.Marker))
    assert(m("aaaaa") == Seq("aa", "aa", "a", Bpe.Marker))
  }

  test("distinct-pair merge hits every occurrence; no false merges") {
    val seq = Bpe.initSeq(Bpe.wordCounts(docsOf("abab ba cab")))
    val m = seqOf(Bpe.mergeStep(seq, "a", "b"))
    assert(m("abab") == Seq("ab", "ab", Bpe.Marker))
    assert(m("ba") == Seq("b", "a", Bpe.Marker))
    assert(m("cab") == Seq("c", "ab", Bpe.Marker))
  }

  test("train reproduces classic BPE on a hand-computed corpus") {
    // corpus: low x5, lower x2, newest x6, widest x3 — the Sennrich
    // paper's canonical example family. Hand truth for the first
    // merges: 'es' (9 = newest 6 + widest 3), then 'est' (9), then
    // 'est</w>' (9), then 'lo' (7 = low 5 + lower 2), then 'low' (7).
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val (merges, seq) = Bpe.train(docsOf(words.mkString(" ")), 5)
    assert(merges.map(m => (m._2, m._3, m._4)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", Bpe.Marker, 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    val m = seqOf(seq)
    assert(m("newest") == Seq("n", "e", "w", "est" + Bpe.Marker))
    assert(m("widest") == Seq("w", "i", "d", "est" + Bpe.Marker))
    assert(m("low") == Seq("low", Bpe.Marker))
    assert(m("lower") == Seq("low", "e", "r", Bpe.Marker))
  }

  test("train is partition-count invariant") {
    val docs = docsOf("low lower newest widest newest",
      "aaa abab newest low low widest")
    val (m1, _) = Bpe.train(docs.repartition(1), 6)
    val (m32, _) = Bpe.train(docs.repartition(32), 6)
    assert(m1 == m32)
  }

  test("train fails loud when the vocabulary exhausts before the budget") {
    val e = intercept[RuntimeException] {
      Bpe.train(docsOf("ab"), 10) // 'ab</w>' fully merges in 2 steps
    }
    assert(e.getMessage.contains("vocabulary exhausted"))
  }
}
