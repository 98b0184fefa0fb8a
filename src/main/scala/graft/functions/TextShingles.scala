package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Word 3-gram shingling as a compiled Scala UDF — shared by the dedup
  * family (MinHash vectors, n-gram Jaccard, banded-LSH candidates).
  *
  * Why a UDF and not the `transform(sequence(...))` HOF: Spark evaluates
  * higher-order-function lambdas interpreted, per element. Profiling at
  * sf0.1 showed ~27 µs per shingle (6.7 s for 260 k shingles) vs 0.7 s
  * for this compiled per-row loop — a 9x win on the dedup family's
  * hottest input, and it compounds because ml pipelines re-evaluate the
  * un-cached input on every pass. Output is bit-identical to
  * `array_distinct(transform(sequence(1, greatest(size(toks)-2, 0)),
  * i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))` including
  * first-seen order, so DuckDB oracles are unaffected (verified 0
  * mismatching rows over sf0.1).
  */
object TextShingles {
  private val shingle3Udf = udf { (toks0: Seq[String]) =>
    if (toks0 == null || toks0.length < 3) Array.empty[String]
    else {
      // bulk-copy first: the Seq a UDF receives indexes in linear time
      // in this Spark version, and this loop reads 3 positions per
      // shingle over every doc in every dedup pass
      val toks = toks0.toArray
      val seen = new scala.collection.mutable.LinkedHashSet[String]
      val sb = new StringBuilder
      var i = 0
      while (i <= toks.length - 3) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
        seen += sb.toString
        i += 1
      }
      seen.toArray
    }
  }

  /** Distinct word 3-grams of `tokens` (array<string>), first-seen order. */
  def shingle3(tokens: Column): Column = shingle3Udf(tokens)

  private val kgram8Udf = udf { (toks0: Seq[String]) =>
    val k = 8
    if (toks0 == null || toks0.length < k) Array.empty[String]
    else {
      val toks = toks0.toArray // linear-indexed UDF Seq — copy once
      val out = new Array[String](toks.length - k + 1)
      val sb = new StringBuilder
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      out
    }
  }

  /** ALL word 8-grams of `tokens`, in position order (index i = 0-based
    * start offset — `posexplode` recovers the offset). NOT deduplicated:
    * the span-dedup merge needs every occurrence. Same compiled-UDF
    * rationale as [[shingle3]]; output bit-identical to
    * `transform(sequence(0, size(toks)-8), i -> array_join(slice(toks,
    * i+1, 8), ' '))` (empty when size < 8). */
  def kgram8(tokens: Column): Column = kgram8Udf(tokens)

  private val chargram2Udf = udf { (s: String) =>
    if (s == null || s.length < 2) Array.empty[String]
    else {
      val out = new Array[String](s.length - 1)
      var i = 0
      while (i < s.length - 1) { out(i) = s.substring(i, i + 2); i += 1 }
      out
    }
  }

  /** ALL character bigrams of a string, in position order, NOT
    * deduplicated (the langid feature counts need every occurrence).
    * Bit-identical to DuckDB's `list_transform(range(1, len(s)),
    * i -> substr(s, i, 2))` for BMP text (both index by UTF-16 unit /
    * codepoint respectively, which agree off the astral planes — the
    * corpus fixtures and the langid oracle are ASCII). Compiled-UDF
    * rationale as [[shingle3]]: the HOF form is interpreted per
    * element and a 250-char doc has ~250 of them. */
  def chargrams2(text: Column): Column = chargram2Udf(text)
}
