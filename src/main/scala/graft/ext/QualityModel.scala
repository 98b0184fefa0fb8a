package graft.ext

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained text-quality classifier — the fastText-style quality filter
  * every public corpus recipe runs (CCNet, Wenzek et al. 1911.00359;
  * Gopher/The Pile lineage): logistic regression over hashed
  * term-frequency features, trained to separate a REFERENCE slice of
  * the corpus (known-good sources) from the rest, then applied as a
  * per-document quality prior. The reference system has no trained
  * operators at all (samsa delegates all computation to user callbacks,
  * /root/reference/samsa/kafka/storage.py:237) — this is part of the
  * LLM-pipeline extension surface.
  *
  * Scale + determinism design:
  *  - FEATURES: the hashing trick — bucket(token) = md5-long % dim.
  *    md5 is the one hash the whole repo standardizes on because DuckDB
  *    reproduces it bit-for-bit (same idiom as doc_minhash_candidates);
  *    x_b = count_b / tokens, plus an implicit bias feature.
  *  - TRAINING ([[fit]]): batch gradient descent, each sweep ONE
  *    treeAggregate carrying (dim+1) quantized-long gradient cells —
  *    per-doc contributions floor-quantize to 1e-12 long units, so the
  *    gradient sum is exact integer arithmetic, independent of
  *    partition count and arrival order, and the trained weights are
  *    BIT-IDENTICAL run-to-run. That determinism is what lets the
  *    doc_quality_classifier lazy oracle inline the weights as literals
  *    (Verify trains twice — query side and oracle side — and both must
  *    produce the same model). Features are tokenized/hashed once and
  *    persisted sparse; no shuffle anywhere in training (the
  *    per-partition accumulator is (dim+1) longs regardless of corpus
  *    size).
  *  - SCORING ([[score]]): pure exact arithmetic, NO transcendentals —
  *    the logit (not the sigmoid) is the score, accumulated as
  *    1e-12-floor-quantized longs per (doc, bucket) term (the pageRank
  *    pattern), so DuckDB reproduces it hash-exactly from the inlined
  *    weights. Monotone in the probability, so thresholding the logit
  *    at 0 IS thresholding the sigmoid at 0.5.
  */
object QualityModel {

  /** Feature buckets. 512 keeps the inlined-weights oracle a ~513-row
    * VALUES table; raise for real corpora (weights stay driver-sized). */
  val Dim = 512

  /** Scala twin of the SQL bucket expression — MUST stay in lockstep
    * with [[bucketExpr]] and the DuckDB form
    * `CAST(concat('0x', substr(md5(tok),1,15)) AS BIGINT) % dim`:
    * first 15 hex chars of md5 (60 bits, sign-safe) as a long, mod dim.
    * The digest instance is thread-local — getInstance per token was
    * measurable at corpus scale (one allocation per token in the
    * featurize pass). */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private[graft] def bucket(tok: String, dim: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val dg = md.digest(tok.getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = 7.5 bytes: assemble the 60-bit value directly
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (dg(i) & 0xffL); i += 1 }
    h = (h << 4) | ((dg(7) & 0xf0L) >> 4)
    (h % dim).toInt
  }

  /** Spark-SQL bucket expression over a token column (the md5/conv
    * idiom proven hash-equal to DuckDB by doc_minhash_candidates).
    * Built from Column operations, not a spliced SQL string, so it is
    * correct for ANY input Column (derived expressions, qualified
    * names) — `tok.toString` only re-parsed for bare attributes
    * (ADVICE r11). */
  private def bucketExpr(tok: Column, dim: Int): Column =
    conv(substring(md5(tok.cast("binary")), 1, 15), 16, 10)
      .cast("bigint") % dim

  /** Train weights (length dim+1, bias LAST) on `docs`, where `label`
    * evaluates to the 0/1 reference flag per row. Deterministic: zero
    * init, fixed sweeps, quantized-long gradient accumulation. */
  def fit(docs: DataFrame, label: Column, dim: Int = Dim,
      iters: Int = 8, lr: Double = 1.0): Array[Double] = {
    require(dim > 0 && iters >= 1 && lr > 0)
    val sc = docs.sparkSession.sparkContext
    // tokenize + hash ONCE; persist the sparse features, not the text.
    // split(.., -1) mirrors Spark SQL's split semantics (trailing
    // empties kept) so train-side features equal score-side features.
    val feats = Spread(docs.select(col("text"), label.cast("int").as("y"))).rdd
      .map { r =>
        val toks = r.getString(0).split("\\s+", -1)
        val cnt = new java.util.TreeMap[Int, Int]() // ascending buckets
        toks.foreach { t =>
          cnt.merge(bucket(t, dim), 1, (a, b) => a + b)
        }
        val bs = new Array[Int](cnt.size)
        val xs = new Array[Double](cnt.size)
        var i = 0
        val it = cnt.entrySet().iterator()
        while (it.hasNext) {
          val e2 = it.next()
          bs(i) = e2.getKey
          xs(i) = e2.getValue.toDouble / toks.length
          i += 1
        }
        (bs, xs, r.getInt(1))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // n rides sweep 1's accumulator (one extra long cell) instead of a
    // separate count() job (r21, guide §1.2): sweep 1 starts from the
    // zero weights either way, so its gradient does not depend on n —
    // the division by n happens after the aggregate returns, when the
    // count cell is in hand. Saves the job that existed only to
    // materialize the persist.
    var n = 0L
    var w = new Array[Double](dim + 1)
    var it = 0
    while (it < iters) {
      val bc = sc.broadcast(w)
      // Each gradient cell is carried as TWO longs (hi/lo of the
      // quantized term, split at 2^31): a single long of
      // floor(err·x·1e12) wraps silently past ~9e6 docs on the bias
      // cell, which every doc touches (ADVICE r11). The split keeps
      // the sum exact to ~4e9 docs (lo) / ~2e16 (hi), and addExact in
      // seq+comb turns even that into a loud failure, never silently
      // corrupted weights.
      // layout: 2*(dim+1) hi/lo gradient cells + 1 trailing doc-count cell
      val grad = feats.treeAggregate(new Array[Long](2 * (dim + 1) + 1))(
        seqOp = { case (acc, (bs, xs, y)) =>
          val wv = bc.value
          // logit in ascending-bucket order: deterministic per doc
          var z = wv(dim) // bias
          var i = 0
          while (i < bs.length) { z += wv(bs(i)) * xs(i); i += 1 }
          val err = 1.0 / (1.0 + math.exp(-z)) - y
          def add(cell: Int, term: Double): Unit = {
            val q = math.floor(term * 1e12).toLong
            acc(2 * cell) =
              Math.addExact(acc(2 * cell), Math.floorDiv(q, 1L << 31))
            acc(2 * cell + 1) =
              Math.addExact(acc(2 * cell + 1), Math.floorMod(q, 1L << 31))
          }
          i = 0
          while (i < bs.length) { add(bs(i), err * xs(i)); i += 1 }
          add(dim, err)
          acc(2 * (dim + 1)) += 1
          acc
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
          a
        })
      bc.unpersist(blocking = false)
      if (it == 0) {
        n = grad(2 * (dim + 1))
        require(n > 0, "QualityModel.fit needs a non-empty corpus")
      }
      val next = new Array[Double](dim + 1)
      var i = 0
      while (i <= dim) {
        val g = ((BigInt(grad(2 * i)) << 31) + grad(2 * i + 1)).toDouble
        next(i) = w(i) - lr * (g / 1e12 / n); i += 1
      }
      w = next
      it += 1
    }
    feats.unpersist(blocking = false)
    w
  }

  /** Score every document with trained weights: (doc_id, logit,
    * pred_hq) — logit is the exact quantized dot product (see object
    * scaladoc), pred_hq = 1 when logit > 0. Declarative Spark SQL so
    * the inlined-weights DuckDB oracle mirrors it hash-exactly. */
  def score(docs: DataFrame, w: Array[Double]): DataFrame = {
    val spark = docs.sparkSession
    val dim = w.length - 1
    val biasQ = math.floor(w(dim) * 1e12).toLong
    val wDf = spark.createDataFrame(
      w.take(dim).zipWithIndex.map { case (wv, b) => (b.toLong, wv) }.toSeq)
      .toDF("b", "wv")
    val toks = Spread(docs).select(col("doc_id"),
      explode(split(col("text"), "\\s+")).as("tok"),
      size(split(col("text"), "\\s+")).as("t"))
    toks
      .withColumn("b", bucketExpr(col("tok"), dim))
      .groupBy("doc_id", "b", "t").agg(count(lit(1)).as("cnt"))
      .join(broadcast(wDf), "b")
      .groupBy("doc_id")
      .agg(sum(floor(col("wv") * (col("cnt").cast("double") / col("t").cast("double"))
        * lit(1.0e12)).cast(DecimalType(38, 0))).as("lq"))
      .select(col("doc_id"),
        ((col("lq") + lit(biasQ).cast(DecimalType(38, 0))).cast("double")
          / lit(1.0e12)).as("logit"))
      .withColumn("pred_hq", (col("logit") > 0).cast("int"))
  }
}
