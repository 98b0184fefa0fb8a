package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained language identifier — the fastText-langid shape (Joulin et
  * al. 1607.01759; the model CCNet 1911.00359 and C4 run BEFORE quality
  * filtering): multinomial logistic regression over hashed character
  * n-gram frequencies. Multiclass sibling of [[QualityModel]] (which
  * the reference system cannot express at all — samsa delegates
  * computation to user callbacks, /root/reference/samsa/kafka/
  * storage.py:237); same determinism contract so the registry row's
  * lazy oracle can inline the trained weights as literals.
  *
  * Scale + determinism design (inherited from [[QualityModel]], see
  * its scaladoc for the full rationale):
  *  - FEATURES: character bigrams (every occurrence), hashed
  *    md5-long % dim (the one hash DuckDB reproduces bit-for-bit),
  *    x_b = count_b / (len(text)-1), plus an implicit bias feature.
  *  - TRAINING ([[fit]]): batch softmax gradient descent; each sweep
  *    ONE treeAggregate carrying K*(dim+1) gradient cells as split
  *    hi/lo quantized longs (floor(err·x·1e12), exact integer sums,
  *    `Math.addExact` fail-loud) — weights are BIT-IDENTICAL across
  *    partition counts and run-to-run, so Verify can train twice
  *    (query side + oracle side) and agree.
  *  - SCORING ([[score]]): per-class logits as exact 1e-12-quantized
  *    DECIMAL sums, argmax by integer comparison with class-index
  *    tie-break — NO transcendentals cross the engine boundary
  *    (softmax is monotone per-class, so decimal-logit argmax IS the
  *    probability argmax).
  *
  * At 100 TB: training state is K*(dim+1) longs per partition
  * regardless of corpus size (one treeAggregate per sweep, no
  * shuffle); scoring is a narrow scan -> hash -> two partial
  * aggregates with a broadcast weights join — the same shape as the
  * quality classifier, linear in corpus bytes.
  */
object LangIdModel {

  /** Feature buckets per class. 256 keeps the inlined-weights oracle a
    * K*257-row VALUES table; raise for real corpora. */
  val Dim = 256

  /** Train a K-class model on `docs` (needs `text` and `lang`
    * columns). Returns (classes in sorted order, weights[K][dim+1]
    * with bias LAST). Deterministic: zero init, fixed sweeps,
    * quantized-long gradient accumulation, class order = sorted lang
    * strings. Docs shorter than 2 chars carry no bigram and are
    * skipped (scoring drops them identically). */
  def fit(docs: DataFrame, dim: Int = Dim, iters: Int = 8,
      lr: Double = 4.0): (Array[String], Array[Array[Double]]) = {
    require(dim > 0 && iters >= 1 && lr > 0)
    val sc = docs.sparkSession.sparkContext
    val classes = docs.select("lang").na.drop().distinct()
      .collect().map(_.getString(0)).sorted
    val kOf = classes.zipWithIndex.toMap
    require(classes.nonEmpty, "LangIdModel.fit needs at least one class")
    val kk = classes.length
    val bcK = sc.broadcast(kOf)
    // tokenize + hash ONCE; persist sparse features (ascending buckets
    // so the per-doc float loop is order-deterministic)
    val feats = Spread(docs.select(col("text"), col("lang"))).rdd
      .flatMap { r =>
        val s = r.getString(0)
        if (s == null || s.length < 2) None
        else {
          val cnt = new java.util.TreeMap[Int, Int]()
          var i = 0
          while (i < s.length - 1) {
            cnt.merge(QualityModel.bucket(s.substring(i, i + 2), dim), 1,
              (a, b) => a + b)
            i += 1
          }
          val t = (s.length - 1).toDouble
          val bs = new Array[Int](cnt.size)
          val xs = new Array[Double](cnt.size)
          var j = 0
          val it = cnt.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            bs(j) = e.getKey
            xs(j) = e.getValue.toDouble / t
            j += 1
          }
          Some((bs, xs, bcK.value(r.getString(1))))
        }
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.count()
    require(n > 0, "LangIdModel.fit needs a non-empty corpus")
    val cells = kk * (dim + 1)
    var w = Array.fill(kk)(new Array[Double](dim + 1))
    var sweep = 0
    while (sweep < iters) {
      val bc = sc.broadcast(w)
      // split hi/lo longs per cell: exact to ~4e9 docs on the bias
      // cells, addExact beyond — same overflow posture as QualityModel
      val grad = feats.treeAggregate(new Array[Long](2 * cells))(
        seqOp = { case (acc, (bs, xs, y)) =>
          val wv = bc.value
          val z = new Array[Double](kk)
          var k = 0
          while (k < kk) {
            var zz = wv(k)(dim)
            var i = 0
            while (i < bs.length) { zz += wv(k)(bs(i)) * xs(i); i += 1 }
            z(k) = zz
            k += 1
          }
          // stable softmax (driver-free, per-doc deterministic)
          var m = z(0); k = 1
          while (k < kk) { if (z(k) > m) m = z(k); k += 1 }
          var sum = 0.0; val p = new Array[Double](kk); k = 0
          while (k < kk) { p(k) = math.exp(z(k) - m); sum += p(k); k += 1 }
          def add(cell: Int, term: Double): Unit = {
            val q = math.floor(term * 1e12).toLong
            acc(2 * cell) =
              Math.addExact(acc(2 * cell), Math.floorDiv(q, 1L << 31))
            acc(2 * cell + 1) =
              Math.addExact(acc(2 * cell + 1), Math.floorMod(q, 1L << 31))
          }
          k = 0
          while (k < kk) {
            val err = p(k) / sum - (if (k == y) 1.0 else 0.0)
            val base = k * (dim + 1)
            var i = 0
            while (i < bs.length) { add(base + bs(i), err * xs(i)); i += 1 }
            add(base + dim, err)
            k += 1
          }
          acc
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
          a
        })
      bc.unpersist(blocking = false)
      val next = Array.fill(kk)(new Array[Double](dim + 1))
      var k = 0
      while (k < kk) {
        var i = 0
        while (i <= dim) {
          val cell = k * (dim + 1) + i
          val g = ((BigInt(grad(2 * cell)) << 31) + grad(2 * cell + 1)).toDouble
          next(k)(i) = w(k)(i) - lr * (g / 1e12 / n)
          i += 1
        }
        k += 1
      }
      w = next
      sweep += 1
    }
    feats.unpersist(blocking = false)
    (classes, w)
  }

  /** Score every document (len >= 2): (doc_id, pred_lang, logit) —
    * logit is the predicted class's exact quantized score, argmax by
    * DECIMAL comparison with class-index tie-break. Declarative Spark
    * SQL mirroring the inlined-weights DuckDB oracle hash-exactly. */
  def score(docs: DataFrame, classes: Array[String],
      w: Array[Array[Double]]): DataFrame = {
    val spark = docs.sparkSession
    val dim = w(0).length - 1
    val wRows = for {
      (cw, k) <- w.zipWithIndex.toSeq
      b <- 0 until dim
    } yield (k, b.toLong, cw(b))
    val wDf = spark.createDataFrame(wRows).toDF("k", "b", "wv")
    val clsDf = spark.createDataFrame(
      classes.zipWithIndex.toSeq.map { case (lang, k) =>
        (k, lang, math.floor(w(k)(dim) * 1e12).toLong)
      }).toDF("k", "lang", "bq")
    val ng = Spread(docs).filter(length(col("text")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.TextShingles.chargrams2(col("text"))).as("g"),
        (length(col("text")) - 1).as("t"))
    val bt = ng
      .withColumn("b", conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10)
        .cast("bigint") % dim)
      .groupBy("doc_id", "b", "t").agg(count(lit(1)).as("cnt"))
    val lq = bt.join(broadcast(wDf), "b")
      .groupBy("doc_id", "k")
      .agg(sum(floor(col("wv") * (col("cnt").cast("double") / col("t").cast("double"))
        * lit(1.0e12)).cast(DecimalType(38, 0))).as("l"))
    val scored = lq.join(broadcast(clsDf.select(col("k"),
        col("lang").as("pred_lang"), col("bq").cast(DecimalType(38, 0)).as("bq"))), "k")
      .withColumn("lqb", col("l") + col("bq"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("lqb").desc, col("k"))))
      .filter(col("rn") === 1)
    scored.select(col("doc_id"), col("pred_lang"),
      (col("lqb").cast("double") / lit(1.0e12)).as("logit"))
  }
}
