package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Assertions for the no-oracle pipeline operators: MinHash-LSH recall
  * against exact shingle-Jaccard truth, SimHash invariance/locality, and
  * sketch error bounds (SURVEY §5.2 item 2: approx ops tested by bound,
  * not hash match).
  */
class PipelineSpec extends SparkSpec {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf())

  test("MinHash-LSH candidates: full recall of exact near-dups (jaccard >= 0.5)") {
    val cand = q("doc_minhash_candidates").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact truth from the shingle join, unblocked
    val sh = Tables.documents(spark, sf())
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, greatest(size(split(text, '\\s+')) - 2, 0)),
          |  i -> concat_ws(' ', element_at(split(text, '\\s+'), i),
          |                      element_at(split(text, '\\s+'), i + 1),
          |                      element_at(split(text, '\\s+'), i + 2)))""".stripMargin))).as("shingle"))
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("nc"))
    val truth = inter
      .join(n.withColumnRenamed("doc_id", "da").withColumnRenamed("n_sh", "na"), "da")
      .join(n.withColumnRenamed("doc_id", "db").withColumnRenamed("n_sh", "nb"), "db")
      .filter(col("nc").cast("double") / (col("na") + col("nb") - col("nc")) >= 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val missed = truth -- cand
    assert(missed.isEmpty, s"LSH missed ${missed.size}/${truth.size} true pairs: ${missed.take(5)}")
  }

  test("SimHash: identical text -> identical hash; near-dups -> small hamming distance") {
    val hashes = q("doc_simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    // doc pairs that are exact dups of text must collide exactly
    val dups = Tables.documents(spark, sf())
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .select("ids").collect().map(_.getSeq[Long](0))
    dups.foreach { ids =>
      val hs = ids.map(hashes)
      assert(hs.distinct.size == 1, s"exact dups ${ids} got differing simhashes")
    }

    // random pairs should be far apart on average (locality sanity)
    val all = hashes.values.toArray
    val rnd = new scala.util.Random(42)
    val avgRandom = (1 to 200).map { _ =>
      hamming(all(rnd.nextInt(all.length)), all(rnd.nextInt(all.length)))
    }.sum / 200.0
    assert(avgRandom > 10.0, s"random-pair hamming too low: $avgRandom")
  }

  test("hll sketch: per-group estimate within 5%; group sketches UNION to the global estimate") {
    val li = Tables.lineitem(spark, sf())
    // the registry entry REQUIREs the per-group bound in-query (r9 twin
    // pattern) and emits the exact counts — check those are truly exact
    val got = q("agg_hll_sketch").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = li.groupBy("l_returnflag")
      .agg(count_distinct(col("l_orderkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"exact_nd mismatch: $got vs $want")
    // mergeability — the 100 TB property: group sketches union into the
    // global estimate without rescanning the data
    val sk = li.groupBy("l_returnflag").agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
    val unioned = sk.agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .first().getLong(0)
    val globalExact = li.select(count_distinct(col("l_orderkey"))).first().getLong(0)
    assert(math.abs(unioned - globalExact).toDouble / globalExact < 0.05,
      s"unioned=$unioned exact=$globalExact")
  }

  test("approx_top_k: registry row equals the exact deterministic top-5") {
    // the sketch contract itself (heavy-hitter set + exact counts on a
    // low-cardinality column) is REQUIREd inside the registry query (r9
    // twin pattern); here assert the emitted frame is the exact top-5
    val got = q("agg_approx_top_k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val want = Tables.events(spark, sf()).groupBy("event_type").count()
      .orderBy(col("count").desc, col("event_type").asc).limit(5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(want.nonEmpty)
    assert(got == want, s"top-5 mismatch: $got vs $want")
  }

  test("agg_skew_kurt power-sum formulas match Spark's built-in skewness/kurtosis") {
    val ours = q("agg_skew_kurt").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val builtins = Tables.lineitem(spark, sf()).groupBy("l_returnflag")
      .agg(skewness(col("l_quantity")).as("sk"), kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    builtins.foreach { case (k, (sk, ku)) =>
      val (osk, oku) = ours(k)
      assert(math.abs(osk - sk) < 1e-9, s"$k skew: ours=$osk builtin=$sk")
      assert(math.abs(oku - ku) < 1e-9, s"$k kurt: ours=$oku builtin=$ku")
    }
  }

  test("approx_count_distinct within 10% of exact") {
    val li = Tables.lineitem(spark, sf())
    val exact = li.groupBy("l_returnflag")
      .agg(count_distinct(col("l_orderkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.10, s"$k: approx=$a exact=$e")
    }
  }

  test("percentile_approx within bound of exact percentile") {
    val li = Tables.lineitem(spark, sf())
    val exact = li.agg(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val approx = li.agg(expr("percentile_approx(l_extendedprice, 0.5)")).head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("cosine top-k: self-similarity excluded, scores in [-1,1], k respected") {
    val topk = q("emb_cosine_topk").collect()
    assert(topk.nonEmpty)
    topk.foreach { r =>
      assert(r.getLong(0) != r.getLong(1))
      val c = r.getDouble(2)
      assert(c >= -1.0000001 && c <= 1.0000001)
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 10)
    }
    // ranks strictly ordered by descending similarity per query
    topk.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2))
        case _ =>
      }
    }
  }

  test("doc_winnowing: shared >= w+k-1 token run shares a fingerprint; selective") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    // docs 1 and 2 embed the SAME 10-token run (>= w+k-1 = 8) inside
    // otherwise-disjoint text; doc 3 shares nothing with either
    val run = (1 to 10).map(i => s"shared$i").mkString(" ")
    Seq(
      (1L, s"alpha beta gamma delta $run epsilon zeta"),
      (2L, s"one two three four five six $run seven"),
      (3L, "cold warm hot cool mild dry wet damp calm windy still foggy"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = graft.SparkEntry.queries("doc_winnowing")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "the winnowing guarantee: a shared 10-token run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs must not collide")
    // selectivity: far fewer fingerprints than 4-grams (~2/(w+1) rate)
    fps.foreach { case (id, s) =>
      val nGrams = Tables.documents(spark, dir).filter(col("doc_id") === id)
        .select(size(split(col("text"), "\\s+"))).collect().head.getInt(0) - 3
      assert(s.size < nGrams, s"doc $id kept ${s.size} of $nGrams grams")
    }
  }
}
