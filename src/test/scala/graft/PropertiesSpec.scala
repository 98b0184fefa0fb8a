package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.rng.Seed
import org.scalacheck.Gen

/** Algebraic-law property tests (SURVEY §5.2): filter fusion, union
  * cardinality, last-wins permutation invariance (samsa's upsert semantics,
  * /root/reference/samsa/db/sqldb.py:40-64), dedup idempotence.
  */
class PropertiesSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf()).cache()

  test("filter fusion: filter(p).filter(q) == filter(p && q)") {
    val p = col("l_quantity") > 25
    val q = col("l_discount") < 0.05
    val a = li.filter(p).filter(q).count()
    val b = li.filter(p && q).count()
    assert(a == b)
  }

  test("union cardinality: |A union B| == |A| + |B|") {
    val a = li.filter(col("l_returnflag") === "A")
    val b = li.filter(col("l_returnflag") === "R")
    assert(a.union(b).count() == a.count() + b.count())
  }

  test("distinct idempotence: distinct.distinct == distinct") {
    val d1 = li.select("l_returnflag", "l_linestatus").distinct()
    assert(d1.distinct().count() == d1.count())
  }

  test("last-wins is permutation-invariant (upsert semantics)") {
    import spark.implicits._
    // replaying any permutation of same-key updates ends in the value with
    // the highest (seq) — samsa's R17 upsert, batch row_number form.
    val updates = Seq(
      ("k1", "a", 1L), ("k1", "b", 2L), ("k1", "c", 3L),
      ("k2", "x", 1L), ("k2", "y", 2L))
    // 10 scalacheck-seeded permutations, all must converge to the same state
    val gen = Gen.const(updates).map(u => scala.util.Random.shuffle(u))
    (1 to 10).foreach { i =>
      val perm = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val df = perm.toDF("key", "value", "seq")
      val w = Window.partitionBy("key").orderBy(col("seq").desc)
      val last = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("key", "value")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(last == Map("k1" -> "c", "k2" -> "y"), s"perm $i: $perm -> $last")
    }
  }

  test("dropDuplicates produces one row per key") {
    val d = li.dropDuplicates("l_orderkey")
    assert(d.count() == li.select("l_orderkey").distinct().count())
  }

  test("inner join with duplicate keys multiplies matches") {
    import spark.implicits._
    val a = Seq((1, "a1"), (1, "a2"), (2, "a3")).toDF("k", "av")
    val b = Seq((1, "b1"), (1, "b2")).toDF("k", "bv")
    assert(a.join(b, "k").count() == 4) // 2x2 for k=1
  }

  test("histogram-derived curation metrics are token-permutation invariant") {
    // entropy, TTR, top-unigram-frac, fingerprint-of-sorted-tokens are
    // functions of the token MULTISET — a seeded shuffle of every doc's
    // tokens must leave them bit-identical. Run the actual registry
    // queries against a shuffled-twin fixture dir to test the shipped
    // expressions, not a re-derivation.
    val shuffleTokens = udf { (text: String, docId: Long) =>
      val t = text.split("\\s+")
      val r = new java.util.Random(docId * 2654435761L + 17)
      var i = t.length - 1
      while (i > 0) {
        val j = r.nextInt(i + 1)
        val tmp = t(i); t(i) = t(j); t(j) = tmp
        i -= 1
      }
      t.mkString(" ")
    }
    val dir = java.nio.file.Files.createTempDirectory("perm-docs").toString
    Tables.documents(spark, sf())
      .withColumn("text", shuffleTokens(col("text"), col("doc_id")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def metric(name: String, d: String): Map[Long, String] =
      SparkEntry.queries(name)(spark, d)
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).mkString("|")).toMap

    for (q <- Seq("doc_token_entropy", "doc_token_stats")) {
      val base = metric(q, sf())
      val perm = metric(q, dir)
      assert(base.keySet == perm.keySet)
      val diff = base.collect { case (id, v) if perm(id) != v => id }
      assert(diff.isEmpty, s"$q changed under permutation for docs ${diff.take(3)}")
    }
    // top_unigram_frac is multiset-derived; bigram/run metrics are NOT —
    // assert only the invariant column of doc_repetition
    val baseTop = SparkEntry.queries("doc_repetition")(spark, sf())
      .select("doc_id", "top_unigram_frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val permTop = SparkEntry.queries("doc_repetition")(spark, dir)
      .select("doc_id", "top_unigram_frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(baseTop == permTop, "top_unigram_frac changed under permutation")
  }

  test("cosine_sim is symmetric, bounded, and 1.0 on itself") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf()).limit(50)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .select(expr("cosine_sim(ea, eb)").as("ab"), expr("cosine_sim(eb, ea)").as("ba"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(ab == ba, s"asymmetric: $ab vs $ba")
      assert(ab >= -1.0000001 && ab <= 1.0000001, s"out of range: $ab")
    }
    emb.select(expr("cosine_sim(embedding, embedding)").as("s")).collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("funnel laws: counts are monotone non-increasing and window-bounded") {
    // on the real fixture: step counts can only shrink down the funnel,
    // and the windowed variant can never beat the unbounded one
    val d = sf("sf0.01")
    val un = SparkEntry.queries("evt_funnel")(spark, d)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val wi = SparkEntry.queries("evt_funnel_windowed")(spark, d)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(un(1) >= un(2) && un(2) >= un(3), un.toString)
    assert(wi(1) >= wi(2) && wi(2) >= wi(3), wi.toString)
    (1 to 3).foreach(s => assert(wi(s) <= un(s), s"step $s: $wi vs $un"))
    // step 1 has no window/order constraint — identical by construction
    assert(wi(1) == un(1))
  }

  test("retention laws: offset-0 counts every user exactly once") {
    val d = sf("sf0.01")
    val rows = SparkEntry.queries("evt_retention_cohort")(spark, d)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    // every user is active in their own first week -> the offset-0 cells
    // partition the user set
    val users = Tables.events(spark, d).select("user_id").distinct().count()
    assert(rows.filter(_._2 == 0).map(_._3).sum == users)
    assert(rows.forall(_._2 >= 0), "no activity before a user's first week")
    // no offset cell can exceed its cohort's size
    val cohort = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    rows.foreach { case (w, _, n) => assert(n <= cohort(w), s"$w: $n > ${cohort(w)}") }
  }

  test("gap-fill laws: dense hourly calendar, LOCF carries, anchors agree") {
    val d = sf("sf0.01")
    val rows = SparkEntry.queries("ts_gapfill_interp")(spark, d)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getBoolean(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (et, g) =>
      val s = g.sortBy(_._2)
      // dense hourly calendar, closed by real observations on both ends
      assert(s.sliding(2).forall(p => p(1)._2 - p(0)._2 == 3600L * 1000))
      assert(!s.head._3 && !s.last._3, s"$et: span ends must be anchors")
      s.sliding(2).foreach { case Array(prev, cur) =>
        if (cur._3) assert(cur._4 == prev._4, s"$et: LOCF must carry") // gap
        else assert(cur._4 == cur._5, s"$et: anchor locf == interp")
      }
    }
  }

  test("ohlc laws: low <= open/close <= high, volumes partition the table") {
    val d = sf("sf0.01")
    val rows = SparkEntry.queries("ts_resample_ohlc")(spark, d)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6)))
    rows.foreach { case (open, high, low, close, _) =>
      assert(low <= open && open <= high)
      assert(low <= close && close <= high)
    }
    assert(rows.map(_._5).sum == Tables.events(spark, d).count())
  }

  test("merge laws: ops match the cutoff side, tombstones never surface") {
    val d = sf("sf0.01")
    // cur_ts is TIMESTAMP_NTZ (events.ts reads as NTZ and max/max_by
    // preserve it), so compare in-plan against an NTZ literal instead
    // of collecting JVM timestamp classes
    val m = SparkEntry.queries("etl_merge_upsert")(spark, d).cache()
    val cut = lit("2024-01-21 00:00:00").cast(m.schema("cur_ts").dataType)
    assert(m.count() == m.select("user_id").distinct().count(), "one row per key")
    assert(m.filter(col("cur_type") === "error").count() == 0, "tombstone surfaced")
    assert(m.filter(col("op") === "keep" && col("cur_ts") >= cut).count() == 0,
      "keep from post-cutoff")
    assert(m.filter(col("op") =!= "keep" && col("cur_ts") < cut).count() == 0,
      "update/insert from pre-cutoff")
    m.unpersist()
  }

  test("profiler is projection-consistent: profile(T.select(c)) rows match profile(T)") {
    val docs = Tables.documents(spark, sf())
    val full = graft.queries.ProfileQ.profile(docs)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val sub = graft.queries.ProfileQ.profile(docs.select("doc_id", "source"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(sub.keySet == Set("doc_id", "source"))
    sub.foreach { case (c, stats) => assert(stats == full(c), s"column $c drifted") }
  }

  test("set-sim prefix join is lossless on random DENSE corpora (scalacheck)") {
    import spark.implicits._
    // the adversarial regime from SCALE.md: a tiny vocabulary makes
    // every prefix bucket collide — exactly where a buggy prefix bound
    // would silently drop pairs. 8 seeded corpora (20 docs × 4-12
    // tokens from a 15-token vocab), 2 thresholds each, prefix join
    // must equal the brute-force all-pairs result EXACTLY.
    val vocabGen = Gen.choose(0, 14).map(i => s"w$i")
    (1 to 8).foreach { seedI =>
      val params = Gen.Parameters.default
      val docs = (0 until 20).map { d =>
        val n = Gen.choose(4, 12)
          .apply(params, Seed(seedI * 1000L + d)).get
        val toks = (0 until 3 * n).map(t =>
            vocabGen.apply(params, Seed(seedI * 100000L + d * 100L + t)).get)
          .distinct.take(n)
        (d.toLong, toks)
      }
      val sh = docs.toDF("doc_id", "sh")
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
      for ((tn, td) <- Seq((4, 5), (1, 2))) {
        val got = graft.queries.SetSimQ.setSimJoinExact(sh, tn, td)
          .select("doc_a", "doc_b", "n_common").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        // brute force over the same frame
        val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val want = sh.as("a").join(sh.as("b"),
            col("a.shingle") === col("b.shingle")
              && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_common"))
          .join(n.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
          .join(n.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
          .filter(lit(td) * col("n_common") >=
            lit(tn) * (col("na") + col("nb") - col("n_common")))
          .select("doc_a", "doc_b", "n_common").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == want,
          s"seed=$seedI t=$tn/$td: missing=${want -- got} extra=${got -- want}")
        spark.catalog.clearCache(); graft.ext.Caches.releaseAll(spark)
      }
    }
  }
}
