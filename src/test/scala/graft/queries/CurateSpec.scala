package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Behavioral checks for the curation family (the oracle hash-match is
  * the primary gate for the 5 SQL-expressible entries; emb_semdedup has
  * no DuckDB twin, so recall/precision/pruning are asserted here). */
class CurateSpec extends SparkSpec {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("semdedup: planted near-dups collapse, no false merges, pairs pruned") {
    import graft.ext.{Dedup, Similarity}
    // the fixture has no embedding near-dups (max offdiag cosine ~0.5) —
    // plant copies with small deterministic noise, as in DedupSpec
    val emb = Tables.embeddings(spark, sf()).select("vec_id", "embedding")
    val noisy = udf { (id: Long, e: Seq[Float]) =>
      val r = new java.util.Random(id)
      val scale = 0.05 * math.sqrt(e.map(x => x.toDouble * x).sum / e.length)
      e.map(x => (x + r.nextGaussian() * scale).toFloat)
    }
    val planted = emb.filter(col("vec_id") % 10 === 0).limit(50)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        noisy(col("vec_id"), col("embedding")).as("embedding"))
    val corpus = emb.union(planted)

    val sem = Dedup.semanticCanonical(corpus, threshold = 0.9, nCells = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Dedup.cosineCanonical(corpus, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // recall: SemDeDup may only miss pairs split across cell boundaries —
    // near-identical vectors almost always share a Voronoi cell
    val collapsedExact = exact.count { case (v, c) => c != v }
    val collapsedSem = sem.count { case (v, c) => c != v }
    assert(collapsedExact >= 40, s"planting failed: only $collapsedExact collapsed")
    assert(collapsedSem >= (collapsedExact * 0.9).toInt,
      s"semdedup recall too low: $collapsedSem of $collapsedExact")
    // precision is exact by construction (every edge passed the true
    // cosine test): any group semdedup forms must exist in exact too
    sem.foreach { case (v, c) =>
      if (c != v) assert(exact(v) == exact(c),
        s"false merge: $v -> $c but exact has ${exact(v)} vs ${exact(c)}")
    }
    // pruning: within-cell pair count well under all-pairs
    val n = corpus.count()
    val cellSizes = Similarity.assignCells(corpus, 16)._1
      .groupBy("cell").count().collect().map(_.getLong(1))
    val pairCost = cellSizes.map(s => s * s).sum.toDouble
    assert(pairCost < 0.25 * n * n,
      f"cell pair cost $pairCost%.0f not pruning vs ${n * n}")
  }

  test("cluster_prune: prototypes dropped, exact per-cell keep counts, all rows present") {
    import graft.ext.Similarity
    import spark.implicits._
    // three well-separated planted clusters on orthogonal axes; per
    // cluster 6 PROTOTYPES exactly on the axis (cosine-to-centroid ~1)
    // and 6 OUTLIERS tilted off-axis (lower cosine). vec_ids interleave
    // clusters so the nCells=3 seeds (first 3 by vec_id) land one per
    // cluster.
    val dim = 8
    def vec(axis: Int, tilt: Int, mag: Double): Seq[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(axis) = 1.0f
      if (mag != 0.0) a((axis + tilt) % dim) = mag.toFloat
      a.toSeq
    }
    val rows = (0 until 36).map { i =>
      val cluster = i % 3
      val slot = i / 3 // 0-5 prototypes, 6-11 outliers
      val e =
        if (slot < 6) vec(cluster, 0, 0.0)
        else vec(cluster, 3 + (slot % 3), 0.6 + 0.05 * slot)
      (i.toLong, e)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.clusterPrune(emb, pruneFrac = 0.25, nCells = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))

    // every input row appears exactly once
    assert(out.map(_._1).sorted.toSeq == (0L until 36L), out.length.toString)
    // planted clusters stay whole: each maps to exactly one cell, and
    // the three cells are distinct
    val cellOf = out.map(t => t._1 -> t._2).toMap
    val clusters = (0 until 3).map(c => (0 until 36).filter(_ % 3 == c).map(i => cellOf(i.toLong)).toSet)
    assert(clusters.forall(_.size == 1), s"planted cluster split across cells: $clusters")
    assert(clusters.flatten.toSet.size == 3, s"clusters merged into one cell: $clusters")
    // exact keep counts: ceil(12 * 0.25) = 3 dropped per cell
    val dropped = out.filter(!_._4)
    assert(dropped.length == 9, s"expected 9 dropped, got ${dropped.length}")
    assert(dropped.groupBy(_._2).values.forall(_.length == 3),
      dropped.groupBy(_._2).view.mapValues(_.length).toMap.toString)
    // the dropped rows are PROTOTYPES (on-axis, slot<6 -> id%3*? ids with i/3<6)
    assert(dropped.forall(t => (t._1 / 3) < 6),
      s"outlier dropped as prototype: ${dropped.filter(t => t._1 / 3 >= 6).toSeq}")
    // and prototypes score strictly above outliers within each cell
    val byCell = out.groupBy(_._2)
    byCell.values.foreach { cell =>
      val protoMin = cell.filter(t => t._1 / 3 < 6).map(_._3).min
      val outlMax = cell.filter(t => t._1 / 3 >= 6).map(_._3).max
      assert(protoMin > outlMax, s"prototype/outlier score overlap: $protoMin <= $outlMax")
    }
  }

  test("dsir_weight: target-slice docs score above the rest, all docs scored") {
    // the target distribution is built FROM the doc_id%25=0 slice, so its
    // own docs must look more target-like than the rest on average —
    // the directional invariant the oracle hash can't express
    val rows = q("doc_dsir_weight").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nDocs = Tables.documents(spark, sf("sf0.001")).count()
    assert(rows.length == nDocs, s"${rows.length} scored of $nDocs docs")
    val (target, rest) = rows.partition(_._1 % 25 == 0)
    val mt = target.map(_._3).sum / target.length
    val mr = rest.map(_._3).sum / rest.length
    assert(mt > mr, f"target mean $mt%.3f not above rest mean $mr%.3f")
    assert(rows.forall(_._2 > 0), "zero-token doc scored")
  }

  test("lm_perplexity: LM's own slice scores lower NLL, tertiles balanced and ordered") {
    val rows = q("doc_lm_perplexity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val nDocs = Tables.documents(spark, sf("sf0.001")).count()
    assert(rows.length == nDocs, s"${rows.length} scored of $nDocs docs")
    // the LM is trained on the doc_id%25=0 slice — its own docs must be
    // more probable (lower mean NLL) than the rest on average
    val (target, rest) = rows.partition(_._1 % 25 == 0)
    val mt = target.map(_._3).sum / target.length
    val mr = rest.map(_._3).sum / rest.length
    assert(mt < mr, f"LM slice mean NLL $mt%.3f not below rest $mr%.3f")
    // NTILE(3) contract: bucket sizes differ by <= 1 and buckets are
    // ordered by score (head = most target-like, as in CCNet §4.3)
    val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set("head", "middle", "tail"), sizes.toString)
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    assert(rows.filter(_._4 == "head").map(_._3).max <=
      rows.filter(_._4 == "tail").map(_._3).min,
      "head/tail overlap: tertiles not ordered by mean_nll")
  }

  test("mixture_temperature: rarest source keeps all, dominant sources flatten toward sqrt") {
    val rows = q("doc_mixture_temperature").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getBoolean(3)))
    val bySrc = rows.groupBy(_._1)
    val counts = bySrc.view.mapValues(_.length).toMap
    val nMin = counts.values.min
    // rarest source: keep_ppm = 1e6 -> every row kept
    val rarest = counts.minBy(_._2)._1
    assert(bySrc(rarest).forall(_._3), "rarest source lost rows")
    // every source's kept fraction tracks sqrt(n_min/n_s) (hash coin is
    // uniform; binomial tolerance at fixture sizes)
    for ((src, grp) <- bySrc) {
      val expected = math.sqrt(nMin.toDouble / grp.length)
      val got = grp.count(_._3).toDouble / grp.length
      assert(math.abs(got - expected) < 0.08,
        f"$src kept $got%.3f, expected ~$expected%.3f")
      // keep_ppm constant within a source
      assert(grp.map(_._2).distinct.length == 1)
    }
  }

  test("emb_decontaminate: planted eval copies flagged, clean corpus untouched") {
    val rows = q("emb_decontaminate").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    val (planted, clean) = rows.partition(_._1 >= 7000000L)
    assert(planted.nonEmpty, "fixture planted no eval copies")
    // planted rows are noisy copies of eval vectors — all contaminated;
    // the raw fixture has no near-dups (max offdiag cosine ~0.5), so no
    // clean row may cross the 0.9 threshold
    val missed = planted.filterNot(_._2)
    assert(missed.isEmpty, s"${missed.length} planted copies not flagged")
    val falsePos = clean.filter(_._2)
    assert(falsePos.isEmpty,
      s"${falsePos.length} clean vectors falsely flagged: ${falsePos.take(5)}")
    // every corpus row reported exactly once
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate rows")
  }

  test("scrub_redact: blocklist hits redacted, boundaries respected, counts consistent") {
    val rows = q("doc_scrub_redact")
      .join(Tables.documents(spark, sf("sf0.001")), "doc_id")
      .select("text", "scrubbed", "n_hits").collect()
    assert(rows.nonEmpty)
    val standalone = "(?:^| )(slow|big)(?: |$)".r
    rows.foreach { r =>
      val (text, scrubbed, nHits) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(standalone.findFirstIn(scrubbed).isEmpty,
        s"unredacted blocklist token in: $scrubbed")
      val expected = text.split("\\s+").count(t => t == "slow" || t == "big")
      assert(nHits == expected, s"n_hits $nHits != $expected for: $text")
    }
    // the fixture vocabulary does contain the blocklist terms
    assert(rows.exists(_.getInt(2) > 0))
  }

  test("repetition metrics are in-range and run length is real") {
    val rows = q("doc_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getDouble(1); val dup = r.getDouble(2); val run = r.getInt(3)
      assert(top > 0.0 && top <= 1.0, s"top_unigram_frac $top")
      assert(dup >= 0.0 && dup < 1.0, s"dup_bigram_frac $dup")
      assert(run >= 1, s"max_token_run $run")
    }
    // word-salad fixture repeats tokens — some doc must have a run > 1
    assert(rows.exists(_.getInt(3) > 1))
  }

  test("decontamination flags the benchmark slice's near-dups and nothing degenerate") {
    val rows = q("doc_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // benchmark docs themselves are excluded from the corpus side
    assert(rows.forall(_._1 % 25 != 0))
    // flag is exactly the threshold predicate
    rows.foreach { case (id, maxOv, nHit, flag) =>
      assert(flag == (maxOv >= 5), s"doc $id: flag $flag vs max_overlap $maxOv")
      assert((maxOv == 0) == (nHit == 0))
    }
    // the fixture's planted near-dup clusters cross the %25 boundary,
    // so contamination must actually fire
    assert(rows.exists(_._4), "no contaminated docs found — detector is dead")
    // ...and not on everything (word-salad background shares few rare shingles)
    assert(rows.count(_._4) < rows.length / 2, "detector flags half the corpus")
  }

  test("c4_filter: keep is exactly the conjunction of its flags") {
    val rows = q("doc_c4_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conj = r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)
      assert(r.getBoolean(5) == conj, s"keep != conjunction at doc ${r.getLong(0)}")
    }
  }

  test("doc_eval_contamination: containment normalizes by the eval item") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("contam").toString
    // bench (doc_id % 25 = 0): 0 fully contained in corpus doc 1;
    // 25 shares 1 of its 3 shingles with doc 2 (1/3 < 1/2 -> clean);
    // 50 overlaps nothing (no-hit row must still appear)
    Seq(
      (0L, "a b c d"), (25L, "p q r s t"), (50L, "zz yy xx ww vv"),
      (1L, "x a b c d y"), (2L, "p q r mm nn"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("doc_eval_contamination")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out(0L) === ((2L, 1L, 1000000L, 1L, true)), s"full: ${out(0L)}")
    assert(out(25L) === ((3L, 2L, 333333L, 1L, false)), s"partial: ${out(25L)}")
    assert(out(50L) === ((3L, -1L, 0L, 0L, false)), s"no-hit: ${out(50L)}")
  }
}
