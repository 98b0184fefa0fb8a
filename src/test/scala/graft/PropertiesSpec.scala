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
}
