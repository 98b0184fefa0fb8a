package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skyline.pareto2d: the bucketed distributed sweep must equal the
  * O(n²) brute-force dominance definition on adversarial inputs —
  * ties in cost, ties in gain, full (cost, gain) duplicates, frontiers
  * crossing bucket boundaries, and single-bucket degenerate data.
  */
class SkylineSpec extends SparkSpec {

  private def brute(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).toSet

  private def sweep(pts: Seq[(Long, Double, Int)]): Set[Long] = {
    import spark.implicits._
    Skyline.pareto2d(
        pts.toDF("k", "cost", "gain").repartition(4), "k", "cost", "gain")
      .collect().map(_.getLong(0)).toSet
  }

  test("random frontiers: sweep == brute force (1000 seeded points)") {
    val r = new scala.util.Random(42)
    val pts = (1L to 1000L).map { i =>
      // prices straddle many dollar buckets; sizes tie often
      (i, 100.0 + r.nextInt(2000) / 100.0, r.nextInt(50))
    }
    assert(sweep(pts) === brute(pts))
  }

  test("ties: equal (cost, gain) duplicates all survive; dominated ties die") {
    val pts = Seq(
      (1L, 10.0, 5), (2L, 10.0, 5),   // exact duplicates on the frontier
      (3L, 10.0, 4),                  // same cost, smaller gain: dominated
      (4L, 9.0, 5),                   // cheaper, same gain: dominates 1,2
      (5L, 11.0, 6), (6L, 12.0, 6))   // 6 dominated by 5 (same gain, dearer)
    val got = sweep(pts)
    assert(got === brute(pts))
    assert(got === Set(4L, 5L), s"expected {4,5}, got $got")
  }

  test("single bucket: all points share one floor(cost)") {
    val r = new scala.util.Random(7)
    val pts = (1L to 200L).map(i => (i, 50.0 + r.nextInt(100) / 1000.0, r.nextInt(20)))
    assert(sweep(pts) === brute(pts))
  }

  test("anti-correlated worst case: everything on the frontier") {
    // each point is dearer AND higher-gain than the previous: no point
    // dominates any other, the skyline is the whole set
    val pts = (1L to 100L).map(i => (i, 100.0 + i, i.toInt))
    assert(sweep(pts) === brute(pts))
    assert(sweep(pts).size === 100)
  }
}
