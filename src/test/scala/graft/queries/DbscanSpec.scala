package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-truth gate for emb_dbscan_grid. The oracle hash catches
  * engine divergence; this pins the ALGORITHM against hand-built
  * density truth — separated blobs, a border point reachable from a
  * core but itself sub-threshold, and an isolated noise point —
  * including the two DBSCAN subtleties: |N(p)| counts p itself, and
  * border points take the MIN core cluster in range (the
  * deterministic refinement of the order-dependent textbook
  * assignment). All planted distances keep >10% margins from eps so
  * float->double casts cannot flip a comparison. */
class DbscanSpec extends SparkSpec {

  // fixed eps = 0.02, minPts = 4 (|N| counts self) through the
  // dbscanGrid helper — the registry row itself derives eps from the
  // corpus density (auto-knob), which would rescale planted geometry
  private def run(dirPrefix: String, pts: Seq[(Long, (Float, Float))]) = {
    import spark.implicits._
    val p = pts.map { case (id, (x, y)) => (id, x.toDouble, y.toDouble) }
      .toDF("vec_id", "x", "y")
    ClusterQ.dbscanGrid(p, eps = 0.02, minPts = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
  }

  test("planted blobs: core/border/noise roles and min-id clusters") {
    // Blob A (0-4): tight, all on the far side of the origin from the
    // border point — every member sees >= 4 neighbors -> core.
    // Blob B (10-13): 4-point blob, each sees exactly 4 -> core.
    // id 20 at (0.018, 0): within eps of A's (0,0) ONLY; |N| = 2 -> border.
    // id 30: isolated -> noise.
    val got = run("dbscan-fixture", Seq(
      0L -> ((0.000f, 0.000f)), 1L -> ((-0.004f, 0.000f)),
      2L -> ((-0.004f, 0.004f)), 3L -> ((-0.004f, -0.004f)),
      4L -> ((-0.008f, 0.000f)),
      10L -> ((0.500f, 0.500f)), 11L -> ((0.504f, 0.500f)),
      12L -> ((0.500f, 0.504f)), 13L -> ((0.496f, 0.500f)),
      20L -> ((0.018f, 0.000f)),
      30L -> ((2.000f, 2.000f))))
    (0L to 4L).foreach(i => assert(got(i) == ((0L, "core")), s"id $i: ${got(i)}"))
    (10L to 13L).foreach(i => assert(got(i) == ((10L, "core")), s"id $i: ${got(i)}"))
    assert(got(20L) == ((0L, "border")), s"border: ${got(20L)}")
    assert(got(30L) == ((-1L, "noise")), s"noise: ${got(30L)}")
  }

  test("border point between two clusters takes the min id; blobs stay unmerged") {
    // mid (id 20) is within eps of exactly one core from EACH blob
    // (|N| = 3 < minPts -> border, never a bridge): blobs must NOT
    // merge through it, and its cluster is the min of the two comps.
    val got = run("dbscan-mid", Seq(
      0L -> ((0.000f, 0.000f)), 1L -> ((-0.004f, 0.000f)),
      2L -> ((-0.004f, 0.004f)), 3L -> ((-0.004f, -0.004f)),
      10L -> ((0.036f, 0.000f)), 11L -> ((0.040f, 0.000f)),
      12L -> ((0.040f, 0.004f)), 13L -> ((0.040f, -0.004f)),
      20L -> ((0.018f, 0.000f))))
    assert((0L to 3L).forall(got(_) == ((0L, "core"))), got.toSeq.sortBy(_._1))
    assert((10L to 13L).forall(got(_) == ((10L, "core"))), got.toSeq.sortBy(_._1))
    assert(got(20L) == ((0L, "border")), s"min-cluster rule: ${got(20L)}")
  }
}
