package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch-level contracts for the theta TypedImperativeAggregate (the
  * registry row agg_theta_intersect_twin REQUIREs the end-to-end error
  * bound; this spec pins the aggregate mechanics). */
class ThetaSketchAggSpec extends SparkSpec {

  private def distinctEst(n: Int, parts: Int, lgK: Int = 12): Double = {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // 3 copies of every key — distinct count must still be n
    val df = (0 until 3).flatMap(_ => 0 until n).map(_.toLong)
      .toDF("k").repartition(parts)
    ThetaOps.estimate(
      df.agg(expr(s"theta_sketch(k, $lgK)")).head().getAs[Array[Byte]](0))
  }

  test("exact below 2^lgK, bounded error above, merge-order invariant") {
    // sub-capacity: theta sketch is EXACT (retains every hash)
    assert(distinctEst(1000, 8) == 1000.0)
    // duplicates across partitions collapse in the union
    assert(distinctEst(1000, 1) == distinctEst(1000, 32))
    // estimation mode: 2^12 nominal entries, ~1.6% relative error —
    // partition count (merge order/shape) must not break the bound
    for (parts <- Seq(1, 8, 32)) {
      val est = distinctEst(50000, parts)
      assert(math.abs(est - 50000) <= 0.05 * 50000,
        s"est $est at $parts partitions")
    }
  }

  test("set operations: intersection and union track exact overlap") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // A = [0, 30k), B = [20k, 50k) -> |A∩B| = 10k, |A∪B| = 50k
    val df = (0L until 50000L).toDF("k")
    val r = df.agg(
      expr("theta_sketch(CASE WHEN k < 30000 THEN k END, 12)").as("a"),
      expr("theta_sketch(CASE WHEN k >= 20000 THEN k END, 12)").as("b"))
      .head()
    val (a, b) = (r.getAs[Array[Byte]]("a"), r.getAs[Array[Byte]]("b"))
    assert(math.abs(ThetaOps.intersectEstimate(a, b) - 10000) <= 0.10 * 10000)
    assert(math.abs(ThetaOps.unionEstimate(a, b) - 50000) <= 0.05 * 50000)
    // A \ B = [0, 20k)
    assert(math.abs(ThetaOps.aNotBEstimate(a, b) - 20000) <= 0.10 * 20000)
  }

  test("null keys are skipped, empty input yields an empty sketch") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val est = ThetaOps.estimate(
      Seq[Option[Long]](Some(1L), None, Some(2L), None).toDF("k")
        .agg(expr("theta_sketch(k)")).head().getAs[Array[Byte]](0))
    assert(est == 2.0)
    val empty = ThetaOps.estimate(
      Seq.empty[Long].toDF("k")
        .agg(expr("theta_sketch(k)")).head().getAs[Array[Byte]](0))
    assert(empty == 0.0)
  }
}
