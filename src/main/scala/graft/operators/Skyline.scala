package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D Pareto skyline (r15): rows no other row dominates on
  * (minimize `costCol`, maximize `gainCol`) — the multi-objective
  * shortlist operator (cheapest-per-capability frontier).
  *
  * The textbook definition is an O(n²) dominance anti-join (the DuckDB
  * oracle of `ext_skyline` spells exactly that); the distributed form
  * here is the bucketed sweep:
  *
  *   1. bucket by `floor(cost)` — cost-monotone, so every row of a
  *      lower bucket is STRICTLY cheaper than every row of a higher one;
  *   2. per-bucket max-gain table (TINY: cardinality = the cost domain
  *      in grid units, independent of row count) + its strictly-lower-
  *      bucket running max — the only non-keyed window in the plan, and
  *      it rides this aggregate (the GlobalRank boundary discipline);
  *   3. each row decides locally: survive iff it has the max gain at
  *      its exact cost, beats every strictly-cheaper cost in its OWN
  *      bucket, and beats the carried lower-bucket max.
  *
  * Equal (cost, gain) ties are mutually non-dominating and all survive.
  * Everything row-scaled shuffles on (bucket) or (bucket, cost); at
  * 100 TB the sweep is two keyed exchanges of the 3-column projection
  * plus one broadcast of the bucket table — the O(n²) definition never
  * materializes.
  */
object Skyline {

  /** @param df    input; only `keyCol`, `costCol`, `gainCol` are read
    * @param keyCol  passthrough identity column
    * @param costCol double column to MINIMIZE (bucketed by floor())
    * @param gainCol numeric column to MAXIMIZE
    */
  def pareto2d(df: DataFrame, keyCol: String, costCol: String,
      gainCol: String): DataFrame = {
    val p = df.select(col(keyCol), col(costCol), col(gainCol))
      .withColumn("bucket", floor(col(costCol)).cast("long"))
    val bmax = p.groupBy("bucket").agg(max(gainCol).as("bmax"))
    val wLower = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lower = bmax
      .withColumn("lower_max", max(col("bmax")).over(wLower))
      .select("bucket", "lower_max")
    val perCost = p.groupBy("bucket", costCol).agg(max(gainCol).as("pm"))
    val wCheaper = Window.partitionBy("bucket").orderBy(costCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val thresh = perCost
      .withColumn("cheaper_max", max(col("pm")).over(wCheaper))
      .join(broadcast(lower), Seq("bucket"), "left")
      .withColumn("dom_max", greatest(
        coalesce(col("cheaper_max").cast("double"), lit(Double.NegativeInfinity)),
        coalesce(col("lower_max").cast("double"), lit(Double.NegativeInfinity))))
      .select(col("bucket"), col(costCol), col("pm"), col("dom_max"))
    p.join(thresh, Seq("bucket", costCol))
      .filter(col(gainCol) === col("pm")
        && col(gainCol).cast("double") > col("dom_max"))
      .select(keyCol, costCol, gainCol)
  }
}
