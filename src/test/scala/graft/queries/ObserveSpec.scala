package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability: `Dataset.observe` piggybacks metric
  * aggregates on the SAME pass as the consuming action — row counts,
  * null rates, domain violations come for free, with no second scan.
  * At 100 TB a separate "data quality job" doubles the read; observe()
  * is the production pattern (metrics surface per-batch in streaming
  * via QueryProgress too).
  */
class ObserveSpec extends SparkSpec {

  test("observe(): quality metrics ride the action's single pass and match exact counts") {
    val li = Tables.lineitem(spark, sf())
    val obs = Observation("quality")
    val out = li.observe(
        obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("null_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1).otherwise(0)).as("bad_disc"),
        min(col("l_shipdate")).as("min_ship"))
      .filter(col("l_quantity") > 10) // metrics observe PRE-filter rows
    val kept = out.count()

    val m = obs.get
    val exactRows = li.count()
    assert(m("n_rows") == exactRows, s"observed ${m("n_rows")} vs $exactRows")
    assert(m("null_qty") == 0L)
    assert(m("bad_disc") == 0L)
    assert(m("min_ship") != null)
    // and the filter genuinely reduced the stream the metrics rode on
    assert(kept < exactRows)
  }
}
