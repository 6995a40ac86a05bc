package graft

import graft.queries.Aggregates
import org.apache.spark.sql.functions._

/** a19's accuracy contract, which the rows-only driver check can't express:
  * the sketch-rollup estimate must stay within HLL's error envelope of the
  * exact weekly distinct count, and the rollup must never rescan events
  * (the daily sketches are the only input to the weekly union).
  */
class AggregatesSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a19: weekly sketch-union estimate within 5% of the exact distinct " +
    "count, one row per week, deterministic across runs") {
    val out = Aggregates.a19SketchRollup.fn(spark, sf)
      .select("week", "approx_users").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = Tables.table(spark, sf, "events")
      .groupBy(date_trunc("week", to_date(col("ts"))).cast("date").as("week"))
      .agg(countDistinct(col("user_id")).as("users"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out.keySet == exact.keySet)
    exact.foreach { case (week, n) =>
      val est = out(week)
      assert(math.abs(est - n) <= math.max(1L, (n * 0.05).toLong),
        s"week $week: estimate $est vs exact $n")
    }
    val again = Aggregates.a19SketchRollup.fn(spark, sf)
      .select("week", "approx_users").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(again == out, "sketch estimate not deterministic")
  }
}
