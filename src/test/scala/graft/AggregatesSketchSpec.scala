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

  // ——— r11 verdict #7: the two rows-only sketch queries (a10, a19) carry
  // MEASURED relative error at the driver's audit scales instead of trust.
  // Error envelopes are the documented ones: a10 is Spark's HLL++ at the
  // default relativeSD = 0.05 (assert within 3σ = 15 %); a19 is the
  // DataSketches HLL union at default lgK = 12 (σ ≈ 1.04/√4096 ≈ 1.6 %,
  // assert within ~3σ = 5 %). Each assertion message carries the measured
  // permille error, so a spec run IS the quantitative evidence.

  private def relErrPm(est: Long, exact: Long): Long =
    if (exact == 0) 0L else math.abs(est - exact) * 1000L / exact

  for (scale <- Seq("sf0.01", "sf0.1")) {
    val dir = s"/root/testdata/$scale"

    test(s"a10 at $scale: HLL++ approx distinct within the documented 3-sigma " +
      "envelope of exact, per group and column, with measured error") {
      val approx = Aggregates.a10ApproxDistinct.fn(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val exact = Tables.table(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("p"),
          countDistinct(col("l_suppkey")).as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(approx.keySet == exact.keySet)
      exact.foreach { case (flag, (p, s)) =>
        val (ap, as_) = approx(flag)
        assert(relErrPm(ap, p) <= 150,
          s"$scale flag=$flag l_partkey: approx $ap vs exact $p — " +
            s"${relErrPm(ap, p)} permille exceeds the 150 permille envelope")
        assert(relErrPm(as_, s) <= 150,
          s"$scale flag=$flag l_suppkey: approx $as_ vs exact $s — " +
            s"${relErrPm(as_, s)} permille exceeds the 150 permille envelope")
        info(f"$scale flag=$flag parts err=${relErrPm(ap, p)}%d permille " +
          f"(est $ap vs $p), supps err=${relErrPm(as_, s)}%d permille " +
          f"(est $as_ vs $s)")
      }
    }

    test(s"a19 at $scale: weekly sketch-union estimate within 5% of exact, " +
      "with measured error") {
      val out = Aggregates.a19SketchRollup.fn(spark, dir)
        .select("week", "approx_users").collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val exact = Tables.table(spark, dir, "events")
        .groupBy(date_trunc("week", to_date(col("ts"))).cast("date").as("week"))
        .agg(countDistinct(col("user_id")).as("users"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(out.keySet == exact.keySet)
      exact.foreach { case (week, n) =>
        val est = out(week)
        assert(relErrPm(est, n) <= 50,
          s"$scale week $week: estimate $est vs exact $n — " +
            s"${relErrPm(est, n)} permille exceeds the 50 permille envelope")
        info(s"$scale week $week err=${relErrPm(est, n)} permille " +
          s"(est $est vs $n)")
      }
    }
  }
}
