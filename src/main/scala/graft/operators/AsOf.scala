package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent right row
  * with the same key and `rightTs <= leftTs`. Spark has no native as-of join;
  * rather than a custom SparkStrategy, compose it from a union + running
  * `last(..., ignoreNulls)` window (SURVEY §2.3 J-completeness): one shuffle
  * on (key), no O(n·m) range join blowup, scales linearly with input —
  * the formulation survives 100 TB because the window partitions by key and
  * streams each partition once in ts order.
  */
object AsOf {

  /** @param left      probe side (e.g. trades needing a prior quote)
    * @param right     reference side (e.g. quotes)
    * @param key       equi-join key column name present on both sides
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param rightVals right payload columns to carry; emitted as
    *                  `asof_<name>` plus `asof_ts` (null when no prior row)
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // A right row with null ts can never be "at or before" anything (SQL
    // comparison semantics — DuckDB's ASOF predicate never matches it), but
    // in the union+window formulation it would sort FIRST (nulls first) and
    // its PAYLOAD would leak into `last(..., ignoreNulls)` while `asof_ts`
    // stayed null — an incoherent row the native merge (NativeAsOf) can't
    // produce. Drop such rows up front; left rows with null ts sort first
    // in their key group and correctly null-pad.
    val rightNonNullTs = right.filter(col(rightTs).isNotNull)
    // Tag sides; right rows sort before left rows at equal ts so an exact-ts
    // match is visible to the left row ("at or before" semantics).
    val r = rightNonNullTs.select(
      Seq(col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side")) ++
        rightVals.map(v => col(v).as(s"_rv_$v")): _*)
    val l = left.select(
      Seq(col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side")) ++
        rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(s"_rv_$v")) ++
        leftCols.map(c => col(c).as(s"_l_$c")): _*)
    val unioned = r
      .select(Seq(col("_k"), col("_ts"), col("_side")) ++
        rightVals.map(v => col(s"_rv_$v")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)
      .unionByName(l)

    // Deterministic tiebreak (ADVICE r1): when multiple right rows share
    // (key, ts), order them by their payload columns so `last(...)` always
    // picks the greatest payload — never an arbitrary partition-order row.
    val w = Window
      .partitionBy("_k")
      .orderBy(col("_ts") +: col("_side") +: rightVals.map(v => col(s"_rv_$v")): _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    val withAsOf = unioned
      .withColumn("asof_ts", last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w))
      .select(
        leftCols.map(c => col(s"_l_$c").as(c)) ++
          Seq(col("asof_ts")) ++
          rightVals.map(v =>
            last(when(col("_side") === 0, col(s"_rv_$v")), ignoreNulls = true)
              .over(w).as(s"asof_$v")) :+
          col("_side"): _*)

    withAsOf.filter(col("_side") === 1).drop("_side")
  }
}
