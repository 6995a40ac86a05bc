package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** One named engine query plus (optionally) its DuckDB oracle SQL.
  * Queries with `oracle = None` get the driver's weaker rows-only check
  * (used for ops whose result DuckDB can't reproduce deterministically,
  * e.g. approx sketches or file-listing).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {

  /** Order-independent exact SUM for double columns: route through decimal so
    * Spark's parallel partial aggregation and DuckDB's sequential sum produce
    * the identical value, then surface as double. `scale` must cover the
    * column's true decimal precision (corpus money/value columns carry 2dp;
    * products of two/three 2dp factors carry 4/6dp — see SURVEY §7.3.1).
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Deterministic AVG built from the exact decimal sum and an exact count:
    * one IEEE division of identical operands on both engines.
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** Exact integer-quantized SUM for double expressions whose TRUE values
    * are fixed-point decimals (e.g. products of 2dp corpus columns are
    * exact 4/6dp): `round(x·10^scale)` is evaluated on the bit-identical
    * IEEE double in both engines (same multiply, same half-away integer
    * rounding) and summed as longs, so the result is exact and immune to
    * the engines' DIFFERENT double→DECIMAL rounding paths — which
    * [[dsum]] at scale ≥ 8 is not: Spark rounds the double's exact
    * decimal expansion while DuckDB converts through double arithmetic,
    * and a three-factor product's double error reaches the 8th decimal,
    * where the two procedures can disagree (observed at sf0.1 on
    * q01.sum_charge). Keep `scale` at the expression's true decimal
    * precision so the quantization is lossless and the long sum has
    * ~10^(18−scale) of magnitude headroom.
    */
  def qsum(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    sum(round(c * p).cast("long")).cast("double") / p
  }

  /** SQL fragment mirroring [[qsum]] for the DuckDB oracle. */
  def sqlQsum(expr: String, scale: Int): String = {
    val p = s"1${"0" * scale}.0"
    s"CAST(sum(CAST(round(($expr) * $p) AS BIGINT)) AS DOUBLE) / $p"
  }

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(28,$scale))) AS DOUBLE)"

  def sqlDavg(expr: String, scale: Int = 2): String =
    s"${sqlDsum(expr, scale)} / count($expr)"
}
