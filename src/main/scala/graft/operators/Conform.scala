package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical-schema conformance — the reference's normalization pipeline
  * (SURVEY §1.3) as one pure `DataFrame => DataFrame`:
  *
  *   - lowercase column names (`download_historical_price.py:502`)
  *   - rename vendor spellings to canonical (`close`/`adj close` →
  *     `adj_close`, `download_historical_price.py:423,504-505`)
  *   - drop non-canonical columns (`symbol` dropped post-reset,
  *     `download_historical_price.py:426`)
  *   - add missing canonical columns as null (`update_live_price.py:244-248`
  *     adds them as NaN; NaN→null per SURVEY §7.3.2)
  *   - cast to canonical types and emit in canonical order
  *   - canonicalize NaN→null in double columns so downstream validity
  *     predicates (`update_live_price.py:160-161`) need only `isNotNull`
  *
  * Narrow projection only — no shuffle; at 100 TB this fuses into the scan.
  */
object Conform {

  /** Canonical daily-bar schema (FIXTURES.md §A; `update_live_price.py:245`). */
  val barSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("adj_close", DoubleType),
    StructField("volume", DoubleType),
    StructField("trade_count", DoubleType),
    StructField("vwap", DoubleType)))

  /** Vendor→canonical rename map (applied after lowercasing). */
  val renames: Map[String, String] = Map(
    "close" -> "adj_close",
    "adj close" -> "adj_close",
    "datetime" -> "timestamp",
    "date" -> "timestamp")

  def conform(df: DataFrame, schema: StructType = barSchema): DataFrame = {
    val lowered = df.columns.map(c => c -> c.toLowerCase).toMap
    val canonicalOf: Map[String, String] =
      lowered.map { case (orig, lc) => orig -> renames.getOrElse(lc, lc) }
    val available: Map[String, String] =
      canonicalOf.groupBy(_._2).map { case (canon, srcs) => canon -> srcs.keys.min }

    val cols = schema.fields.map { f =>
      available.get(f.name) match {
        case Some(src) =>
          val c = col(s"`$src`").cast(f.dataType)
          val cleaned = f.dataType match {
            case DoubleType | FloatType => when(isnan(c), lit(null)).otherwise(c)
            case _ => c
          }
          cleaned.as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
