package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Tabular interchange formats beyond Parquet — the CSV/JSONL surface a
  * corpus pipeline meets at its edges (vendor drops, crawl manifests,
  * eval-set exports). Two rules keep these scale-safe:
  *
  *  1. ALWAYS an explicit schema. Inference scans the data once before the
  *     real job (2× I/O at 100 TB) and can silently flip a column's type
  *     between deliveries; a declared schema makes drift loud instead.
  *  2. Malformed rows are CAPTURED, not dropped: PERMISSIVE mode routes
  *     unparseable lines into a corrupt-record column that
  *     [[quarantine]] splits into clean/dead-letter frames — the batch
  *     analogue of the streaming dead-letter sink
  *     ([[graft.streaming.LiveFeed.startUpsertFrom]]).
  */
object Tabular {

  val CorruptCol = "_corrupt_record"

  /** Append the corrupt-record catch column to a declared schema. */
  def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType))

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Split a PERMISSIVE read into (clean rows without the catch column,
    * dead-letter rows carrying the raw malformed line). The input is
    * cached first: Spark refuses corrupt-column-only projections straight
    * off a raw file scan (the parser drops the raw line once the row
    * parses, so the column would be silently empty — SPARK-26716), and the
    * cache also makes the two branches share one parse pass.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    val clean = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val dead = parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
    (clean, dead)
  }
}
