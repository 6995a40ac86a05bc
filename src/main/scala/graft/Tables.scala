package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver corpus (`/root/repo/TESTDATA.md`): one parquet file
  * per table under `sfDir`. Mirrors the reference's dataset-of-files layout
  * (`download_historical_price.py:74-82,429`) re-expressed as schema-on-read
  * Parquet scans — partition pruning and column pruning replace the
  * reference's per-file path lookup.
  */
object Tables {
  val star: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = star ++ Seq("events", "documents", "embeddings")

  /** `events.parquet` carries parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read it as epoch-nano longs via
    * the legacy conf and truncate to microseconds — the same truncation DuckDB
    * applies when it reads ns into its µs TIMESTAMP, so oracle results align.
    * Integer `div` keeps full precision (a double round-trip would lose
    * sub-µs bits at 2^63-scale nanos).
    *
    * The `nanosAsLong` conf is a session-builder concern (Bench, Verify and
    * SparkSpec all set it): mutating session conf inside a query builder
    * would be a plan-time global write, racy under concurrent query
    * construction.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.read
        .parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
