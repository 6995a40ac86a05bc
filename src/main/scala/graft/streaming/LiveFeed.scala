package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming re-expression of the reference's live-price loop
  * (`update_live_price.py` — E2 in SURVEY §3): a micro-batch source of
  * trade rows → validity filter → watermark → last-write-wins dedup →
  * `foreachBatch` upsert into the stored daily-bar table.
  *
  * The reference polls REST every 60 s and rewrites one whole Parquet file
  * per trade (`update_live_price.py:118,289-292`); here the trigger models
  * the poll interval and the merge rewrites only the affected partitions in
  * one Catalyst-planned pass. State stays bounded: the per-key "current
  * price" frame (`ulp:69,164`) becomes the watermarked per-batch `max_by`,
  * not an unbounded `mapGroupsWithState` (SURVEY §7.3.5).
  */
object LiveFeed {

  /** Incoming trade shape (`update_live_price.py:153-165`). */
  val tradeSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("price", DoubleType),
    StructField("ts", TimestampType)))

  /** File-based micro-batch source standing in for the REST poll
    * (`ulp:126-157`); each dropped file is one poll response.
    */
  def readTrades(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(tradeSchema)
      .option("maxFilesPerTrigger", 16)
      .json(dir)

  /** Validity predicate (`ulp:160-161`): non-null, non-NaN price and ts. */
  def validTrades(trades: DataFrame): DataFrame =
    trades.filter(
      col("price").isNotNull && !isnan(col("price")) && col("ts").isNotNull)

  /** Start the upsert stream: every micro-batch is reduced last-write-wins
    * per (symbol, day) and merged into the stored bar table at
    * `storedDir` — the batch `Merge.upsertDailyClose` is reused verbatim,
    * so streaming and batch semantics cannot drift apart.
    */
  def startUpsert(
      spark: SparkSession,
      inputDir: String,
      storedDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    validTrades(readTrades(spark, inputDir))
      .withWatermark("ts", "1 day")
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val incoming = batch
          .select(col("symbol"), to_date(col("ts")).as("day"), col("price"), col("ts"))
        val stored = spark.read.parquet(storedDir)
        val merged = Merge
          .upsertDailyClose(stored, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
        // Crash-safe publish mirroring the reference's tmp+os.replace
        // (`ulp:289-292`): write tmp, move the live dir ASIDE (not delete),
        // promote tmp, then drop the aside copy. A crash at any step leaves
        // either the old table live or both old (.old) and new (.tmp/dst)
        // present — never a missing table. Readers racing the two renames
        // can retry on .old; data is never unrecoverable.
        val tmp = storedDir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(storedDir)
        val old = new org.apache.hadoop.fs.Path(storedDir + ".old")
        fs.delete(old, true)
        if (fs.exists(dst)) fs.rename(dst, old)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        fs.delete(old, true)
        ()
      }
      .start()

  /** Watermarked tumbling-window aggregate — the streaming twin of the
    * batch `s1_tumbling_window` query (same expressions under `readStream`).
    */
  def windowedCounts(trades: DataFrame): DataFrame =
    trades
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("symbol"))
      .agg(count(lit(1)).as("n_trades"), max_by(col("price"), col("ts")).as("last_price"))
}
