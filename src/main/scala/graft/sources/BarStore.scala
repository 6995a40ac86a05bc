package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's dataset-of-files layout (`data/<source>/<SYMBOL>.parquet`,
  * `download_historical_price.py:74-82,429`; diagram `README.md:45-57`)
  * re-expressed as ONE Hive-partitioned Parquet dataset:
  *
  *   store/source=alpaca/symbol=AAPL/part-*.parquet
  *
  * Reading "one symbol's file" becomes a partition-pruned scan — Catalyst's
  * `PruneFileSourcePartitions` turns the predicate into a directory listing
  * the same way the reference turns a symbol into a path (O(1) in the
  * number of other symbols), except it also composes with every other
  * pushed filter and scales to thousands of executors reading disjoint
  * partitions.
  */
object BarStore {

  /** Publish a bar table partitioned by (source, symbol). Dynamic partition
    * overwrite rewrites ONLY the partitions present in `bars` — the batch
    * analogue of the reference's per-symbol file replace
    * (`update_live_price.py:289-292`), without touching sibling symbols.
    */
  def write(bars: DataFrame, dir: String): Unit =
    bars.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("source", "symbol")
      .parquet(dir)

  /** Whole-store scan; partition columns come back as regular columns. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** One (source, symbol) slice — the reference's `pd.read_parquet(
    * data/alpaca/AAPL.parquet)` (`update_live_price.py:227`). The filter
    * MUST prune at planning time (asserted in BarStoreSpec), never scan
    * the full store.
    */
  def readSymbol(spark: SparkSession, dir: String, source: String, symbol: String): DataFrame =
    read(spark, dir)
      .filter(col("source") === source && col("symbol") === symbol)
}
