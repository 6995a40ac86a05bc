package graft

import java.nio.file.Files

import graft.sources.{BarStore, Sidecar}
import org.apache.spark.sql.functions._

/** S2/S8/S9 + layout semantics: Hive-partitioned bar store with partition
  * pruning, and the sidecar registry round-trip (idempotent insert-if-
  * absent, broadcast anti-membership).
  */
class SourcesSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("BarStore: partitioned write round-trips and prunes to one (source, symbol)") {
    import spark.implicits._
    val dir = tmpDir("barstore")
    val bars = Seq(
      ("alpaca", "AAPL", "2024-01-02 00:00:00", 101.0),
      ("alpaca", "MSFT", "2024-01-02 00:00:00", 390.0),
      ("yfinance", "AAPL", "2024-01-02 00:00:00", 100.9),
      ("yfinance", "MSFT", "2024-01-03 00:00:00", 391.2))
      .toDF("source", "symbol", "ts", "adj_close")
      .withColumn("timestamp", col("ts").cast("timestamp"))
      .drop("ts")
    BarStore.write(bars, dir)

    val slice = BarStore.readSymbol(spark, dir, "alpaca", "AAPL")
    assert(slice.count() == 1)
    assert(slice.select("adj_close").as[Double].head() == 101.0)

    // The symbol predicate must prune partitions at the scan, not filter
    // post-read: PartitionFilters populated, and only 1 of 4 dirs read.
    slice.collect()
    val plan = slice.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert(plan.contains("symbol"), plan.take(2000))

    // dynamic partition overwrite touches only the partitions in the batch
    val update = Seq(("alpaca", "AAPL", "2024-01-03 00:00:00", 102.5))
      .toDF("source", "symbol", "ts", "adj_close")
      .withColumn("timestamp", col("ts").cast("timestamp"))
      .drop("ts")
    BarStore.write(update, dir)
    val after = BarStore.read(spark, dir)
    assert(after.filter(col("symbol") === "MSFT").count() == 2, "sibling symbols clobbered")
    assert(
      BarStore.readSymbol(spark, dir, "alpaca", "AAPL")
        .select("adj_close").as[Double].head() == 102.5)
  }

  test("Sidecar: add is idempotent, sorted, and exclude anti-joins without shuffle of the big side") {
    import spark.implicits._
    val dir = tmpDir("sidecar") + "/invalid"
    assert(Sidecar.read(spark, dir).isEmpty)

    Sidecar.add(spark, dir, Seq("ZZZT", "BADCO").toDS())
    Sidecar.add(spark, dir, Seq("BADCO", "NOPE").toDS()) // re-add + new
    assert(Sidecar.read(spark, dir).collect().toSeq == Seq("BADCO", "NOPE", "ZZZT"))

    val universe = Seq("AAPL", "BADCO", "MSFT", "NOPE").toDF("symbol")
    val kept = Sidecar.exclude(spark, dir, universe, "symbol")
    assert(kept.select("symbol").as[String].collect().sorted.toSeq == Seq("AAPL", "MSFT"))
    kept.collect()
    assert(kept.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
