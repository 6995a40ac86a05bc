package graft

import org.apache.spark.sql.functions._

/** The DataSourceV2 feed connector honors the reference's ingestion
  * contract: batch partitioning, declared schema, deterministic payloads,
  * and pushed-down column pruning.
  */
class BarFeedSpec extends SparkSpec {

  private val syms = (1 to 25).map(i => s"S$i").mkString(",")

  private def feed(extra: (String, String)*) = {
    val r = spark.read.format("graft.sources.BarFeedProvider")
      .option("symbols", syms).option("days", 3)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("one input partition per fetch batch (dhp:322-335 batching)") {
    assert(feed("batchSize" -> "10").rdd.getNumPartitions == 3) // ceil(25/10)
    assert(feed("batchSize" -> "25").rdd.getNumPartitions == 1)
  }

  test("declared canonical bar schema, no inference") {
    val df = feed()
    assert(df.columns.toSeq ==
      Seq("symbol", "ts", "open", "high", "low", "adj_close", "volume"))
    assert(df.schema("ts").dataType.typeName == "timestamp")
  }

  test("deterministic payloads: re-read is identical, rows = symbols x days") {
    val a = feed().orderBy("symbol", "ts").collect().toSeq
    val b = feed().orderBy("symbol", "ts").collect().toSeq
    assert(a == b)
    assert(a.size == 25 * 3)
    val hi = feed().filter(col("high") < col("low")).count()
    assert(hi == 0)
  }

  test("column pruning reaches the reader (SupportsPushDownRequiredColumns)") {
    val pruned = feed().select("symbol")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("symbol"))
    assert(pruned.distinct().count() == 25)
  }

  test("throttle applies per fetch batch") {
    val t0 = System.nanoTime()
    feed("batchSize" -> "5", "throttleMs" -> "200").count() // 5 partitions
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms >= 200.0, s"expected at least one 200ms throttle, took $ms ms")
  }

  test("trades feed: AvailableNow drains exactly maxPolls deterministic sweeps") {
    import graft.streaming.LiveFeed
    import org.apache.spark.sql.streaming.Trigger
    def drain(queryName: String) = {
      val q = LiveFeed.readTradesFeed(spark, Seq("AAPL", "MSFT"), maxPolls = 3, batchSize = 1)
        .writeStream.format("memory").queryName(queryName)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.table(queryName).orderBy("ts", "symbol").collect().toSeq
    }
    val df = LiveFeed.readTradesFeed(spark, Seq("AAPL", "MSFT"), maxPolls = 3)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("symbol", "price", "ts"))
    val got = drain("trades_drain")
    assert(got.size == 6) // 2 symbols x 3 polls
    assert(got.map(_.getString(0)).distinct.sorted == Seq("AAPL", "MSFT"))
    // pure in (symbol, poll): a second drain replays bit-identically
    assert(drain("trades_drain2") == got)
  }

  test("trades feed: watermarked streaming dropDuplicates keeps one trade per symbol") {
    // §2.9 late/duplicate handling: the watermark bounds the dedup state
    // (the reference's per-symbol keyed state, `update_live_price.py:69,164`).
    import graft.streaming.LiveFeed
    import org.apache.spark.sql.streaming.Trigger
    val q = LiveFeed.readTradesFeed(spark, Seq("AAPL", "MSFT", "GOOG"), maxPolls = 3)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("symbol")
      .writeStream.format("memory").queryName("trades_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("trades_dedup")
    assert(rows.count() == 3)
    assert(rows.select("symbol").distinct().count() == 3)
  }

  test("trades feed: dropDuplicatesWithinWatermark dedups with state " +
    "EVICTION guarantees (the unbounded-key-safe production variant)") {
    // Plain dropDuplicates keeps every key's state forever even under a
    // watermark; WithinWatermark evicts state older than the watermark —
    // the only form that survives an unbounded key universe at 100 TB.
    import graft.streaming.LiveFeed
    import org.apache.spark.sql.streaming.Trigger
    val q = LiveFeed.readTradesFeed(spark, Seq("AAPL", "MSFT", "GOOG"), maxPolls = 3)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("symbol")
      .writeStream.format("memory").queryName("trades_dedup_ww")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("trades_dedup_ww")
    // all polls land within one watermark window → exactly one row per key
    assert(rows.select("symbol").distinct().count() == 3)
    assert(rows.count() == 3)
  }

  test("trades feed end-to-end: poll stream -> partition-incremental upsert (E2)") {
    import graft.operators.Merge
    import graft.streaming.LiveFeed
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("feedup").toString
    val storedDir = s"$root/stored"; val ckpt = s"$root/ckpt"
    val syms = Seq("AAPL", "MSFT", "GOOG")

    // seed store: one day partition no trade touches + one the feed updates
    val stored = Seq(
      ("AAPL", java.sql.Date.valueOf("2024-01-01"), 1.0, 2.0),
      ("AAPL", java.sql.Date.valueOf("2024-01-02"), 3.0, 4.0)
    ).toDF("symbol", "day", "open", "adj_close")
    stored.write.mode("overwrite").partitionBy("day").parquet(storedDir)

    val q = LiveFeed.startUpsertFrom(spark,
      LiveFeed.readTradesFeed(spark, syms, maxPolls = 2, batchSize = 2),
      storedDir, ckpt)
    q.awaitTermination(120000)

    // golden: batch-merge the same (deterministic) drained trade set
    val drainQ = LiveFeed.readTradesFeed(spark, syms, maxPolls = 2, batchSize = 2)
      .writeStream.format("memory").queryName("feedup_golden")
      .trigger(Trigger.AvailableNow()).start()
    drainQ.awaitTermination(120000)
    val incoming = spark.table("feedup_golden")
      .select(col("symbol"), to_date(col("ts")).as("day"), col("price"), col("ts"))
    val golden = Merge
      .upsertDailyClose(stored, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
      .orderBy("symbol", "day").collect().toSeq
    val got = spark.read.parquet(storedDir)
      .select("symbol", "day", "open", "adj_close")
      .orderBy("symbol", "day").collect().toSeq
    assert(got == golden)
  }
}
