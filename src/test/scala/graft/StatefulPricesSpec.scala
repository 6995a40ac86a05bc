package graft

import java.sql.Timestamp

import graft.streaming.StatefulPrices
import graft.streaming.StatefulPrices.{Latest, Trade}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Keyed streaming state (SURVEY §2.9): state carries across micro-batches
  * and the stream's final answer equals the batch `max_by` twin.
  */
class StatefulPricesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mapGroupsWithState carries last-write-wins state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Trade]
    val query = StatefulPrices
      .latestPerSymbol(input.toDS())
      .writeStream
      .format("memory")
      .queryName("latest_prices")
      .outputMode(OutputMode.Update())
      .start()

    try {
      // batch 1: two symbols, AAPL has an in-batch tie on ts → higher price wins
      input.addData(
        Trade("AAPL", 100.0, ts("2024-01-02 10:00:00")),
        Trade("AAPL", 101.0, ts("2024-01-02 10:00:00")),
        Trade("MSFT", 390.0, ts("2024-01-02 10:00:00")))
      query.processAllAvailable()

      // batch 2: stale AAPL trade must NOT override batch-1 state
      input.addData(
        Trade("AAPL", 55.0, ts("2024-01-02 09:00:00")),
        Trade("MSFT", 391.0, ts("2024-01-02 11:00:00")))
      query.processAllAvailable()

      val latest = spark.table("latest_prices").as[Latest].collect()
        .groupBy(_.symbol).map { case (s, rows) => s -> rows.last }.toMap
      assert(latest("AAPL") == Latest("AAPL", 101.0, ts("2024-01-02 10:00:00")))
      assert(latest("MSFT") == Latest("MSFT", 391.0, ts("2024-01-02 11:00:00")))

      // differential check against the batch twin over all trades
      val allTrades = Seq(
        Trade("AAPL", 100.0, ts("2024-01-02 10:00:00")),
        Trade("AAPL", 101.0, ts("2024-01-02 10:00:00")),
        Trade("MSFT", 390.0, ts("2024-01-02 10:00:00")),
        Trade("AAPL", 55.0, ts("2024-01-02 09:00:00")),
        Trade("MSFT", 391.0, ts("2024-01-02 11:00:00"))).toDF()
      val batch = StatefulPrices.latestPerSymbolBatch(allTrades).as[Latest]
        .collect().map(l => l.symbol -> l).toMap
      assert(batch == latest)
    } finally query.stop()
  }

  test("transformWithState (Spark 4 state API) agrees with the " +
    "mapGroupsWithState path and the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Trade]
    val query = StatefulPrices
      .latestPerSymbolTws(input.toDS())
      .writeStream
      .format("memory")
      .queryName("latest_prices_tws")
      .outputMode(OutputMode.Update())
      .start()
    try {
      val trades = Seq(
        Trade("AAPL", 100.0, ts("2024-01-02 10:00:00")),
        Trade("AAPL", 101.0, ts("2024-01-02 10:00:00")),
        Trade("MSFT", 390.0, ts("2024-01-02 10:00:00")))
      input.addData(trades: _*)
      query.processAllAvailable()
      input.addData(Trade("AAPL", 55.0, ts("2024-01-02 09:00:00")),
        Trade("MSFT", 391.0, ts("2024-01-02 11:00:00")))
      query.processAllAvailable()
      val latest = spark.table("latest_prices_tws").as[Latest].collect()
        .groupBy(_.symbol).map { case (s, rows) => s -> rows.last }.toMap
      assert(latest("AAPL") == Latest("AAPL", 101.0, ts("2024-01-02 10:00:00")))
      assert(latest("MSFT") == Latest("MSFT", 391.0, ts("2024-01-02 11:00:00")))
      val all = (trades ++ Seq(
        Trade("AAPL", 55.0, ts("2024-01-02 09:00:00")),
        Trade("MSFT", 391.0, ts("2024-01-02 11:00:00")))).toDF()
      val batch = StatefulPrices.latestPerSymbolBatch(all).as[Latest]
        .collect().map(l => l.symbol -> l).toMap
      assert(batch == latest)
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("keyed state runs on the RocksDB state store (the production " +
    "backend: state spills off-heap instead of growing executor heap)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Trade]
    val query = StatefulPrices
      .latestPerSymbol(input.toDS())
      .writeStream
      .format("memory")
      .queryName("latest_prices_rocksdb")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(Trade("AAPL", 100.0, ts("2024-01-02 10:00:00")))
      query.processAllAvailable()
      input.addData(Trade("AAPL", 55.0, ts("2024-01-02 09:00:00")),
        Trade("TSLA", 200.0, ts("2024-01-02 11:00:00")))
      query.processAllAvailable()
      val latest = spark.table("latest_prices_rocksdb").as[Latest].collect()
        .groupBy(_.symbol).map { case (s, rows) => s -> rows.last }.toMap
      // stale AAPL update rejected by state carried in RocksDB
      assert(latest("AAPL") == Latest("AAPL", 100.0, ts("2024-01-02 10:00:00")))
      assert(latest("TSLA") == Latest("TSLA", 200.0, ts("2024-01-02 11:00:00")))
    } finally {
      query.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}
