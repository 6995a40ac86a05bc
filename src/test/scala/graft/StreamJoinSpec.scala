package graft

import java.sql.Timestamp

import graft.streaming.StreamJoin
import graft.streaming.StreamJoin.{Quote, Trade}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The watermarked stream-stream interval join must (1) match each trade
  * only to quotes for the SAME symbol within the 5-minute lookback, (2)
  * match across micro-batch boundaries (a quote from batch 1 joining a
  * trade arriving in batch 2 — the whole point of stream-stream state),
  * and (3) in left-outer mode emit watermark-expired unmatched trades
  * with null quote columns instead of dropping them.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner interval join matches within the lookback, across batches, " +
    "never across symbols or outside the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val query = StreamJoin
      .tradesWithQuotes(trades.toDF(), quotes.toDF())
      .writeStream.format("memory").queryName("tq_join")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: quotes only — state must persist until trades arrive
      quotes.addData(
        Quote("AAA", 9.0, 11.0, ts("2024-01-02 10:00:00")),
        Quote("AAA", 9.5, 10.5, ts("2024-01-02 10:03:00")),
        Quote("BBB", 1.0, 2.0, ts("2024-01-02 10:03:00")), // other symbol
        Quote("AAA", 8.0, 12.0, ts("2024-01-02 09:00:00"))) // too old
      query.processAllAvailable()
      // batch 2: the trade joins batch-1 state
      trades.addData(Trade("AAA", 10.0, ts("2024-01-02 10:04:00")))
      query.processAllAvailable()
      val rows = spark.table("tq_join")
        .as[(String, Timestamp, Double, Timestamp, Double, Double, Double)]
        .collect().toSet
      assert(rows == Set(
        ("AAA", ts("2024-01-02 10:04:00"), 10.0, ts("2024-01-02 10:00:00"), 9.0, 11.0, 2.0),
        ("AAA", ts("2024-01-02 10:04:00"), 10.0, ts("2024-01-02 10:03:00"), 9.5, 10.5, 1.0)),
        s"got $rows")
    } finally query.stop()
  }

  test("left-outer emits the unmatched trade with null quote columns once " +
    "the watermark proves no quote can arrive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val query = StreamJoin
      .tradesWithQuotes(trades.toDF(), quotes.toDF(), leftOuter = true)
      .writeStream.format("memory").queryName("tq_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      trades.addData(Trade("CCC", 5.0, ts("2024-01-02 10:00:00")))
      quotes.addData(Quote("DDD", 1.0, 2.0, ts("2024-01-02 10:00:00")))
      query.processAllAvailable()
      // advance BOTH watermarks far past the trade so the outer row emits
      trades.addData(Trade("ZZZ", 1.0, ts("2024-01-02 12:00:00")))
      quotes.addData(Quote("ZZZ2", 1.0, 2.0, ts("2024-01-02 12:00:00")))
      query.processAllAvailable()
      val unmatched = spark.table("tq_outer")
        .filter("symbol = 'CCC'")
        .as[(String, Timestamp, Double, Option[Timestamp], Option[Double],
          Option[Double], Option[Double])]
        .collect().toSeq
      assert(unmatched ==
        Seq(("CCC", ts("2024-01-02 10:00:00"), 5.0, None, None, None, None)),
        s"got $unmatched")
    } finally query.stop()
  }
  test("stream-static enrichment: left join keeps unknown symbols, the " +
    "static snapshot is PINNED at query start (appended dim files are " +
    "invisible mid-stream), and a restart picks up the refreshed dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dimDir = java.nio.file.Files.createTempDirectory("graft-dim").toString
    Seq(("AAA", "tech"), ("BBB", "finance")).toDF("symbol", "sector")
      .coalesce(1).write.mode("overwrite").parquet(dimDir)
    val trades = MemoryStream[Trade]
    def start() = StreamJoin.enrichTrades(trades.toDF(), spark, dimDir)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    val query = start()
    try {
      trades.addData(
        Trade("AAA", 10.0, ts("2024-01-02 10:00:00")),
        Trade("ZZZ", 5.0, ts("2024-01-02 10:01:00"))) // not in the dim
      query.processAllAvailable()
      val b1 = spark.table("enriched")
        .as[(String, Timestamp, Double, Option[String])].collect().toSet
      assert(b1 == Set(
        ("AAA", ts("2024-01-02 10:00:00"), 10.0, Some("tech")),
        ("ZZZ", ts("2024-01-02 10:01:00"), 5.0, None)), s"got $b1")

      // APPEND a new symbol's file: the running query's pinned snapshot
      // must NOT see it — ZZZ still enriches as null.
      Seq(("ZZZ", "materials")).toDF("symbol", "sector")
        .coalesce(1).write.mode("append").parquet(dimDir)
      trades.addData(Trade("ZZZ", 6.0, ts("2024-01-02 10:05:00")))
      query.processAllAvailable()
      val b2 = spark.table("enriched")
        .as[(String, Timestamp, Double, Option[String])].collect().toSet -- b1
      assert(b2 == Set(("ZZZ", ts("2024-01-02 10:05:00"), 6.0, None)),
        s"pinned snapshot leaked the appended file: $b2")
      query.stop()

      // Restart = re-analysis = fresh snapshot: the refreshed dimension
      // now enriches ZZZ — and, with no checkpoint, the restarted query
      // REPLAYS the source from the beginning, re-enriching the replayed
      // 10:05 trade under the NEW snapshot (stream-static joins are
      // stateless: enrichment is a property of the batch that processes
      // a row, not of the row — the reason production restarts pair a
      // checkpoint with the dim refresh when history must not re-enrich).
      spark.catalog.refreshByPath(dimDir)
      val query2 = start()
      try {
        trades.addData(Trade("ZZZ", 7.0, ts("2024-01-02 10:10:00")))
        query2.processAllAvailable()
        val b3 = spark.table("enriched")
          .as[(String, Timestamp, Double, Option[String])].collect().toSet -- b1 -- b2
        assert(b3(("ZZZ", ts("2024-01-02 10:10:00"), 7.0, Some("materials"))),
          s"fresh snapshot not applied after restart: $b3")
        assert(b3(("ZZZ", ts("2024-01-02 10:05:00"), 6.0, Some("materials"))),
          s"checkpoint-free replay should re-enrich history under the new dim: $b3")
      } finally query2.stop()
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dimDir))
    }
  }

}

