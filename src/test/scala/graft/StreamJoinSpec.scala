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
}
