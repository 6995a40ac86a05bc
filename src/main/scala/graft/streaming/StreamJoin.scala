package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the quote-trade matching
  * shape market-data systems run continuously (the reference consumes
  * trades and quotes as separate REST feeds; `update_live_price.py`
  * polls trades, `dhp` fetches bars — joining the two streams is the
  * first thing a consumer does with them).
  *
  * Each trade matches the quotes for its symbol in the preceding
  * `lookback` interval. BOTH sides carry a watermark and the join
  * condition bounds event time in both directions, so Spark derives a
  * state-eviction bound for each side: a quote is held only until the
  * trade watermark passes `qts + lookback`, a trade only until the quote
  * watermark passes its `ts`. Without the interval bound the state store
  * grows forever — the 100 TB-per-day failure mode; with it, state is
  * O(rate × window) per symbol partition regardless of stream age.
  *
  * Inner by default; `leftOuter = true` emits unmatched trades with null
  * quote columns once the watermark proves no quote can arrive (the
  * production choice when a trade must never be dropped).
  */
object StreamJoin {

  case class Trade(symbol: String, price: Double, ts: Timestamp)
  case class Quote(q_symbol: String, bid: Double, ask: Double, qts: Timestamp)

  def tradesWithQuotes(
      trades: DataFrame,
      quotes: DataFrame,
      lookback: String = "5 minutes",
      watermark: String = "10 minutes",
      leftOuter: Boolean = false): DataFrame = {
    val t = trades.withWatermark("ts", watermark)
    val q = quotes.withWatermark("qts", watermark)
    t.join(
      q,
      expr(s"symbol = q_symbol AND qts BETWEEN ts - interval $lookback AND ts"),
      if (leftOuter) "leftOuter" else "inner")
      .select(col("symbol"), col("ts"), col("price"),
        col("qts"), col("bid"), col("ask"),
        // the matching spread at trade time; null on unmatched outer rows
        (col("ask") - col("bid")).as("spread"))
  }
}
