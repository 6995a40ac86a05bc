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

  /** Stream-STATIC enrichment join — the other half of §2.9's join
    * surface next to [[tradesWithQuotes]]'s stream-stream state machine:
    * each micro-batch of trades joins a file-backed reference dimension
    * (symbol → sector here; the reference's `categorize_market_caps`
    * symbol→bucket dict is exactly this shape). Stream-static joins are
    * STATELESS — nothing is watermarked, nothing is held between batches
    * — and the static side's file SNAPSHOT is pinned when the query is
    * analyzed: files appended to the path later are invisible to the
    * running stream (and overwriting in place breaks it — the captured
    * index references deleted files). Dimension refresh therefore means
    * either a query restart (the pattern StreamJoinSpec proves) or a
    * transactional table format whose scan re-resolves snapshots per
    * batch; pretending `refreshByPath` alone updates a running parquet
    * stream is a production foot-gun this scaladoc exists to flag.
    *
    * Scale: the dimension is broadcast per batch (symbol universes are
    * dimension-sized at any corpus scale); left join keeps every trade —
    * an unknown symbol enriches as null, never drops.
    */
  def enrichTrades(
      trades: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      dimPath: String): DataFrame = {
    val dim = spark.read
      .schema("symbol STRING, sector STRING")
      .parquet(dimPath)
    trades.join(broadcast(dim), Seq("symbol"), "left")
      .select(col("symbol"), col("ts"), col("price"), col("sector"))
  }
}
