package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** The reference's in-memory live-price state (`self.current_prices`,
  * `update_live_price.py:69,164` — a driver-side frame mutated per trade)
  * as Spark keyed streaming state: `mapGroupsWithState` holds one small
  * record per symbol on the executors, checkpointed, sharded by key —
  * the shape that survives a symbol universe far larger than one machine
  * (the reference caps out at one Python dict).
  *
  * Last-write-wins per symbol with the same (ts, price) struct tiebreak as
  * the batch [[graft.operators.Merge]], so streaming state and batch merge
  * can never disagree on ties.
  */
object StatefulPrices {

  case class Trade(symbol: String, price: Double, ts: Timestamp)
  case class Latest(symbol: String, price: Double, ts: Timestamp)

  private def newer(a: Latest, b: Latest): Latest = {
    val cmp = a.ts.compareTo(b.ts)
    if (cmp > 0 || (cmp == 0 && a.price >= b.price)) a else b
  }

  /** One state record per symbol; emits the post-batch latest for every
    * symbol seen in the micro-batch (update-mode semantics).
    */
  def latestPerSymbol(trades: Dataset[Trade]): Dataset[Latest] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(_.symbol)
      .mapGroupsWithState[Latest, Latest](GroupStateTimeout.NoTimeout) {
        (symbol, rows, state) =>
          val batchBest = rows
            .map(t => Latest(symbol, t.price, t.ts))
            .reduce(newer)
          val best = state.getOption.map(newer(_, batchBest)).getOrElse(batchBest)
          state.update(best)
          best
      }
  }

  /** Batch twin of [[latestPerSymbol]] — the differential oracle used in
    * tests: state fed all batches must equal one `max_by` over the union.
    */
  def latestPerSymbolBatch(trades: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    trades
      .groupBy("symbol")
      .agg(
        max_by(col("price"), struct(col("ts"), col("price"))).as("price"),
        max(col("ts")).as("ts"))
  }

  /** Same state machine on Spark 4's `transformWithState` — the successor
    * API to `mapGroupsWithState`: explicit named state variables managed by
    * the processor, TTL support, and a state schema the engine can evolve.
    * Semantics are IDENTICAL to [[latestPerSymbol]] (same [[newer]] fold),
    * which StatefulPricesSpec asserts differentially.
    */
  class LatestProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Trade, Latest] {
    @transient private var latest: org.apache.spark.sql.streaming.ValueState[Latest] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      latest = getHandle.getValueState[Latest](
        "latest",
        org.apache.spark.sql.Encoders.product[Latest],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        inputRows: Iterator[Trade],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Latest] = {
      val batchBest = inputRows
        .map(t => Latest(key, t.price, t.ts))
        .reduce(newer)
      val best = Option(latest.get()).map(newer(_, batchBest)).getOrElse(batchBest)
      latest.update(best)
      Iterator.single(best)
    }
  }

  /** [[latestPerSymbol]] via the transformWithState API. */
  def latestPerSymbolTws(trades: Dataset[Trade]): Dataset[Latest] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(_.symbol)
      .transformWithState(
        new LatestProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }
}
