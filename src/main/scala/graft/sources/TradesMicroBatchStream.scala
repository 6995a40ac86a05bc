package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Offset for the trades feed: a monotone poll counter. One poll =
  * one sweep over every subscribed symbol, mirroring the reference's
  * 60-second latest-trade loop (`update_live_price.py:118,192`). The
  * JSON form is just the number, so checkpoint recovery is trivial.
  */
private[sources] case class PollOffset(poll: Long) extends Offset {
  override def json(): String = poll.toString
}

/** Micro-batch half of [[BarFeedProvider]] (`feed=trades`): each
  * micro-batch covers the polls in `(start, end]`, and each poll fans
  * out one [[InputPartition]] per symbol batch — the same
  * `batch_size`/throttle contract as the batch side
  * (`download_historical_price.py:322-335`), so rate limiting scales
  * with executors instead of serializing on the driver.
  *
  * `latestOffset` advances exactly one poll per micro-batch, capped at
  * `maxPolls`; with `Trigger.ProcessingTime` the trigger interval is
  * the poll cadence (the reference hardcodes 60 s), and with
  * `Trigger.AvailableNow` the stream drains the remaining polls and
  * stops — which is what the specs use.
  *
  * The per-symbol payload is the same clearly-marked deterministic
  * synthesis as [[BarFeedReader.fetchBars]] (no network egress in the
  * container): price is a pure function of (symbol, poll), timestamps
  * advance 60 s per poll. A real client would issue the latest-trades
  * GET (`update_live_price.py:153-157`) in [[TradesReader]].
  */
private[sources] class TradesMicroBatchStream(
    symbols: Array[String],
    batchSize: Int,
    throttleMs: Long,
    maxPolls: Int,
    required: StructType) extends MicroBatchStream with SupportsTriggerAvailableNow {

  private var latest: Long = 0L
  private var availableNowCap: Long = -1L

  override def initialOffset(): Offset = PollOffset(0L)

  /** `Trigger.AvailableNow` drains the remaining polls in one batch —
    * with a bounded `maxPolls` that is the replay-to-cap semantics the
    * specs use; with the unbounded default, "available now" is one more
    * poll sweep (a REST feed has exactly one fresh response available).
    */
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = if (maxPolls == Int.MaxValue) latest + 1 else maxPolls.toLong

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    if (availableNowCap >= 0) latest = availableNowCap
    else if (latest < maxPolls) latest += 1
    PollOffset(latest)
  }

  override def reportLatestOffset(): Offset = PollOffset(latest)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: use latestOffset(start, limit)")

  override def deserializeOffset(json: String): Offset =
    PollOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[PollOffset].poll
    val to = end.asInstanceOf[PollOffset].poll
    (from until to).flatMap { poll =>
      symbols.grouped(math.max(1, batchSize)).map(batch =>
        TradesPartition(batch, poll, throttleMs): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TradesReaderFactory(required)
}

private[sources] case class TradesPartition(
    symbols: Array[String],
    poll: Long,
    throttleMs: Long) extends InputPartition

private[sources] class TradesReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TradesReader(partition.asInstanceOf[TradesPartition], required)
}

private[sources] class TradesReader(
    partition: TradesPartition,
    required: StructType) extends PartitionReader[InternalRow] {

  if (partition.throttleMs > 0) Thread.sleep(partition.throttleMs)

  /** Deterministic stand-in for the latest-trade GET
    * (`update_live_price.py:153-157`: `trade.get("p")`,
    * `trade.get("t")`). Pure in (symbol, poll) so re-reads and
    * checkpoint replays are bit-identical.
    */
  private def trade(symbol: String, poll: Long): Array[Any] = {
    val base = math.abs(symbol.hashCode % 1000) / 10.0 + 10.0
    val tick = ((symbol.hashCode * 31 + poll) % 100 + 100) % 100 / 100.0
    val price = math.rint((base + tick) * 100) / 100
    // 2024-01-02T14:30:00Z + 60s per poll, epoch micros
    val ts = (1704205800L + poll * 60L) * 1000000L
    Array[Any](UTF8String.fromString(symbol), price, ts)
  }

  private val fieldIdx: Array[Int] =
    required.fieldNames.map(BarFeed.tradeSchema.fieldIndex)
  private val rows: Iterator[Array[Any]] =
    partition.symbols.iterator.map(trade(_, partition.poll))
  private var current: Array[Any] = _

  override def next(): Boolean = {
    if (!rows.hasNext) return false
    current = rows.next()
    true
  }

  override def get(): InternalRow =
    new GenericInternalRow(fieldIdx.map(current(_)))

  override def close(): Unit = ()
}
