package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Thin `DataSourceV2` connector demonstrating the reference's REST-feed
  * ingestion contract (SURVEY §2.1 S3–S7) as a first-class Spark source:
  *
  *   - symbols are fetched in fixed-size batches with an inter-batch
  *     delay (`download_historical_price.py:322-335`: `batch_size=10`,
  *     `delay_between_batches=2`) → one `InputPartition` per symbol batch,
  *     throttle applied inside the partition reader, so rate limiting
  *     scales out with executors instead of serializing on the driver;
  *   - the canonical bar schema is declared by the source
  *     (`update_live_price.py:211-223`), so every consumer plans against
  *     the same `StructType` — no schema inference;
  *   - column pruning is pushed into the reader
  *     (`SupportsPushDownRequiredColumns`): a `select("symbol")` never
  *     materializes the OHLCV doubles.
  *
  * The container has no network egress, so the per-symbol payload is a
  * clearly-marked deterministic synthesis (same honesty contract as
  * [[graft.operators.Multimodal.FakeCodec]]) — the load-bearing parts are
  * the partitioning, throttling, schema and pruning plumbing a real HTTP
  * client would drop into [[BarFeedReader.fetchBars]].
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.BarFeedProvider")
  *     .option("symbols", "AAPL,MSFT,GOOG")
  *     .option("batchSize", 10)      // symbols per fetch batch
  *     .option("throttleMs", 0)      // delay per batch (ref: 2000)
  *     .option("days", 5)            // bars per symbol
  *     .load()
  * }}}
  */
class BarFeedProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (BarFeed.isTrades(options)) BarFeed.tradeSchema else BarFeed.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BarFeedTable(new CaseInsensitiveStringMap(properties))
}

object BarFeed {
  /** Canonical bar schema (`update_live_price.py:245`). */
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("adj_close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  /** Latest-trade shape of the polling feed (`update_live_price.py:153-157`:
    * `trade.get("p")`, `trade.get("t")`).
    */
  val tradeSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  private[sources] def isTrades(options: CaseInsensitiveStringMap): Boolean =
    "trades".equalsIgnoreCase(options.getOrDefault("feed", "bars"))
}

private[sources] class BarFeedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_bar_feed"
  override def schema(): StructType =
    if (BarFeed.isTrades(options)) BarFeed.tradeSchema else BarFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    if (BarFeed.isTrades(options))
      util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new BarFeedScanBuilder(options)
}

private[sources] class BarFeedScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType =
    if (BarFeed.isTrades(options)) BarFeed.tradeSchema else BarFeed.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new BarFeedScan(options, required)
}

private[sources] class BarFeedScan(
    options: CaseInsensitiveStringMap,
    required: StructType) extends Scan with Batch {
  private val symbols: Array[String] =
    Option(options.get("symbols")).map(_.split(",").map(_.trim.toUpperCase)
      .filter(_.nonEmpty)).getOrElse(Array.empty)
  private val batchSize = options.getInt("batchSize", 10)
  private val throttleMs = options.getLong("throttleMs", 0L)
  private val days = options.getInt("days", 5)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TradesMicroBatchStream(symbols, batchSize, throttleMs,
      options.getInt("maxPolls", Int.MaxValue), required)
  override def description(): String =
    s"graft_bar_feed(${symbols.length} symbols, batch=$batchSize)"

  /** One partition per fetch batch — the `range(0, total, batch_size)`
    * loop of `download_historical_price.py:331`, parallelized.
    */
  override def planInputPartitions(): Array[InputPartition] =
    symbols.grouped(batchSize)
      .map(b => BarFeedPartition(b, throttleMs, days): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new BarFeedReaderFactory(required)
}

private[sources] case class BarFeedPartition(
    symbols: Array[String],
    throttleMs: Long,
    days: Int) extends InputPartition

private[sources] class BarFeedReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BarFeedReader(partition.asInstanceOf[BarFeedPartition], required)
}

private[sources] class BarFeedReader(
    partition: BarFeedPartition,
    required: StructType) extends PartitionReader[InternalRow] {

  /** Deterministic stand-in for the per-batch HTTP GET
    * (`download_historical_price.py:404-413`). A real client issues the
    * request here and maps the JSON payload to rows; the throttle models
    * `delay_between_batches` at the fetch site.
    */
  private def fetchBars(symbol: String): Iterator[Array[Any]] = {
    val base = math.abs(symbol.hashCode % 1000) / 10.0 + 10.0
    (0 until partition.days).iterator.map { d =>
      val drift = ((symbol.hashCode * 31 + d) % 100) / 100.0
      val open = math.rint((base + drift) * 100) / 100
      val high = math.rint((open * 1.02) * 100) / 100
      val low = math.rint((open * 0.98) * 100) / 100
      val close = math.rint((open + drift / 2) * 100) / 100
      val vol = 1000.0 + (math.abs(symbol.hashCode + d) % 9000)
      // 2024-01-01T21:00:00Z + d days, in epoch micros
      val ts = (1704142800L + d * 86400L) * 1000000L
      Array[Any](UTF8String.fromString(symbol), ts, open, high, low, close, vol)
    }
  }

  if (partition.throttleMs > 0) Thread.sleep(partition.throttleMs)

  private val fieldIdx: Array[Int] =
    required.fieldNames.map(BarFeed.schema.fieldIndex)
  private val rows: Iterator[Array[Any]] =
    partition.symbols.iterator.flatMap(fetchBars)
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
