package graft

import graft.operators.Merge
import graft.streaming.LiveFeed
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}

/** E2-shaped end-to-end: file-source trade stream → foreachBatch upsert →
  * final stored table equals the batch-merge golden output (SURVEY §5.2).
  */
class LiveFeedSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)
  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamed upsert equals batch merge golden") {
    val root = Files.createTempDirectory("livefeed").toString
    val in = s"$root/in"; val storedDir = s"$root/stored"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    val stored = Seq(
      ("AAPL", d("2024-01-02"), 10.0, 12.0, 9.0, 11.0, 1000.0),
      ("MSFT", d("2024-01-02"), 20.0, 22.0, 19.0, 21.0, 2000.0)
    ).toDF("symbol", "day", "open", "high", "low", "adj_close", "volume")
    stored.write.mode("overwrite").parquet(storedDir)

    // one poll response: an update, a NaN reject, and a new-key insert
    Files.writeString(Paths.get(s"$in/batch0.json"),
      """{"symbol":"AAPL","price":99.5,"ts":"2024-01-02T15:59:00.000Z"}
        |{"symbol":"AAPL","price":"NaN","ts":"2024-01-02T16:00:00.000Z"}
        |{"symbol":"TSLA","price":50.0,"ts":"2024-01-03T10:00:00.000Z"}
        |""".stripMargin)

    val q = LiveFeed.startUpsert(spark, in, storedDir, ckpt)
    q.awaitTermination(120000)

    val got = spark.read.parquet(storedDir)
      .select("symbol", "day", "open", "high", "low", "adj_close", "volume")
      .orderBy("symbol", "day").collect().toSeq

    val incoming = Seq(
      ("AAPL", d("2024-01-02"), 99.5, ts("2024-01-02 15:59:00")),
      ("TSLA", d("2024-01-03"), 50.0, ts("2024-01-03 10:00:00"))
    ).toDF("symbol", "day", "price", "ts")
    val golden = Merge
      .upsertDailyClose(stored, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
      .select("symbol", "day", "open", "high", "low", "adj_close", "volume")
      .orderBy("symbol", "day").collect().toSeq

    assert(got == golden)
    // the NaN trade must have been rejected, not merged
    val aapl = got.find(_.getString(0) == "AAPL").get
    assert(aapl.getDouble(aapl.fieldIndex("adj_close")) == 99.5)
  }

  test("windowedCounts compiles against a streaming source") {
    val root = Files.createTempDirectory("livefeed2").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    val agg = LiveFeed.windowedCounts(LiveFeed.readTrades(spark, s"$root/in"))
    assert(agg.isStreaming)
    assert(agg.columns.contains("n_trades") && agg.columns.contains("last_price"))
  }
}
