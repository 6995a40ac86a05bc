package graft

import graft.operators.Merge
import graft.streaming.LiveFeed
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}

/** E2-shaped end-to-end: file-source trade stream → foreachBatch upsert →
  * final stored table equals the batch-merge golden output (SURVEY §5.2).
  * The store is day-partitioned and the upsert must be partition-
  * incremental: micro-batches may only touch the partitions whose days they
  * carry.
  */
class LiveFeedSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)
  private def ts(s: String) = Timestamp.valueOf(s)

  /** (path, size, mtime) of every data file under a partition dir. */
  private def partFiles(dir: String): Seq[(String, Long, Long)] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(f => (f.toString, Files.size(f), Files.getLastModifiedTime(f).toMillis))
        .toSeq.sortBy(_._1)
    }
  }

  test("streamed upsert equals batch merge golden; untouched partitions untouched") {
    val root = Files.createTempDirectory("livefeed").toString
    val in = s"$root/in"; val storedDir = s"$root/stored"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    val stored = Seq(
      // day 2024-01-01: never referenced by any trade — must not be rewritten
      ("GOOG", d("2024-01-01"), 5.0, 6.0, 4.0, 5.5, 500.0),
      ("AAPL", d("2024-01-02"), 10.0, 12.0, 9.0, 11.0, 1000.0),
      ("MSFT", d("2024-01-02"), 20.0, 22.0, 19.0, 21.0, 2000.0)
    ).toDF("symbol", "day", "open", "high", "low", "adj_close", "volume")
    stored.write.mode("overwrite").partitionBy("day").parquet(storedDir)
    val untouchedBefore = partFiles(s"$storedDir/day=2024-01-01")
    assert(untouchedBefore.nonEmpty)

    // one poll response: an update, a NaN reject, and a new-key insert
    Files.writeString(Paths.get(s"$in/batch0.json"),
      """{"symbol":"AAPL","price":99.5,"ts":"2024-01-02T15:59:00.000Z"}
        |{"symbol":"AAPL","price":"NaN","ts":"2024-01-02T16:00:00.000Z"}
        |{"symbol":"TSLA","price":50.0,"ts":"2024-01-03T10:00:00.000Z"}
        |""".stripMargin)

    val q = LiveFeed.startUpsert(spark, in, storedDir, ckpt)
    q.awaitTermination(120000)

    val cols = Seq("symbol", "day", "open", "high", "low", "adj_close", "volume")
    val got = spark.read.parquet(storedDir)
      .select(cols.map(col): _*).orderBy("symbol", "day").collect().toSeq

    val incoming = Seq(
      ("AAPL", d("2024-01-02"), 99.5, ts("2024-01-02 15:59:00")),
      ("TSLA", d("2024-01-03"), 50.0, ts("2024-01-03 10:00:00"))
    ).toDF("symbol", "day", "price", "ts")
    val golden = Merge
      .upsertDailyClose(stored, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
      .select(cols.map(col): _*).orderBy("symbol", "day").collect().toSeq

    assert(got == golden)
    // the NaN trade must have been rejected, not merged
    val aapl = got.find(_.getString(0) == "AAPL").get
    assert(aapl.getDouble(aapl.fieldIndex("adj_close")) == 99.5)
    // partition-incremental contract: the untouched day's files are the
    // SAME files (path, size, mtime) — not a byte was rewritten
    assert(partFiles(s"$storedDir/day=2024-01-01") == untouchedBefore)
    // touched + new partitions exist
    assert(partFiles(s"$storedDir/day=2024-01-03").nonEmpty)
  }

  test("processing-time trigger merges successive micro-batches (60s poll model)") {
    // Models the reference's 60 s polling loop (`update_live_price.py:118,192`)
    // with a compressed interval: two poll responses arriving in separate
    // trigger firings must both land via the same merge path.
    val root = Files.createTempDirectory("livefeed3").toString
    val in = s"$root/in"; val storedDir = s"$root/stored"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    val stored = Seq(("AAPL", d("2024-01-02"), 10.0, 11.0))
      .toDF("symbol", "day", "open", "adj_close")
    stored.write.mode("overwrite").partitionBy("day").parquet(storedDir)

    Files.writeString(Paths.get(s"$in/poll0.json"),
      """{"symbol":"AAPL","price":42.0,"ts":"2024-01-02T15:00:00.000Z"}""" + "\n")

    val q = LiveFeed.startUpsert(spark, in, storedDir, ckpt,
      trigger = Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      val mid = spark.read.parquet(storedDir).filter($"symbol" === "AAPL")
        .select("adj_close").as[Double].collect().toSeq
      assert(mid == Seq(42.0))

      // second poll: a later trade the next trigger firing must pick up
      Files.writeString(Paths.get(s"$in/poll1.json"),
        """{"symbol":"AAPL","price":43.5,"ts":"2024-01-02T15:01:00.000Z"}""" + "\n")
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    } finally q.stop()

    val fin = spark.read.parquet(storedDir)
      .select("symbol", "day", "open", "adj_close")
      .orderBy("symbol", "day").as[(String, Date, Double, Double)].collect().toSeq
    assert(fin == Seq(("AAPL", d("2024-01-02"), 10.0, 43.5)))
  }

  test("invalid trades land in the dead-letter side-output, valid ones merge") {
    val root = Files.createTempDirectory("livefeed4").toString
    val in = s"$root/in"; val storedDir = s"$root/stored"
    val ckpt = s"$root/ckpt"; val dead = s"$root/dead"
    Files.createDirectories(Paths.get(in))

    Seq(("AAPL", d("2024-01-02"), 10.0, 11.0))
      .toDF("symbol", "day", "open", "adj_close")
      .write.mode("overwrite").partitionBy("day").parquet(storedDir)

    // one valid update + two rejects (NaN price, missing ts)
    Files.writeString(Paths.get(s"$in/batch0.json"),
      """{"symbol":"AAPL","price":99.5,"ts":"2024-01-02T15:59:00.000Z"}
        |{"symbol":"BADP","price":"NaN","ts":"2024-01-02T16:00:00.000Z"}
        |{"symbol":"BADT","price":1.0}
        |""".stripMargin)

    val q = LiveFeed.startUpsertFrom(
      spark, LiveFeed.readTrades(spark, in), storedDir, ckpt,
      deadLetterDir = Some(dead))
    q.awaitTermination(120000)

    // nothing silently dropped: both invalid rows are in the side-output
    val rejected = spark.read.parquet(dead)
      .select("symbol").as[String].collect().toSeq.sorted
    assert(rejected == Seq("BADP", "BADT"))
    // and neither polluted the store
    val got = spark.read.parquet(storedDir)
      .select("symbol", "adj_close").as[(String, Double)].collect().toSeq
    assert(got == Seq(("AAPL", 99.5)))
  }

  test("windowedCounts compiles against a streaming source") {
    val root = Files.createTempDirectory("livefeed2").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    val agg = LiveFeed.windowedCounts(LiveFeed.readTrades(spark, s"$root/in"))
    assert(agg.isStreaming)
    assert(agg.columns.contains("n_trades") && agg.columns.contains("last_price"))
  }
}
