package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

/** A6 merge semantics (SURVEY §7.3.4, `update_live_price.py:250-283`):
  * matched key updates ONLY adj_close preserving other columns; new key
  * inserts null-padded; last-write-wins within a batch; idempotence.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)
  private def ts(s: String) = Timestamp.valueOf(s)

  private def stored = Seq(
    ("AAPL", d("2024-01-02"), 10.0, 12.0, 9.0, 11.0, 1000.0),
    ("AAPL", d("2024-01-03"), 11.0, 13.0, 10.0, 12.0, 1100.0),
    ("MSFT", d("2024-01-02"), 20.0, 22.0, 19.0, 21.0, 2000.0)
  ).toDF("symbol", "day", "open", "high", "low", "adj_close", "volume")

  test("matched key overwrites only adj_close, preserving other columns") {
    val incoming = Seq(("AAPL", d("2024-01-03"), 99.5, ts("2024-01-03 15:59:00")))
      .toDF("symbol", "day", "price", "ts")
    val out = Merge
      .upsertDailyClose(stored, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
      .orderBy("symbol", "day").collect()
    val updated = out.find(r => r.getString(0) == "AAPL" && r.getDate(1) == d("2024-01-03")).get
    assert(updated.getDouble(updated.fieldIndex("adj_close")) == 99.5)
    assert(updated.getDouble(updated.fieldIndex("open")) == 11.0)
    assert(updated.getDouble(updated.fieldIndex("volume")) == 1100.0)
    // untouched rows unchanged
    val other = out.find(r => r.getString(0) == "MSFT").get
    assert(other.getDouble(other.fieldIndex("adj_close")) == 21.0)
  }

  test("new key inserts a row null everywhere except adj_close") {
    val incoming = Seq(("TSLA", d("2024-01-04"), 50.0, ts("2024-01-04 10:00:00")))
      .toDF("symbol", "day", "price", "ts")
    val out = Merge
      .upsertDailyClose(stored, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
      .filter($"symbol" === "TSLA").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(r.fieldIndex("adj_close")) == 50.0)
    Seq("open", "high", "low", "volume").foreach(c => assert(r.isNullAt(r.fieldIndex(c)), c))
  }

  test("last-write-wins within a batch by trade timestamp") {
    val incoming = Seq(
      ("AAPL", d("2024-01-03"), 1.0, ts("2024-01-03 09:00:00")),
      ("AAPL", d("2024-01-03"), 2.0, ts("2024-01-03 16:00:00")),
      ("AAPL", d("2024-01-03"), 1.5, ts("2024-01-03 12:00:00"))
    ).toDF("symbol", "day", "price", "ts")
    val out = Merge
      .upsertDailyClose(stored, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
      .filter($"symbol" === "AAPL" && $"day" === d("2024-01-03")).collect().head
    assert(out.getDouble(out.fieldIndex("adj_close")) == 2.0)
  }

  test("merge is idempotent: applying the same batch twice equals once") {
    val incoming = Seq(
      ("AAPL", d("2024-01-03"), 99.5, ts("2024-01-03 15:59:00")),
      ("TSLA", d("2024-01-04"), 50.0, ts("2024-01-04 10:00:00"))
    ).toDF("symbol", "day", "price", "ts")
    def merge(df: org.apache.spark.sql.DataFrame) = Merge
      .upsertDailyClose(df, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
      .select("symbol", "day", "open", "high", "low", "adj_close", "volume")
    val once = merge(stored).orderBy("symbol", "day").collect().toSeq
    val twice = merge(merge(stored)).orderBy("symbol", "day").collect().toSeq
    assert(once == twice)
  }

  test("row count = stored ∪ incoming keys") {
    val incoming = Seq(
      ("AAPL", d("2024-01-03"), 99.5, ts("2024-01-03 15:59:00")),
      ("TSLA", d("2024-01-04"), 50.0, ts("2024-01-04 10:00:00"))
    ).toDF("symbol", "day", "price", "ts")
    val n = Merge
      .upsertDailyClose(stored, incoming, Seq("symbol", "day"), "price", "ts", "adj_close")
      .count()
    assert(n == 4) // 3 stored keys + 1 new
  }
}
