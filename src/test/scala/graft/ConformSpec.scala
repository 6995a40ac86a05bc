package graft

import graft.operators.Conform
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Conform covers the reference's normalization repairs (SURVEY §1.3):
  * rename `close`→`adj_close` (`download_historical_price.py:423`),
  * lowercase + `'Adj Close'` handling (`dhp:502-505`), add-missing-as-null
  * (`update_live_price.py:244-248`), NaN→null canonicalization (§7.3.2).
  */
class ConformSpec extends SparkSpec {

  private val ts = Timestamp.valueOf("2024-01-02 00:00:00")

  test("renames vendor close columns to adj_close and lowercases") {
    val in = spark.createDataFrame(
      java.util.List.of(Row(ts, 10.0), Row(ts, 11.0)),
      StructType(Seq(
        StructField("Timestamp", TimestampType),
        StructField("Adj Close", DoubleType))))
    val out = Conform.conform(in)
    assert(out.columns.toSeq == Conform.barSchema.fieldNames.toSeq)
    assert(out.select("adj_close").collect().map(_.getDouble(0)).sorted.toSeq == Seq(10.0, 11.0))
  }

  test("adds missing canonical columns as null") {
    val in = spark.createDataFrame(
      java.util.List.of(Row(ts, 10.0)),
      StructType(Seq(
        StructField("timestamp", TimestampType),
        StructField("close", DoubleType))))
    val out = Conform.conform(in)
    val row = out.collect().head
    Seq("open", "high", "low", "volume", "trade_count", "vwap").foreach { c =>
      assert(row.isNullAt(out.columns.indexOf(c)), s"$c should be null")
    }
    assert(row.getDouble(out.columns.indexOf("adj_close")) == 10.0)
  }

  test("canonicalizes NaN to null in double columns") {
    val in = spark.createDataFrame(
      java.util.List.of(Row(ts, Double.NaN, 5.0)),
      StructType(Seq(
        StructField("timestamp", TimestampType),
        StructField("close", DoubleType),
        StructField("volume", DoubleType))))
    val row = Conform.conform(in).collect().head
    assert(row.isNullAt(4), "NaN close must become null adj_close")
    assert(row.getDouble(5) == 5.0)
  }

  test("drops non-canonical columns") {
    val in = spark.createDataFrame(
      java.util.List.of(Row(ts, 1.0, "AAPL")),
      StructType(Seq(
        StructField("timestamp", TimestampType),
        StructField("close", DoubleType),
        StructField("symbol", StringType))))
    assert(!Conform.conform(in).columns.contains("symbol"))
  }

  test("is idempotent (projection fixpoint)") {
    val in = spark.createDataFrame(
      java.util.List.of(Row(ts, 1.0, 2.0)),
      StructType(Seq(
        StructField("Timestamp", TimestampType),
        StructField("Close", DoubleType),
        StructField("Volume", DoubleType))))
    val once = Conform.conform(in)
    val twice = Conform.conform(once)
    assert(once.schema == twice.schema)
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}
