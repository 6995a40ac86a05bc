package graft

import graft.operators.Merge
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.{Date, Timestamp}

/** Property-based invariants (SURVEY §5.2): merge idempotence and
  * key-preservation over randomized batches. Uses raw ScalaCheck `Gen`
  * with fixed seeds (the scalatest bridge isn't in the offline dep cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val symGen = Gen.oneOf("AAPL", "MSFT", "TSLA", "NVDA")
  private val dayGen = Gen.choose(1, 5).map(i => Date.valueOf(f"2024-01-$i%02d"))
  private val tradeGen = for {
    s <- symGen; day <- dayGen
    p <- Gen.choose(1.0, 500.0)
    hour <- Gen.choose(9, 16)
  } yield (s, day, p, Timestamp.valueOf(f"${day.toString} $hour%02d:00:00"))

  private val stored = Seq(
    ("AAPL", Date.valueOf("2024-01-02"), 10.0, 11.0),
    ("MSFT", Date.valueOf("2024-01-03"), 20.0, 21.0)
  ).toDF("symbol", "day", "open", "adj_close")

  private def sample(seed: Long): List[(String, Date, Double, Timestamp)] =
    Gen.listOfN(6, tradeGen)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(Nil)

  test("merge(merge(df,x),x) == merge(df,x) and keys are preserved") {
    (1L to 5L).foreach { seed =>
      val trades = sample(seed)
      assert(trades.nonEmpty, s"generator must produce trades for seed $seed")
      val batch = trades.toDF("symbol", "day", "price", "ts")
      def m(df: org.apache.spark.sql.DataFrame) =
        Merge.upsertDailyClose(df, batch, Seq("symbol", "day"), "price", "ts", "adj_close")
      val once = m(stored).orderBy("symbol", "day").collect().toSeq
      val twice = m(m(stored)).orderBy("symbol", "day").collect().toSeq
      assert(once == twice, s"idempotence failed for seed $seed")
      val keys = once.map(r => (r.getString(0), r.getDate(1).toString)).toSet
      val expected = stored.collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet ++
        trades.map(t => (t._1, t._2.toString)).toSet
      assert(keys == expected, s"key preservation failed for seed $seed")
    }
  }

  test("qsum is exact on fixed-point inputs regardless of partitioning " +
    "(equals the BigDecimal sum, unlike a naive double sum)") {
    val centsGen = Gen.choose(-50_000_000L, 50_000_000L) // ±500k, 2dp
    (1L to 5L).foreach { seed =>
      val cents = Gen.listOfN(500, centsGen)
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      assert(cents.nonEmpty)
      val exact = cents.map(c => BigDecimal(c) / 100).sum.toDouble
      Seq(1, 7).foreach { parts =>
        val got = cents.map(_ / 100.0).toDF("x")
          .repartition(parts)
          .agg(graft.Q.qsum(org.apache.spark.sql.functions.col("x"), 2))
          .head.getDouble(0)
        assert(got == exact,
          s"seed $seed parts $parts: qsum $got != exact $exact")
      }
    }
  }
}
