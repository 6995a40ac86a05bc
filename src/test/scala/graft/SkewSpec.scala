package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted join = plain join, exactly, on a deliberately skewed dataset. */
class SkewSpec extends SparkSpec {

  test("saltedJoin matches the plain inner join on a hot-key distribution") {
    import spark.implicits._
    // 10k rows on one hot key + a long tail
    val big = spark.range(10000).select(
      when(col("id") < 9000, lit("HOT")).otherwise(concat(lit("k"), col("id"))).as("k"),
      col("id").as("rowid"))
    val small = Seq(("HOT", 1.0), ("k9001", 2.0), ("k9500", 3.0), ("MISS", 4.0))
      .toDF("k", "weight")

    val plain = big.join(small, Seq("k")).select("k", "rowid", "weight")
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("rowid"), 16)
      .select("k", "rowid", "weight")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the hot key's rows really spread across buckets
    val spread = big
      .withColumn("_salt", pmod(xxhash64(col("rowid")), lit(16)))
      .filter(col("k") === "HOT")
      .select(countDistinct(col("_salt")))
      .as[Long].head()
    assert(spread == 16, s"hot key only reached $spread of 16 buckets")
  }
}
