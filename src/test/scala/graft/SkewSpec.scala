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

  test("autoSaltedJoin salts only census-hot keys, matches the plain join, " +
    "and degrades to the unmodified join on balanced data") {
    import spark.implicits._
    val big = spark.range(10000).select(
      when(col("id") < 9000, lit("HOT")).otherwise(concat(lit("k"), col("id"))).as("k"),
      col("id").as("rowid"))
    val small = Seq(("HOT", 1.0), ("k9001", 2.0), ("k9500", 3.0), ("MISS", 4.0))
      .toDF("k", "weight")

    val plain = big.join(small, Seq("k")).select("k", "rowid", "weight")
    val auto = Skew.autoSaltedJoin(big, small, Seq("k"), col("rowid"), 16)
      .select("k", "rowid", "weight")
    assert(auto.count() == plain.count())
    assert(auto.exceptAll(plain).isEmpty && plain.exceptAll(auto).isEmpty)

    // balanced data: no key clears the share threshold, so the call
    // returns the plain join itself (no _salt machinery in the plan)
    val balBig = spark.range(1000).select(
      concat(lit("k"), col("id") % 500).as("k"), col("id").as("rowid"))
    val balSmall = Seq(("k1", 1.0), ("k2", 2.0)).toDF("k", "weight")
    val balAuto = Skew.autoSaltedJoin(balBig, balSmall, Seq("k"), col("rowid"), 16)
    assert(!balAuto.queryExecution.analyzed.toString.contains("_salt"),
      "balanced data should take the plain-join fast path")
    assert(balAuto.count() == balBig.join(balSmall, Seq("k")).count())

    // empty big side: no NPE/divide-by-zero in the census
    val empty = big.filter(col("rowid") < 0)
    assert(Skew.autoSaltedJoin(empty, small, Seq("k"), col("rowid"), 16).count() == 0)
  }
}
