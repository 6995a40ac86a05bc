package graft

import graft.functions.{FastVec, Text}
import org.apache.spark.sql.functions._

/** The fused md5-prefix hash must be numerically identical to the builtin
  * `conv(substring(md5(x), 1, n), 16, 10)` spelling it replaces — that
  * spelling IS the DuckDB oracle contract for d3/d4/d5.
  */
class FastHashSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private val samples = Seq(
    "", "a", "the quick brown fox", "0|some shingle text",
    "7|unicode éü中文", "spaces  and\ttabs",
    "a longer document body with enough words to look like a real shingle")

  test("graft_md5_60 equals conv(substring(md5,1,15),16,10)") {
    FastVec.register(spark)
    val df = samples.toDF("s")
    val got = df.select(
      call_function("graft_md5_60", col("s")).as("fused"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("builtin"))
    assert(got.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("graft_md5_32 equals conv(substring(md5,1,8),16,10)") {
    FastVec.register(spark)
    val df = samples.toDF("s")
    val got = df.select(
      call_function("graft_md5_32", col("s")).as("fused"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("builtin"))
    assert(got.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("seededHash64/tokenHash32 route through the fused expression and stay codegen-resident") {
    val df = Tables.table(spark, sf, "documents")
      .select(Text.seededHash64(lit(3), col("text")).as("h60"),
        Text.tokenHash32(col("text")).as("h32"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_md5_60"), plan)
    assert(plan.contains("graft_md5_32"), plan)
    assert(!plan.contains("conv("), plan)
    // equivalence on real corpus text at sf0.001
    val docs = Tables.table(spark, sf, "documents").limit(200)
    val eq = docs.select(
      Text.seededHash64(lit(1), col("text")).as("fused"),
      conv(substring(md5(concat(lit("1"), lit("|"), col("text"))), 1, 15), 16, 10)
        .cast("long").as("builtin"))
    assert(eq.collect().forall(r => r.getLong(0) == r.getLong(1)))
    // null flows through as null
    val n = samples.toDF("s")
      .select(Text.tokenHash32(when(col("s") === "", null).otherwise(col("s"))).as("h"))
    assert(n.filter(col("h").isNull).count() == 1)
  }
}
