package graft

import graft.functions.{FastVec, Sketch}
import org.apache.spark.sql.functions._

/** BottomKAgg (the TypedImperativeAggregate): set semantics, k-truncation,
  * partial/merge/serialize paths, and the KMV estimator's error envelope.
  */
class SketchSpec extends SparkSpec {

  test("bottom-k equals the sorted distinct k-smallest, independent of " +
    "partitioning (partial + serialized merge paths)") {
    import spark.implicits._
    FastVec.register(spark)
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(5000)(rnd.nextLong().abs % 100000)
    val expected = values.distinct.sorted.take(16)
    for (parts <- Seq(1, 3, 32)) {
      val got = values.toDF("v").repartition(parts)
        .agg(Sketch.bottomK(col("v"), 16).as("s"))
        .collect().head.getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("groups smaller than k return their whole distinct set, sorted") {
    import spark.implicits._
    FastVec.register(spark)
    val got = Seq(5L, 3L, 5L, 9L, 3L).toDF("v").repartition(4)
      .agg(Sketch.bottomK(col("v"), 16).as("s"))
      .collect().head.getSeq[Long](0)
    assert(got == Seq(3L, 5L, 9L))
  }

  test("per-group sketches are group-local (no cross-key leakage) and " +
    "the KMV estimate lands inside the 3/sqrt(k-2) envelope") {
    import spark.implicits._
    FastVec.register(spark)
    val k = 32
    val n = 5000
    // deterministic 60-bit hashes via the registered expression
    val df = spark.range(n)
      .selectExpr("id % 2 AS g", "graft_md5_60(cast(id as string)) AS hv")
    val rows = df.groupBy("g")
      .agg(Sketch.bottomK(col("hv"), k).as("s"),
        countDistinct(col("hv")).as("exact"))
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val sketch = r.getSeq[Long](1)
      val exact = r.getLong(2)
      assert(sketch.length == k && sketch == sketch.sorted)
      val est = (k - 1).toDouble * math.pow(2, 60) / sketch.last
      val relErr = math.abs(est - exact) / exact
      assert(relErr < 3.0 / math.sqrt(k - 2),
        s"group ${r.getLong(0)}: est $est vs exact $exact (relErr $relErr)")
    }
    // the two groups hash disjoint id sets — their sketches must differ
    assert(rows(0).getSeq[Long](1) != rows(1).getSeq[Long](1))
  }
}
