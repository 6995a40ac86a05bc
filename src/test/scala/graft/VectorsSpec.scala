package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-12

  test("dot, norm, cosine, l2sq on known vectors") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(
        Vectors.dot(Vectors.toDoubleVec($"a"), Vectors.toDoubleVec($"b")).as("dot"),
        Vectors.cosine(Vectors.toDoubleVec($"a"), Vectors.toDoubleVec($"a")).as("selfcos"),
        Vectors.l2sq(Vectors.toDoubleVec($"a"), Vectors.toDoubleVec($"b")).as("l2"))
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 32.0) < eps)
    assert(math.abs(r.getDouble(1) - 1.0) < eps, "cosine(v,v) == 1")
    assert(math.abs(r.getDouble(2) - 27.0) < eps)
  }

  test("orthogonal vectors have cosine 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(Vectors.cosine(Vectors.toDoubleVec($"a"), Vectors.toDoubleVec($"b")).as("c"))
    assert(math.abs(df.collect().head.getDouble(0)) < eps)
  }

  test("e9 recall harness: one row per ANN variant, overlap bounded by k, " +
    "recall is exactly overlap/k") {
    val rows = graft.queries.SimilarityQueries.e9AnnRecall
      .fn(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("e2_ivf", "e4_kmeans", "e5_hyperplane"))
    rows.foreach { case (v, overlap, recall) =>
      assert(overlap >= 0 && overlap <= 10, s"$v overlap $overlap out of range")
      assert(recall == overlap / 10.0, s"$v recall $recall != $overlap/10")
    }
  }
}
