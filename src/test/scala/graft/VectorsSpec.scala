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
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.SimilarityQueries.e9AnnRecall
      .fn(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.map(_._1).toSeq ==
      Seq("e13_ivf_pq", "e14_filtered", "e25_balanced", "e27_range",
        "e28_multiprobe", "e29_pq_refine", "e2_ivf", "e4_kmeans",
        "e5_hyperplane"))
    // e14's coverage row divides by the filter-surviving truth size (exact
    // top-10 members with label >= 2 AND within-label rank <= 5 — e14's
    // own per-label depth cut), not 10
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy($"sim".desc, $"vec_id")
    val kf = math.max(graft.queries.SimilarityQueries.e1CosineTopK.fn(spark, sf)
      .filter($"label" >= 2)
      .withColumn("lrk", row_number().over(wl))
      .filter($"lrk" <= 5).count(), 1L)
    // e25 divides by the exact pair truth's size, e27 by the exact
    // floor-neighbor set's size (the r11 variant-specific truths)
    val kp = math.max(
      graft.queries.SimilarityQueries.pairTruth(spark, sf).count(), 1L)
    val kr = math.max(
      graft.queries.SimilarityQueries.rangeTruth(spark, sf).count(), 1L)
    rows.foreach { case (v, overlap, recall) =>
      val denom = v match {
        case "e14_filtered" => kf
        case "e25_balanced" => kp
        case "e27_range" => kr
        case _ => 10L
      }
      assert(overlap >= 0 && overlap <= denom,
        s"$v overlap $overlap out of [0, $denom]")
      assert(recall == overlap.toDouble / denom,
        s"$v recall $recall != $overlap/$denom")
    }
    // filtered search is exact within its predicate: full coverage expected
    assert(rows.find(_._1 == "e14_filtered").get._3 == 1.0,
      "e14 lost a filter-passing member of the exact top-10")
  }

  test("e10: 10 distinct picks ranked 1..10, the first pick is the pure " +
    "relevance winner, diversity actually reorders, and the run is " +
    "reproducible") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.SimilarityQueries.e10MmrRerank
      .fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect() // rank, vec_id, qrel, score10
    assert(rows.map(_._1).toSeq == (1L to 10L))
    assert(rows.map(_._2).distinct.length == 10)
    // rank 1 is pure relevance (empty penalty set): score10 == 7·qrel and
    // it matches e1's brute-force top result
    val first = rows.head
    assert(first._4 == 7 * first._3, "rank-1 score is not 7*qrel")
    val e1Top = graft.queries.SimilarityQueries.e1CosineTopK.fn(spark, sf)
      .select("vec_id").as[Long].head()
    assert(first._2 == e1Top, s"rank-1 pick ${first._2} != e1 top $e1Top")
    // diversity: picked qrels are NOT in pure-relevance order (the penalty
    // term must have reordered at least one step on this corpus)
    val qrels = rows.map(_._3).toSeq
    assert(qrels != qrels.sorted.reverse, "MMR degenerated to pure top-k")
    // the penalty term is a cosine in [−1, 1] quantized to 2^-20:
    // score10 = 7·qrel − 3·qmax stays within 3·2^20 of pure relevance
    // (negative qmax legitimately RAISES the score above 7·qrel)
    rows.tail.foreach { case (r, v, qrel, s10) =>
      assert(math.abs(s10 - 7 * qrel) <= 3L * (1L << 20),
        s"rank $r vec $v score $s10 outside the cosine penalty envelope")
    }
    val again = graft.queries.SimilarityQueries.e10MmrRerank.fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(again.toSeq == rows.toSeq)
  }

  test("e10: a candidate pool smaller than k yields a short result, not a " +
    "crash (review regression: rels(-1) on pool exhaustion)") {
    val dir = java.nio.file.Files.createTempDirectory("e10small").toString
    val rnd = new scala.util.Random(7)
    val rows = (0L to 5L).map { id =>
      (id, Array.fill(8)(rnd.nextFloat()), id.toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.SimilarityQueries.e10MmrRerank.fn(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 5, s"expected 5 picks from a 5-candidate pool, got ${out.length}")
    assert(out.map(_._1).toSeq == (1L to 5L))
    assert(out.map(_._2).toSet == (1L to 5L).toSet, "every candidate picked once")
  }

  test("e11: QA totals reconcile with the table, dims are consistent, and " +
    "the norm envelope brackets the mean") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.SimilarityQueries.e11EmbeddingQa.fn(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long, Double)].collect()
    val total = Tables.table(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == total, "per-label counts lose vectors")
    rows.foreach { case (label, n, nDims, nZero, qMin, qMax, mean) =>
      assert(nDims == 1, s"label $label has $nDims distinct dims")
      assert(nZero >= 0 && nZero <= n)
      assert(qMin <= qMax, s"label $label norm envelope inverted")
      val q20 = (1L << 20).toDouble
      assert(mean >= qMin / q20 - 1e-12 && mean <= qMax / q20 + 1e-12,
        s"label $label mean norm $mean outside [$qMin, $qMax]/2^20")
    }
  }
}
