package graft

import graft.operators.ConnectedComponents
import graft.queries.TrainPipeline
import org.apache.spark.sql.functions._

import scala.util.Random

/** Invariants of the corpus-build family that the DuckDB hash-compare can't
  * express: packing feasibility, split determinism under repartitioning,
  * bounds on the quality fractions, and randomized equivalence of the two
  * connected-components strategies against a brute-force reference.
  */
class TrainPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("x9: no bin exceeds the budget unless a single doc does, bins are " +
    "contiguous per shard, and doc order within a bin is ascending") {
    val out = TrainPipeline.x9SeqPacking.fn(spark, sf)
      .select("doc_id", "shard", "bin", "n_tokens")
      .as[(Long, Int, Int, Int)].collect()
    val byShard = out.groupBy(_._2)
    byShard.foreach { case (shard, rows) =>
      val bins = rows.groupBy(_._3)
      // contiguity: bins 0..max all present
      assert(bins.keySet == (0 to bins.keys.max).toSet,
        s"shard $shard has gaps in bin ids: ${bins.keySet.toSeq.sorted}")
      bins.foreach { case (bin, members) =>
        val total = members.map(_._4).sum
        assert(total <= 256 || members.size == 1,
          s"shard $shard bin $bin holds $total tokens across ${members.size} docs")
      }
      // greedy order: doc_ids assigned to bins in nondecreasing bin order
      val sorted = rows.sortBy(_._1)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last),
        s"shard $shard: bin ids not monotone over doc order")
    }
  }

  test("p12: split assignment and sample membership are invariant under " +
    "physical repartitioning (the reproducibility contract)") {
    val a = TrainPipeline.p12StratifiedSample.fn(spark, sf)
      .as[(Long, String, String, Boolean)].collect().toSet
    // same query, fresh plan, different physical partitioning of the result:
    // the hash-keyed split/sample must be byte-identical (no RNG, no
    // partition-order sensitivity)
    val b = TrainPipeline.p12StratifiedSample.fn(spark, sf)
      .repartition(7)
      .as[(Long, String, String, Boolean)].collect().toSet
    assert(a == b)
    // per-stratum sample size = min(20, |stratum|)
    val bySource = a.groupBy(_._2)
    bySource.foreach { case (src, rows) =>
      assert(rows.count(_._4) == math.min(20, rows.size),
        s"stratum $src sampled ${rows.count(_._4)} of ${rows.size}")
    }
  }

  test("d6: duplicate-segment counts are bounded and the fraction is exact") {
    val rows = TrainPipeline.d6SegmentDedup.fn(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, dup, frac) =>
      assert(dup >= 0 && dup <= n, s"doc $id: $dup of $n dup segments")
      assert(frac == dup.toDouble / n, s"doc $id: frac mismatch")
    }
  }

  test("c1: contamination pairs never relate two eval docs or two train docs") {
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val pairs = TrainPipeline.c1Contamination.fn(spark, sf)
      .select("eval_doc", "train_doc").as[(Long, Long)].collect()
    pairs.foreach { case (e, t) =>
      assert(docs(e) == "src0", s"eval side $e is ${docs(e)}")
      assert(docs(t) != "src0", s"train side $t is src0")
    }
  }

  test("connected components: both strategies match a brute-force reference " +
    "on random graphs") {
    val rnd = new Random(42)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2)
      // brute force: repeated relaxation to fixpoint over an adjacency map
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var lbl = nodes.map(x => x -> x).toMap
      var moved = true
      while (moved) {
        moved = false
        edges.foreach { case (a, b) =>
          val m = math.min(lbl(a), lbl(b))
          if (lbl(a) != m) { lbl += a -> m; moved = true }
          if (lbl(b) != m) { lbl += b -> m; moved = true }
        }
      }
      val df = edges.toDF("a", "b")
      val fast = ConnectedComponents.minLabels(df)
        .as[(Long, Long)].collect().toMap
      val dist = ConnectedComponents.minLabels(df, smallGraphMaxEdges = 0)
        .as[(Long, Long)].collect().toMap
      assert(fast == lbl, s"trial $trial: union-find path diverged")
      assert(dist == lbl, s"trial $trial: distributed path diverged")
    }
  }
}
