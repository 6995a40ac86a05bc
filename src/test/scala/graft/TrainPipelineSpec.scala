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

  test("v6: load factors average to exactly 1, the Lorenz cumulative share " +
    "is monotone and ends at 1, and shard totals reconcile with the corpus") {
    val rows = graft.queries.MiscQueries.v6ShardSkew.fn(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(rows.length == 8 && rows.map(_._1).toSet == (0 until 8).toSet)
    val total = rows.map(_._3).sum
    val corpus = Tables.table(spark, sf, "documents")
      .select(size(split(col("text"), " ")).as("n")).agg(sum("n"))
      .as[Long].collect().head
    assert(total == corpus, s"shard tokens $total != corpus tokens $corpus")
    assert(math.abs(rows.map(_._4).sum - 8.0) < 1e-9, "load factors must sum to n_shards")
    val lorenz = rows.sortBy(r => (r._3, r._1)).map(_._5)
    assert(lorenz.zip(lorenz.tail).forall { case (x, y) => x <= y }, "cum_share not monotone")
    assert(math.abs(lorenz.last - 1.0) < 1e-9)
  }

  test("v7: data-card totals reconcile with a brute-force per-source " +
    "recount, and rates stay inside [0, 1]") {
    val rows = graft.queries.MiscQueries.v7DataCard.fn(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    val raw = Tables.table(spark, sf, "documents")
      .select(col("source"), col("lang"), col("text")).as[(String, String, String)]
      .collect()
    val bySource = raw.groupBy(_._1)
    assert(rows.map(_._1).toSet == bySource.keySet)
    rows.foreach { case (src, nDocs, nTokens, nLangs, dupRate, shortFrac) =>
      val docs = bySource(src)
      assert(nDocs == docs.length, s"$src n_docs")
      assert(nTokens == docs.map(_._3.split(" ", -1).length.toLong).sum, s"$src tokens")
      assert(nLangs == docs.map(_._2).distinct.length, s"$src langs")
      val fps = docs.map(_._3.split(" ", -1).take(8).mkString(" ")).distinct.length
      assert(math.abs(dupRate - (1.0 - fps.toDouble / docs.length)) < 1e-12, s"$src dup")
      assert(dupRate >= 0.0 && dupRate < 1.0 && shortFrac >= 0.0 && shortFrac <= 1.0)
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

  test("c6: leak fraction is exact on a handcrafted corpus — full dup = 1.0, " +
    "partial 8-gram overlap is graded, clean doc = 0.0") {
    val run20 = (1 to 20).map(i => s"r$i")  // 13 distinct 8-grams
    val docs = Seq(
      // eval (src0)
      (1L, run20.mkString(" "), "src0"),                                // exact dup of 10 → 1.0
      (2L, (run20.take(8) ++ (1 to 12).map(i => s"u$i")).mkString(" "), "src0"), // 1 of 13 leaked
      (3L, (1 to 20).map(i => s"c$i").mkString(" "), "src0"),           // clean → 0.0
      (5L, (1 to 5).map(i => s"q$i").mkString(" "), "src0"),            // < 8 tokens: no shingles
      // train
      (10L, run20.mkString(" "), "src1"),
      (11L, (1 to 15).map(i => s"z$i").mkString(" "), "src2")
    ).map { case (id, txt, src) => (id, txt, "en", src, txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("c6spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TrainPipeline.c6FuzzyDecontam.fn(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((13L, 13L, true)), s"got ${out(1L)}")
    // doc 2: 13 distinct 8-grams, only tokens 1..8 == run20.take(8) is shared
    assert(out(2L) == ((13L, 1L, false)), s"got ${out(2L)}")
    assert(out(3L) == ((13L, 0L, false)), s"got ${out(3L)}")
    // a too-short eval doc still gets a verdict row, never silently dropped
    assert(out(5L) == ((0L, 0L, false)), s"got ${out(5L)}")
  }

  test("c10: phases cover every doc once, are quality-ordered ranges with " +
    "bucket-bounded quartile sizes, and per-shard positions are contiguous") {
    val out = TrainPipeline.c10Curriculum.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect() // phase, shard, pos, doc_id, qq
    val nDocs = Tables.table(spark, sf, "documents").count()
    assert(out.map(_._4).distinct.length == nDocs, "docs dropped or duplicated")
    val byPhase = out.groupBy(_._1)
    assert(byPhase.keySet.forall(p => p >= 0 && p <= 3))
    // phases are non-overlapping quality ranges: max(qq) of phase k is at
    // most min(qq) of phase k+1 (equal only never — buckets are atomic)
    val ranges = byPhase.toSeq.sortBy(_._1)
      .map { case (p, rows) => (p, rows.map(_._5).min, rows.map(_._5).max) }
    ranges.sliding(2).foreach {
      case Seq((pa, _, maxA), (pb, minB, _)) =>
        assert(maxA < minB, s"phase $pa [..$maxA] overlaps phase $pb [$minB..]")
      case _ => ()
    }
    // quartile balance up to one quality bucket's worth of ties
    val maxBucket = out.groupBy(_._5).values.map(_.length).max
    byPhase.foreach { case (p, rows) =>
      assert(rows.length <= nDocs / 4 + maxBucket,
        s"phase $p has ${rows.length} docs (bucket bound ${nDocs / 4 + maxBucket})")
    }
    out.groupBy(r => (r._1, r._2)).foreach { case ((p, sh), rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length),
        s"phase $p shard $sh positions not contiguous")
    }
  }

  test("c7: every epoch is a complete, reproducible permutation and " +
    "epochs order documents differently") {
    val out = TrainPipeline.c7EpochShuffle.fn(spark, sf)
      .as[(Long, Long, Long, Long)].collect()   // epoch, shard, pos, doc_id
    val nDocs = Tables.table(spark, sf, "documents").count()
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (ep, rows) =>
      // completeness: each doc appears exactly once per epoch
      assert(rows.map(_._4).distinct.length == nDocs, s"epoch $ep incomplete")
      // per-shard positions are 1..k contiguous
      rows.groupBy(_._2).foreach { case (shard, srows) =>
        assert(srows.map(_._3).sorted.sameElements(1L to srows.length),
          s"epoch $ep shard $shard positions not contiguous")
      }
    }
    // epochs permute differently: the (shard, pos) → doc map differs
    val e0 = byEpoch(0L).map(r => (r._2, r._3) -> r._4).toMap
    val e1 = byEpoch(1L).map(r => (r._2, r._3) -> r._4).toMap
    assert(e0 != e1, "epoch 0 and 1 produced the identical order")
    // reproducibility under physical repartitioning
    val again = TrainPipeline.c7EpochShuffle.fn(spark, sf)
      .repartition(7)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again == out.toSet)
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
