package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Exactness of the frontier/pointer-jumping min-label propagation: labels
  * must equal the component's minimum node id — the same min-reachable-id a
  * recursive-CTE oracle computes (d5's contract).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Every graph is solved on BOTH strategies — the driver union-find fast
    * path (default threshold) and the distributed Pregel loop (threshold 0
    * forces it) — and the two labelings must agree exactly.
    */
  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val small = ConnectedComponents.minLabels(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents
      .minLabels(pairs.toDF("a", "b"), smallGraphMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(small == dist,
      s"union-find fast path and distributed path disagree: $small vs $dist")
    small
  }

  test("a long chain converges to the minimum id (multi-round + jump)") {
    // 1-2-3-...-12 as consecutive edges: diameter 11, so naive one-hop
    // propagation needs 11 rounds; pointer jumping must still get the
    // exact answer (and in far fewer rounds).
    val chain = (1L until 12L).map(i => (i, i + 1))
    val got = labelsOf(chain)
    assert(got == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate minima") {
    val got = labelsOf(Seq((5L, 9L), (9L, 7L), (20L, 30L), (3L, 4L)))
    assert(got == Map(5L -> 5L, 9L -> 5L, 7L -> 5L,
      20L -> 20L, 30L -> 20L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicate and reversed edges do not change the labeling") {
    val base = Seq((1L, 2L), (2L, 3L))
    val noisy = base ++ Seq((2L, 1L), (3L, 2L), (1L, 2L))
    assert(labelsOf(base) == labelsOf(noisy))
  }

  test("empty edge set → empty labeling") {
    val empty = Seq.empty[(Long, Long)]
    assert(labelsOf(empty).isEmpty)
  }

  test("star graph converges in one round regardless of arm count") {
    val star = (2L to 40L).map(i => (1L, i))
    val got = labelsOf(star)
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
  }
}
