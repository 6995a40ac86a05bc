package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._

/** e25's two-level balanced cell machinery, unit-tested where the split
  * is GUARANTEED to trigger: distinct colinear points with a tiny cap.
  */
class BalancedIvfSpec extends SparkSpec {
  import spark.implicits._

  private def lineEmb(n: Int) = {
    graft.functions.FastVec.register(spark)
    (0 until n).map(i => (i.toLong, Seq(i.toDouble, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "v")
  }

  test("oversized cells split into >= 4 non-empty subcells; the split " +
    "strictly reduces the worst cell; unsplit cells keep scid = -1; the " +
    "final cells partition the ids") {
    val emb = lineEmb(20)
    // slim schema (r13): (vec_id, cid, scid, arank) — no payload column
    val fin = SimilarityQueries.balancedCells(emb, nC = 2, cap = 5).collect()
    // partition: every id exactly once (hard assignment default)
    assert(fin.map(_.getLong(0)).sorted.toSeq == (0L until 20L), "ids must partition")
    assert(fin.forall(_.getInt(3) == 1), "hard assignment must rank every row 1")
    val coarse = fin.groupBy(_.getLong(1)).map { case (_, rs) => rs.length }
    val finalCells = fin.groupBy(r => (r.getLong(1), r.getLong(2)))
      .map { case (_, rs) => rs.length }
    // with 20 points over 2 coarse cells, at least one cell exceeds cap=5
    assert(coarse.max > 5, s"test setup must create an oversized cell: $coarse")
    // every member of an oversized cell carries a real scid; distinct
    // colinear points make each of the 4 sub-centroids its own nearest,
    // so >= 4 non-empty subcells exist per split cell
    val splitCids = fin.filter(_.getLong(2) >= 0).map(_.getLong(1)).toSet
    for (cid <- splitCids) {
      val subs = fin.filter(r => r.getLong(1) == cid).map(_.getLong(2)).toSet
      assert(!subs.contains(-1L), s"cell $cid must be fully split: $subs")
      assert(subs.size >= 4, s"cell $cid split into only ${subs.size} subcells")
    }
    // balance: the worst FINAL cell is strictly smaller than the worst
    // coarse cell (>= 4 non-empty subcells of a size-S cell bound the
    // largest at S - 3)
    assert(finalCells.max < coarse.max,
      s"split must reduce the worst cell: coarse=$coarse final=$finalCells")
    // unsplit cells pass through untouched
    val unsplit = fin.filter(_.getLong(2) == -1L).map(_.getLong(1)).toSet
    assert((unsplit intersect splitCids).isEmpty, "a cell cannot be both split and unsplit")
  }

  test("determinism: two runs (and a repartitioned input) produce " +
    "identical final cells — the draws and argmins are tie-broken") {
    val emb = lineEmb(30)
    def cells(df: org.apache.spark.sql.DataFrame) =
      SimilarityQueries.balancedCells(df, nC = 3, cap = 6)
        .select("vec_id", "cid", "scid").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val a = cells(emb)
    val b = cells(emb.repartition(7))
    assert(a == b, "cell assignment must be partitioning-invariant")
  }
}
