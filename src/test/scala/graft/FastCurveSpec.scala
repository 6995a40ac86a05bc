package graft

import graft.functions.{FastCurve, FastVec, GraftCurve}
import org.apache.spark.sql.functions._

/** Proofs for the Hilbert-curve layout key (p19):
  *  - bijection onto [0, 4^bits) — every cell gets exactly one index;
  *  - unit-step adjacency — consecutive indices are always 4-neighbors,
  *    the locality guarantee Morton interleaving lacks and the reason
  *    p19's n_runs column favors Hilbert;
  *  - the prefix property — `d div 256` equals the 4-bit Hilbert index of
  *    the 16×16 tile, so div-256 buckets are ALIGNED tiles and zone-map
  *    pruning reads the identical tile set as z-order (p19's
  *    buckets_read/rows_read equality is by construction, not luck);
  *  - the registered codegen expression equals the Scala walk on the full
  *    8-bit grid (the DuckDB oracle mirrors the same walk as an unrolled
  *    CTE chain — `MiscQueries.sqlHilbertCtes`).
  */
class FastCurveSpec extends SparkSpec {

  private val n = 256
  private lazy val grid: Map[Long, (Int, Int)] = {
    val m = scala.collection.mutable.Map.empty[Long, (Int, Int)]
    for (x <- 0 until n; y <- 0 until n) {
      val d = GraftCurve.hilbertXY2D(x.toLong, y.toLong, 8)
      assert(!m.contains(d), s"index $d assigned twice: ${m.get(d)} and ($x, $y)")
      m(d) = (x, y)
    }
    m.toMap
  }

  test("hilbertXY2D is a bijection onto [0, 65536) at 8 bits") {
    assert(grid.size == 65536)
    assert(grid.keys.min == 0L && grid.keys.max == 65535L)
  }

  test("consecutive Hilbert indices are always grid neighbors (|dx| + |dy| = 1)") {
    (0L until 65535L).foreach { d =>
      val (x1, y1) = grid(d)
      val (x2, y2) = grid(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"indices $d -> ${d + 1} jump from ($x1, $y1) to ($x2, $y2)")
    }
  }

  test("prefix property: d div 256 is the 4-bit Hilbert index of the 16x16 tile") {
    for (x <- 0 until n; y <- 0 until n) {
      val d = GraftCurve.hilbertXY2D(x.toLong, y.toLong, 8)
      assert(d / 256 == GraftCurve.hilbertXY2D(x.toLong / 16, y.toLong / 16, 4),
        s"div-256 bucket of ($x, $y) is not its tile's 4-bit index")
    }
  }

  test("registered graft_hilbert expression matches the Scala walk on the full grid") {
    FastVec.register(spark)
    val rows = spark.range(65536)
      .select(expr("id % 256").as("x"), expr("id div 256").as("y"))
      .select(col("x"), col("y"), FastCurve.hilbert(col("x"), col("y"), 8).as("d"))
      .collect()
    assert(rows.length == 65536)
    rows.foreach { r =>
      val (x, y, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(d == GraftCurve.hilbertXY2D(x, y, 8), s"expression diverges at ($x, $y)")
    }
  }
}
