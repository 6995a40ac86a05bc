package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit bloom-filter runtime reduction (consumed by `j11_bloom_semi_join`).
  *
  * The build side's keys fold into an m-bit, k-hash bitmap whose DISTINCT
  * bit positions are collected to the driver — bounded at ≤ m rows
  * REGARDLESS of build cardinality, the same contract as Spark's own
  * InjectRuntimeFilter (a bounded sketch ships to the probe scan). The
  * probe-side predicate is pure codegen arithmetic over the bitmap
  * literal (`shiftright(element_at(...))`), so non-members die inside the
  * scan stage before any join shuffle. Membership is one-sided: a build
  * key can NEVER fail the test (no false negatives — PropertySpec), so a
  * trailing exact join makes any consumer exact while the bloom stays a
  * pure optimization.
  */
object Bloom {

  /** Bit positions of `key` under hash seed `i`, as a Column (engine side). */
  private def pos(i: Int, key: Column, m: Int): Column =
    pmod(xxhash64(lit(i), key), lit(m.toLong))

  /** Build the bitmap: one distinct-position aggregate + a bounded collect. */
  def build(df: DataFrame, key: String, m: Int, k: Int): Array[Long] = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val positions = df
      .select(explode(array((0 until k).map(i => pos(i, col(key), m)): _*)).as("p"))
      .distinct()
      .collect().map(_.getLong(0)) // bounded: ≤ m distinct bit positions
    val bm = new Array[Long](m / 64)
    positions.foreach(p => bm(p.toInt / 64) |= (1L << (p.toInt % 64)))
    bm
  }

  /** SQL predicate string testing `keyExpr`'s k bits against a bitmap bound
    * to column `bmCol` (add it via `withColumn(bmCol, typedLit(bm.toSeq))`).
    */
  def hitSql(bmCol: String, keyExpr: String, m: Int, k: Int): String =
    (0 until k).map { i =>
      val p = s"pmod(xxhash64($i, $keyExpr), $m)"
      s"(shiftright(element_at($bmCol, CAST($p div 64 AS INT) + 1), CAST($p % 64 AS INT)) & 1) = 1"
    }.mkString(" AND ")

  /** Filter `probe` to rows whose `key` might be in the bloom set. */
  def mightContain(probe: DataFrame, key: String, bm: Array[Long], m: Int, k: Int): DataFrame =
    probe
      .withColumn("_graft_bm", typedLit(bm.toSeq))
      .filter(expr(hitSql("_graft_bm", key, m, k)))
      .drop("_graft_bm")
}
