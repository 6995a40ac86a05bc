package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for joins whose key distribution is heavy-tailed (hot
  * symbols, hot shingles, hot users — every corpus in this engine has one).
  *
  * Two tools, in preference order:
  *
  *   1. AQE's runtime skew-join split (`spark.sql.adaptive.skewJoin.*`,
  *      default-on) — free, but only kicks in for sort-merge joins above
  *      size thresholds.
  *   2. [[saltedJoin]] — explicit key salting for the cases AQE can't see
  *      (broadcast-ineligible dimension under a hot fact key, or
  *      aggregations feeding the join): the big side scatters each key
  *      across `buckets` sub-keys via a deterministic hash of a
  *      high-cardinality column; the small side replicates `buckets`×.
  *      Result is EXACTLY the plain inner join — salting only changes the
  *      physical row placement, never the match set.
  */
object Skew {

  /** Inner-join `big ⋈ small` on `keys`, with the big side's rows for any
    * one key spread over `buckets` shuffle partitions.
    *
    * @param spreadBy high-cardinality big-side column whose hash picks the
    *                 bucket (deterministic → reproducible plans and tests;
    *                 use a unique id, NOT the join key)
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      spreadBy: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bigSalted = big.withColumn("_salt", pmod(xxhash64(spreadBy), lit(buckets)))
    val smallSalted = small.withColumn(
      "_salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    bigSalted.join(smallSalted, keys :+ "_salt").drop("_salt")
  }
}
