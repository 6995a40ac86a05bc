package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** NATIVE as-of join — the whole-operator Catalyst integration path
  * (SURVEY §7.2 preference (c)): a custom `LogicalPlan` node, a
  * `SparkStrategy` that plans it, and a physical `BinaryExecNode` that
  * DECLARES its distribution + ordering requirements and merges the two
  * sorted streams in one pass per partition.
  *
  * `operators/AsOf.joinAsOf` (the j9 path) COMPOSES the same semantics
  * from built-ins: union both sides, run a keyed `last(ignoreNulls)`
  * window. That plan shuffles `left + right` rows AND sorts the union as
  * one stream. This operator hands Catalyst the join's true requirements
  * instead — `ClusteredDistribution(key)` per child and per-child
  * `(key, ts)` sort orders — so EnsureRequirements co-partitions and
  * sorts each side independently (map-side of each exchange carries only
  * its own columns, no union row widening, no window state machine), and
  * the exec is a textbook streamed merge: advance the right iterator
  * while `(rKey, rTs) ≤ (lKey, lTs)`, holding ONE candidate row.
  * O(|L| + |R|) per partition, O(1) memory beyond the held row — exactly
  * what a 100 TB quote/trade alignment needs, and the same physical
  * shape Spark's own SortMergeJoinExec declares.
  *
  * Semantics (identical to `AsOf.joinAsOf`, spec-proven): for each left
  * row, the right row with the greatest `rightTs <= leftTs` within the
  * same key; at-or-before (equal timestamps match); among right ties on
  * (key, ts) the greatest payload wins (the rightVals columns join the
  * right child's sort order); unmatched left rows keep their multiplicity
  * with null as-of columns.
  *
  * Scale notes: the merge preserves the left child's partitioning and
  * ordering (`outputPartitioning`/`outputOrdering` pass through), so a
  * downstream per-key window or aggregation reuses the exchange. AQE is
  * fully compatible — the node advertises requirements the same way SMJ
  * does, so coalescing/skew rules treat it identically.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Expression],
    asofOutput: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected per-session via
  * `spark.experimental.extraStrategies` (see [[NativeAsOf.joinAsOf]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, rv, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Expression],
    asofOutput: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  /** The join's true requirement: co-clustered children (EnsureRequirements
    * aligns partition counts across the two, exactly as for SMJ).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  /** Per-child sort: (key, ts) both sides; the right side additionally
    * sorts by payload so the held row at equal (key, ts) is the GREATEST
    * payload — the deterministic tiebreak `AsOf.joinAsOf` established.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightVals.map(SortOrder(_, Ascending)))

  /** Left rows stream through in order — partitioning and ordering survive
    * for downstream reuse.
    */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey
    val rKey = rightKey
    val lTs = leftTs
    val rTs = rightTs
    val rVals = rightVals
    val asofOut = asofOutput
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)

    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of children must be co-partitioned " +
        s"(${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions})")

    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      import org.apache.spark.sql.catalyst.expressions.BindReferences.bindReference
      val lKeyB = bindReference(lKey, lOut)
      val lTsB = bindReference(lTs, lOut)
      val rKeyB = bindReference(rKey, rOut)
      val rTsB = bindReference(rTs, rOut)
      // Output projection over the joined (left ++ right) schema; the right
      // attributes are re-declared nullable so the null-padded no-match row
      // projects cleanly.
      val rOutNullable = rOut.map(_.withNullability(true))
      val projExprs = lOut ++ (rTs +: rVals).map {
        case a: Attribute => a.withNullability(true)
        case e => e
      }
      val proj = UnsafeProjection.create(projExprs, lOut ++ rOutNullable)
      val joined = new JoinedRow
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // Key/ts values are cached alongside the rows they came from: the
        // head cache is refreshed on every advance (shuffle iterators
        // reuse row objects, but only a next() call mutates them), and the
        // held cache points into the held row's own COPIED buffer — so the
        // steady-state cost per left row is two interpreted evals plus
        // primitive compares, with the output projection codegen'd.
        private var rHead: InternalRow = _
        private var rHeadKey: Any = _
        private var rHeadTs: Any = _
        advanceRight()
        private var held: InternalRow = null
        private var heldKey: Any = null
        private var heldTs: Any = null

        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyB.eval(rHead)
            rHeadTs = rTsB.eval(rHead)
          } else rHead = null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyB.eval(l)
          val lt = lTsB.eval(l)
          if (lk != null && lt != null) {
            var continue = rHead != null
            while (continue) {
              // rows with null key/ts sort first and can never match — skip
              val behind =
                if (rHeadKey == null || rHeadTs == null) true
                else {
                  val c = keyOrd.compare(rHeadKey, lk)
                  c < 0 || (c == 0 && tsOrd.compare(rHeadTs, lt) <= 0)
                }
              if (behind) {
                if (rHeadKey != null && rHeadTs != null &&
                    keyOrd.compare(rHeadKey, lk) == 0) {
                  held = rHead.copy()
                  heldKey = rKeyB.eval(held)
                  heldTs = rTsB.eval(held)
                }
                advanceRight()
                continue = rHead != null
              } else continue = false
            }
          }
          val matched = lk != null && lt != null && held != null &&
            heldKey != null && keyOrd.compare(heldKey, lk) == 0 &&
            heldTs != null && tsOrd.compare(heldTs, lt) <= 0
          proj(joined(l, if (matched) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native operator. */
object NativeAsOf {

  /** Same contract as [[graft.operators.AsOf.joinAsOf]]: emits every left
    * row plus `asof_ts` and `asof_<v>` columns (null when no right row at
    * or before). The strategy self-registers on the session
    * (`experimental.extraStrategies` — idempotent), so callers need no
    * session-builder configuration.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side with fresh exprIds: in the common self-join
    // case (both sides derived from one table) the children would share
    // attribute ids, and the analyzer's DeduplicateRelations cannot tell
    // which side this node's key/ts expressions meant.
    val rAliases = right.queryExecution.analyzed.output
      .map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    val rOut = rAliases.map(_.toAttribute)

    def attrOf(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${out.map(_.name).mkString(", ")}]"))

    val lk = attrOf(lPlan.output, key)
    val rk = attrOf(rOut, key)
    val lts = attrOf(lPlan.output, leftTs)
    val rts = attrOf(rOut, rightTs)
    val rvs = rightVals.map(attrOf(rOut, _))
    val asofOut = AttributeReference("asof_ts", rts.dataType, nullable = true)() +:
      rvs.map(v => AttributeReference(s"asof_${v.name}", v.dataType, nullable = true)())

    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      spark, AsOfJoin(lPlan, rPlan, lk, rk, lts, rts, rvs, asofOut))
  }
}
