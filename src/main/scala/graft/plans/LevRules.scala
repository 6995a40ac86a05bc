package graft.plans

import graft.functions.LevWithin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite threshold-comparison predicates over the builtin
  * `levenshtein(a, b)` into the banded [[LevWithin]] expression —
  * `levenshtein(a, b) <= k` (any of the four comparison spellings, either
  * operand order, integer-literal threshold) becomes ONE `graft_lev_le`
  * call deciding the bound in O(k·min(|a|,|b|)) with per-row early exit,
  * instead of materializing the full O(|a|·|b|) DP matrix and comparing.
  *
  * Queries keep the portable ANSI spelling (the SAME text the DuckDB
  * oracles run) and the engine swaps in the cheap evaluation — the
  * Catalyst-extension contract: semantics in the query, strategy in a
  * `Rule[LogicalPlan]`. Null semantics are preserved (both forms are
  * null-safe-null on null input); the builtin's explicit-threshold variant
  * `levenshtein(a, b, t)` is left untouched (it is already banded).
  * Negative/always-true bounds fold to literals (distance is always ≥ 0).
  */
object RewriteThresholdLevenshtein extends Rule[LogicalPlan] {

  private def bound(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType)
        if v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
    case _ => None
  }

  /** `levenshtein(a, b) <= k` with the inputs' null guard preserved. */
  private def within(a: Expression, b: Expression, k: Int): Expression =
    if (k < 0) {
      // distance >= 0 always: the predicate is false for non-null inputs,
      // null when either input is null — exactly LevWithin's contract at
      // an unreachable bound, so reuse it rather than hand-building the
      // null plumbing
      LevWithin(a, b, -1)
    } else LevWithin(a, b, k)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), l) if bound(l).isDefined =>
        within(a, b, bound(l).get)
      case LessThan(Levenshtein(a, b, None), l) if bound(l).isDefined =>
        within(a, b, bound(l).get - 1)
      case GreaterThanOrEqual(l, Levenshtein(a, b, None)) if bound(l).isDefined =>
        within(a, b, bound(l).get)
      case GreaterThan(l, Levenshtein(a, b, None)) if bound(l).isDefined =>
        within(a, b, bound(l).get - 1)
    }
}

object LevRules {

  /** Idempotent per-session registration (the NativeAsOf
    * `extraStrategies` convention); also injected by
    * [[graft.functions.GraftExtensions]].
    */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteThresholdLevenshtein))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteThresholdLevenshtein
}
