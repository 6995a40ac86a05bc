package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Runtime for [[HilbertIndex]]. A bare object so Scala emits STATIC
  * forwarders — the generated Java calls
  * `graft.functions.GraftCurve.hilbertXY2D(...)` directly.
  */
object GraftCurve {

  /** Hilbert-curve index of `(x, y)` on a `2^bits × 2^bits` grid — the
    * standard iterative xy→d walk (quadrant contribution + rotation per
    * level, highest bit first). Total over the grid: a bijection onto
    * `[0, 4^bits)` where consecutive indices are always 4-neighbors
    * (|Δx|+|Δy| = 1) — the locality guarantee Morton interleaving lacks
    * (z-order jumps across the plane at every power-of-two boundary).
    * Inputs are assumed in range; callers mask with `% (1 << bits)`.
    */
  def hilbertXY2D(xIn: Long, yIn: Long, bits: Int): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert space-filling-curve index over two long dim columns — the
  * multi-dimensional clustering key next to the Morton interleave
  * (`MiscQueries.zInterleave8`): both tile the plane into the SAME aligned
  * `2^(bits-4)`-square buckets at `div 256` (so zone-map pruning reads the
  * identical tile set), but the Hilbert walk visits tiles in an adjacency-
  * preserving order, so a 2-D box probe's bucket set fragments into ~half
  * as many contiguous id runs — at the storage layer, half the seeks for
  * the same bytes (p19 measures exactly this on the table's own stats).
  *
  * Tier (b) of the custom-operator ladder (SURVEY §2.10): a codegen'd
  * scalar `Expression` whose generated code is one static call into the
  * iterative walk — the 8-level branchy rotation state machine stays a
  * tight Java loop instead of a 24-deep CASE tree (which the DuckDB
  * oracle mirror spells out as an unrolled CTE chain, validated
  * step-for-step equal in FastCurveSpec).
  *
  * Null if either dim is null; `bits` is a literal (plan-time) argument.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = s"graft_hilbert_$bits"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    GraftCurve.hilbertXY2D(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.GraftCurve.hilbertXY2D($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object FastCurve {

  /** Column-level handle (requires [[FastVec.register]] or the
    * extensions conf — the descriptor lives in [[FastVec.descriptors]]
    * with the rest of the engine's function surface).
    */
  def hilbert(x: Column, y: Column, bits: Int): Column =
    call_function(s"graft_hilbert", x, y, org.apache.spark.sql.functions.lit(bits))
}
