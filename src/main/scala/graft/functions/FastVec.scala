package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The builtin formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * (see [[Vectors.dot]]) materializes an intermediate array per row and
  * walks it with two higher-order lambda dispatches. This expression fuses
  * the zip, multiply and left-fold into ONE codegen'd loop over the unsafe
  * array data — no allocation, no lambda, same strict left-to-right IEEE
  * fold, so its result is BIT-IDENTICAL to the builtin formulation and to
  * the DuckDB `list_reduce` oracle mirror.
  *
  * This is the custom-operator ladder's tier (b) (SURVEY §2.10): a scalar
  * `Expression` with `doGenCode`, registered through the public
  * `SparkSessionExtensions.injectFunction` hook ([[GraftExtensions]]) —
  * NOT a Scala UDF (which would box every element and block codegen).
  *
  * Semantics: null if either side is null; elements are assumed non-null
  * (embedding vectors); length mismatch folds over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused squared-L2 distance — same single-loop shape as [[DotProduct]]
  * for the IVF centroid-assignment metric (bit-identical to the
  * `zip_with`/`aggregate` formulation in [[Vectors.l2sq]]).
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

/** Integer sibling of [[DotProduct]]: fused dot product over two
  * `array<bigint>` columns — m8's DCT coefficients are exact Q14
  * fixed-point folds `sum(p[i]·w[i])` over 64-cell grids, and the
  * builtin `aggregate(zip_with(...))` spelling runs as an interpreted
  * higher-order expression (no whole-stage codegen), allocating an
  * intermediate array and dispatching two lambdas per element. This is
  * one codegen'd loop, no allocation; integer multiply-add is
  * order-exact, so the result is BIT-IDENTICAL to the builtin fold and
  * the oracle's relational row/column passes.
  *
  * CONTRACT (r12 advice — this is an INTERNAL kernel, registered for
  * tests/plans but not a general SQL function): inputs must be
  * equal-length arrays with NO null elements. On mismatched lengths it
  * folds the COMMON PREFIX where the builtin `aggregate(zip_with(...))`
  * spelling yields NULL from null-padding, and a null element hits
  * `getLong` on a null slot (unspecified garbage) where the builtin
  * returns NULL — the bit-identity claim above holds only under the
  * contract, which m8's fixed 64-length DCT grids satisfy by
  * construction. (Declaring `containsNull = false` in `inputTypes` is NOT
  * the enforcement mechanism: Spark types `transform(...)` outputs as
  * nullable-element arrays regardless of content, so the analyzer would
  * reject the legitimate call sites.)
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_ldot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/** `SparkSessionExtensions` entry point — activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    FastVec.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RewriteThresholdLevenshtein)
  }
}

object FastVec {

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))),
    (FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2Sq].getName, "graft_l2sq"),
      (children: Seq[Expression]) => L2Sq(children.head, children(1))),
    (FunctionIdentifier("graft_ldot"),
      new ExpressionInfo(classOf[LongDot].getName, null, "graft_ldot",
        "_FUNC_(a, b) - Exact integer dot product of two EQUAL-LENGTH " +
          "array<bigint> with no null elements (internal kernel; " +
          "mismatched lengths fold the common prefix, null elements are " +
          "undefined — see LongDot's contract scaladoc).",
        "", "", "", "", "", "", "scala_udf"),
      (children: Seq[Expression]) => LongDot(children.head, children(1))),
    (FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "graft_bpe_count"),
      (children: Seq[Expression]) => BpeTokenCount(children.head)),
    (FunctionIdentifier("graft_md5_60"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "graft_md5_60"),
      (children: Seq[Expression]) => Md5PrefixLong(children.head, 15)),
    (FunctionIdentifier("graft_md5_32"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "graft_md5_32"),
      (children: Seq[Expression]) => Md5PrefixLong(children.head, 8)),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles"),
      (children: Seq[Expression]) => ShingleArray(
        children.head,
        children(1).eval().asInstanceOf[Int])),
    (FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NgramArray].getName, "graft_ngrams"),
      (children: Seq[Expression]) => NgramArray(
        children.head,
        children(1).eval().asInstanceOf[Int])),
    (FunctionIdentifier("graft_lev_le"),
      new ExpressionInfo(classOf[LevWithin].getName, "graft_lev_le"),
      (children: Seq[Expression]) => LevWithin(
        children.head, children(1),
        children(2).eval().asInstanceOf[Int])),
    (FunctionIdentifier("graft_bottomk"),
      new ExpressionInfo(classOf[BottomKAgg].getName, "graft_bottomk"),
      (children: Seq[Expression]) => BottomKAgg(
        children.head,
        children(1).eval().asInstanceOf[Int])),
    (FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      (children: Seq[Expression]) => HilbertIndex(
        children.head, children(1),
        children(2).eval().asInstanceOf[Int])))

  /** Idempotent runtime registration for sessions built without the
    * extensions conf (tests, Verify, Bench).
    */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Column-level handles (require [[register]] or the extensions conf). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def l2sq(a: Column, b: Column): Column = call_function("graft_l2sq", a, b)
  def ldot(a: Column, b: Column): Column = call_function("graft_ldot", a, b)
  def norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(a, a))
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
