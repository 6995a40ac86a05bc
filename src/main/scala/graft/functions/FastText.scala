package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass BPE-style pre-token counter — the scale path for LLM
  * token budgeting (north star §2.10, x7).
  *
  * Semantically identical to
  * `size(regexp_extract_all(s, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))` (the DuckDB
  * oracle formulation, kept as the x7 oracle): a token is a maximal run of
  * lowercase letters, a maximal run of digits, or any single other non-space
  * character. The regex formulation materializes every match into an array
  * per row just to count it — judge-measured 31.8 s at sf0.1. This
  * expression counts in ONE branch-per-byte pass over the UTF-8 bytes with
  * zero allocation, inside whole-stage codegen.
  *
  * UTF-8 correctness: a non-ASCII code point (any lead byte) counts as one
  * `[^a-z0-9 ]` match — Java regex matches supplementary code points as
  * single units, and UTF-8 gives each code point exactly one lead byte, so
  * counting lead bytes equals counting code-point matches.
  */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0
    var prev = 0 // 0 = none/space, 1 = letter run, 2 = digit run
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') { if (prev != 1) cnt += 1; prev = 1 }
      else if (b >= '0' && b <= '9') { if (prev != 2) cnt += 1; prev = 2 }
      else if (b == ' ') prev = 0
      else { if ((b & 0xC0) != 0x80) cnt += 1; prev = 0 }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val prev = ctx.freshName("prev")
      s"""
         |final int $n = $s.numBytes();
         |int $cnt = 0;
         |int $prev = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final byte $b = $s.getByte($i);
         |  if ($b >= 'a' && $b <= 'z') { if ($prev != 1) $cnt++; $prev = 1; }
         |  else if ($b >= '0' && $b <= '9') { if ($prev != 2) $cnt++; $prev = 2; }
         |  else if ($b == ' ') { $prev = 0; }
         |  else { if (($b & 0xC0) != 0x80) $cnt++; $prev = 0; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Fused distinct word-n-gram shingling — one pass over the text, no
  * shuffle. Semantically identical to the window formulation
  * (posexplode(split) → per-doc lead window → concat_ws → distinct) that
  * shingleTable used through r4, but that shape costs an Exchange(doc) +
  * sort for the window and a second Exchange for the distinct, per
  * construction, in EVERY dedup-family query. This expression computes the
  * per-document distinct shingle set inline (first-occurrence order), so
  * the shingle table becomes a narrow projection: scan → explode, zero
  * exchanges before the consumer's own keyed shuffle.
  *
  * Tokenization matches `split(text, " ")` exactly (single-space regex,
  * trailing empties kept, so consecutive spaces yield empty tokens — the
  * DuckDB `string_split` oracle mirrors this).
  */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[UTF8String], n)

  // Whole-stage codegen residency via a static helper call — the loop body
  // allocates (strings, the set), so inlining Java source buys nothing over
  // one static call, and this keeps the surrounding operators fused.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleArray.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // -1 keeps trailing empties: exact split(text, " ") semantics
    val toks = text.toString.split(" ", -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Multiplicity-preserving sibling of [[ShingleArray]]: ALL word n-grams
  * of `text` in position order, duplicates kept — the bigram STREAM the
  * LM-proxy scorers (x8/x11/x25) fold over, where [[ShingleArray]]'s
  * per-document distinct set would under-count repeated bigrams. Same
  * motivation as its sibling (r12): those queries spelled the stream as
  * posexplode(split) → per-doc `lead` window, paying a corpus-wide
  * Exchange(doc_id) + sort before the first real aggregate; this is a
  * narrow codegen projection — scan → explode, zero exchanges — and the
  * HOF-transform spelling stays off the table (Catalyst inlines the
  * `split` into every lambda `get`, the round-2 O(tokens×n) collapse).
  * Tokenization matches `split(text, " ")` exactly, like [[ShingleArray]].
  */
case class NgramArray(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    NgramArray.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NgramArray.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramArray =
    copy(child = newChild)
}

object NgramArray {
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // -1 keeps trailing empties: exact split(text, " ") semantics
    val toks = text.toString.split(" ", -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Runtime for [[LevWithin]]. Bare object → static forwarders, same as
  * [[GraftHash]].
  */
object GraftLev {

  /** `levenshtein(a, b) <= k`, decided in O(k·min(|a|,|b|)) instead of the
    * builtin's full O(|a|·|b|) DP: rows outside the ±k diagonal band can
    * never reach a distance ≤ k, so only the band is computed, and the row
    * scan aborts the moment the band's minimum exceeds k (most non-matches
    * die within a few rows). Distances are over code points — identical
    * semantics to `UTF8String.levenshteinDistance`, which the PropertySpec
    * equality drives on random inputs.
    */
  def levWithin(a: UTF8String, b: UTF8String, k: Int): Boolean = {
    val x = a.toString.codePoints().toArray
    val y = b.toString.codePoints().toArray
    val la = x.length
    val lb = y.length
    if (math.abs(la - lb) > k) return false
    if (la == 0 || lb == 0) return math.max(la, lb) <= k
    val inf = k + 1
    // dp(j) holds D[i-1][j] inside the previous row's band, `inf` outside,
    // and the column init D[0][j] = j (j > k ⇒ inf) before the first row.
    // Column 0 is never written, so D[i-1][0] = i-1 is supplied directly
    // when the band touches it (jLo == 1).
    val dp = Array.tabulate(lb + 1)(j => if (j <= k) j else inf)
    var i = 1
    while (i <= la) {
      val jLo = math.max(1, i - k)
      val jHi = math.min(lb, i + k)
      var diag = if (jLo == 1) i - 1 else dp(jLo - 1) // D[i-1][jLo-1]
      var left = if (jLo == 1) i else inf // D[i][jLo-1]
      var rowMin = inf
      var j = jLo
      while (j <= jHi) {
        val up = dp(j) // D[i-1][j] (inf when outside the previous band)
        val cost = if (x(i - 1) == y(j - 1)) 0 else 1
        var v = diag + cost
        if (up + 1 < v) v = up + 1
        if (left + 1 < v) v = left + 1
        diag = up
        dp(j) = v
        left = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return false
      i += 1
    }
    dp(lb) <= k
  }
}

/** Thresholded Levenshtein predicate — `levenshtein(a, b) <= k` as ONE
  * banded-DP codegen call (see [[GraftLev.levWithin]]). The similarity
  * predicate r1/r3 evaluate per candidate pair: the builtin spelling
  * materializes the full DP matrix even for wildly different strings,
  * where the band rejects them in O(k) rows. DuckDB oracles keep the
  * builtin `levenshtein(a, b) <= k` spelling — set-identical by
  * construction (PropertySpec drives the equality on random inputs).
  */
case class LevWithin(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def prettyName: String = "graft_lev_le"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftLev.levWithin(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftLev.levWithin($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevWithin =
    copy(left = newLeft, right = newRight)
}

object FastText {
  /** Column handle (requires [[FastVec.register]] or the extensions conf). */
  def bpeCount(s: Column): Column = call_function("graft_bpe_count", s)

  /** Distinct word n-gram shingles in one fused pass (see [[ShingleArray]]). */
  def shingles(text: Column, n: Int): Column =
    call_function("graft_shingles", text, org.apache.spark.sql.functions.lit(n))

  /** ALL word n-grams, multiplicity kept (see [[NgramArray]]). */
  def ngrams(text: Column, n: Int): Column =
    call_function("graft_ngrams", text, org.apache.spark.sql.functions.lit(n))

  /** Banded `levenshtein(a, b) <= k` predicate (see [[LevWithin]]). */
  def levWithin(a: Column, b: Column, k: Int): Column =
    call_function("graft_lev_le", a, b,
      org.apache.spark.sql.functions.lit(k))
}
