package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[Md5PrefixLong]]. A bare object (no companion class) so
  * Scala emits STATIC forwarders — the generated Java below calls
  * `graft.functions.GraftHash.md5PrefixLong(...)` directly.
  */
object GraftHash {

  /** One digest instance per executor thread. The builtin `md5()` path
    * (commons-codec `DigestUtils.md5Hex`) calls
    * `MessageDigest.getInstance` PER ROW, which funnels every executor
    * thread through the JDK security-provider lookup — reflective
    * instantiation plus provider-table synchronization. At local[32]
    * the dedup family spent more time in `Provider$Service.newInstance`
    * than in MD5 itself, with run-to-run variance of 10-80× depending on
    * contention timing (round-4 stack dumps). A thread-local digest is
    * the entire fix; `digest()` resets the instance for reuse.
    */
  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Value of the first `nibbles` hex chars of md5(s) as a base-16
    * integer — numerically identical to
    * `conv(substring(md5(s), 1, nibbles), 16, 10)` cast to long, without
    * materializing the hex string or round-tripping a decimal string
    * through `conv`.
    */
  def md5PrefixLong(s: UTF8String, nibbles: Int): Long = {
    val d = md5.get().digest(s.getBytes)
    val full = nibbles >> 1
    var v = 0L
    var i = 0
    while (i < full) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    if ((nibbles & 1) == 1) v = (v << 4) | ((d(full) & 0xffL) >>> 4)
    v
  }
}

/** Fused md5-prefix-to-long hash — the numeric seeded hash behind MinHash
  * signatures ([[Text.seededHash64]], 15 nibbles = 60 bits) and the
  * SimHash per-token hash ([[Text.tokenHash32]], 8 nibbles = 32 bits).
  *
  * Bit-identical to the builtin formulation
  * `conv(substring(md5(x), 1, n), 16, 10) :: long` — which remains the
  * DuckDB oracle spelling (`CAST('0x' || substr(md5(x), 1, n) AS
  * BIGINT)`) — but runs as one codegen'd static call with a thread-local
  * digest: no per-row `MessageDigest.getInstance` (a synchronized
  * provider lookup that collapsed under 32-thread contention), no hex
  * encode, no decimal-string round trip through `NumberConverter`.
  */
case class Md5PrefixLong(child: Expression, nibbles: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be in [1, 15] to fit a signed long, got $nibbles")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = s"graft_md5_${nibbles * 4}"

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.md5PrefixLong(input.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GraftHash.md5PrefixLong($s, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}
