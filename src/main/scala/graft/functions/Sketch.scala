package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV bottom-k sketch — the k smallest DISTINCT hash values of a group,
  * as a custom [[TypedImperativeAggregate]] (the imperative-buffer
  * extension class: explicit buffer object, partial update, partial
  * merge, buffer (de)serialization for shuffle transport — §2.10's
  * remaining Catalyst aggregate surface next to the declarative
  * `simhashAgg`).
  *
  * Semantics are a pure FUNCTION of the input multiset (a sorted set of
  * the k smallest distinct values), so unlike sampling sketches the
  * result is deterministic, order- and partitioning-independent, and
  * DuckDB-oracle-able: `row_number() OVER (ORDER BY hv) <= k` over the
  * distinct hashes spells the same set. The classic KMV estimator
  * (k−1)·M/h_k over hashes uniform on [0, M) turns the sketch into a
  * mergeable distinct-count estimate (Bar-Yossef et al. 2002) whose
  * ±1/√(k−2) envelope a30's self-evaluation asserts against the exact
  * count.
  *
  * Scale: the buffer is ≤ k longs regardless of group size; partials
  * combine map-side; serialization is 8k bytes — the same contract as
  * Spark's own HLL sketch aggregate, but exact-bottom-k instead of
  * probabilistic, which is what makes the oracle possible.
  */
case class BottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes {

  require(k > 0, "bottom-k needs k > 0")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_bottomk"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(
      buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(child = newChildren.head)
}

object Sketch {
  /** Column handle (requires [[FastVec.register]] or the extensions conf). */
  def bottomK(hash: Column, k: Int): Column =
    call_function("graft_bottomk", hash,
      org.apache.spark.sql.functions.lit(k))
}
