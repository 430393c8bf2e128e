package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Bounded KMV (k-minimum-values) sketch buffer: keeps only the k
  * smallest DISTINCT double hashes seen, under any partitioning and any
  * merge order. Returns them ascending as array<double>, so the KMV
  * estimator ((k-1)/h_k, small-set branch = size) applies downstream
  * exactly as it would over `array_sort(collect_set(h))` — but the
  * aggregation state is O(k) instead of O(distinct), which is what
  * makes the sketch usable at 100 TB (collect_set holds EVERY distinct
  * hash per group; this holds at most k).
  *
  * Correctness under merge: "k smallest distinct of a union" equals
  * "k smallest distinct of the union of per-partition k-smallest-
  * distinct sets" — any value outside a partition's local top-k is
  * dominated by k smaller distinct values in that same partition, so it
  * can never enter the global top-k. NativeExprSpec proves equivalence
  * against collect_set across repartitionings.
  */
case class KmvSmallest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]]
  with UnaryLike[Expression] {

  require(k > 0, s"kmv_smallest needs k > 0, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  private def add(buf: java.util.TreeSet[java.lang.Double], v: Double): Unit = {
    // reject early: a value >= the current k-th smallest can't matter
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Double],
      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Double],
      other: java.util.TreeSet[java.lang.Double])
      : java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Double]): Any = {
    val out = new Array[Double](buf.size())
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(
      buf: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_smallest"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSmallest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSmallest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvSmallest = copy(child = newChild)
}

object KmvSmallest {
  /** Aggregate column: ascending array of the k smallest distinct
    * double values of `c` (drop-in for `array_sort(collect_set(c))`
    * wherever only the k smallest are consumed). */
  def kmv_smallest(c: Column, k: Int): Column =
    Bridge.column(KmvSmallest(Bridge.expression(c), k).toAggregateExpression())
}
