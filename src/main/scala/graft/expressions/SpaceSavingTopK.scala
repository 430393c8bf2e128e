package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded SpaceSaving heavy-hitters summary over a string column:
  * at most `capacity` (token, cnt, err) counters regardless of input
  * cardinality — the frequency face of the bounded-sketch family
  * (KmvSmallest = distinct, Bloom = membership, this = top-k counts).
  *
  * Exactness contract (what the oracle rides): while the number of
  * DISTINCT values ever seen stays ≤ capacity, no eviction happens,
  * every err is 0, and counts are exact under ANY partitioning and
  * merge order — the same "sketch is exact below its bound" branch
  * q_kmv_distinct uses. Past the bound it degrades to the classic
  * SpaceSaving guarantee (cnt overestimates by ≤ err; a true heavy
  * hitter cannot be evicted by the min-counter replacement rule).
  *
  * Output is sorted (cnt DESC, token ASC) so downstream top-k is a
  * slice, not a re-sort. Eviction scans for the min counter — O(cap)
  * per eviction, fine for the ≤ O(1k) capacities a vocab/heavy-hitter
  * report uses (a production billion-key variant would keep a
  * min-heap; the aggregation contract is identical).
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.SsBuffer]
  with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= 65536,
    s"space_saving_topk needs 1..65536 capacity, got $capacity")

  type Buf = SpaceSavingTopK.SsBuffer

  override def createAggregationBuffer(): Buf =
    new SpaceSavingTopK.SsBuffer()

  private def bump(buf: Buf, key: String, cnt: Long, err: Long): Unit = {
    val cur = buf.map.get(key)
    if (cur != null) { cur(0) += cnt; cur(1) += err; return }
    if (buf.map.size() < capacity) { buf.map.put(key, Array(cnt, err)); return }
    // evict the min-count entry; the newcomer inherits its count as
    // overestimation error (classic SpaceSaving replacement)
    var minK: String = null
    var minC = Long.MaxValue
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue()(0) < minC ||
          (e.getValue()(0) == minC && (minK == null || e.getKey < minK))) {
        minC = e.getValue()(0); minK = e.getKey
      }
    }
    buf.map.remove(minK)
    buf.map.put(key, Array(minC + cnt, minC + err))
    buf.evicted = true
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) bump(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    // Mergeability (Agarwal et al., "Mergeable Summaries"): a key
    // tracked only by `buf` may still have occurred in other's stream
    // and been absorbed by an eviction there — its true count in that
    // stream is bounded by other's min counter (the classic
    // SpaceSaving absent-key guarantee). Charge that bound to every
    // buf-only key, as count AND error, or the merged count loses
    // those occurrences and `true <= cnt` breaks. The charge applies
    // ONLY if other actually evicted (tracked explicitly, not
    // inferred from fullness) so the exact-below-capacity contract —
    // err stays 0 while distinct <= capacity, even at exactly
    // capacity — survives any merge order.
    if (other.evicted) {
      var bound = Long.MaxValue
      val it0 = other.map.values().iterator()
      while (it0.hasNext) {
        val v = it0.next()(0); if (v < bound) bound = v
      }
      val it1 = buf.map.entrySet().iterator()
      while (it1.hasNext) {
        val e = it1.next()
        if (!other.map.containsKey(e.getKey)) {
          e.getValue()(0) += bound; e.getValue()(1) += bound
        }
      }
      buf.evicted = true
    }
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bump(buf, e.getKey, e.getValue()(0), e.getValue()(1))
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val entries = new Array[(String, Long, Long)](buf.map.size())
    val it = buf.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    val sorted = entries.sortBy { case (t, c, _) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c, er) =>
      InternalRow(UTF8String.fromString(t), c, er)
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.evicted)
    out.writeInt(buf.map.size())
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.evicted = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.map.put(new String(b, StandardCharsets.UTF_8),
        Array(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"space_saving_topk requires string input, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_topk"

  override def withNewMutableAggBufferOffset(n: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): SpaceSavingTopK = copy(child = newChild)
}

object SpaceSavingTopK {
  /** Counter map plus whether this buffer EVER evicted: the flag (not
    * current fullness — a buffer holding exactly `capacity` distinct
    * keys without eviction is still exact) gates the merge-time
    * absent-key charge, preserving err=0 while distinct ≤ capacity. */
  final class SsBuffer {
    val map = new java.util.HashMap[String, Array[Long]]()
    var evicted = false
  }

  /** Aggregate column: sorted (cnt DESC, token ASC) array of
    * struct(token, cnt, err); exact (err=0) while distinct ≤ capacity. */
  def space_saving_topk(c: Column, capacity: Int): Column =
    Bridge.column(
      SpaceSavingTopK(Bridge.expression(c), capacity).toAggregateExpression())
}
