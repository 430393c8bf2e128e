package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a shingle-hash set: for permutation i,
  * sig[i] = min over the set of perm_i(h) — all `numPerm` mins in ONE
  * tight pass over the set.
  *
  * Replaces `transform(sequence(0,47), i -> array_min(transform(set,
  * h -> xxhash64(h, i))))`, which materializes numPerm intermediate
  * arrays per row (48 × |set| longs) through interpreted lambda
  * frames — the dominant cost of the whole MinHash pipeline.
  *
  * perm_i(h) = splitmix64-style finalizer over (mix64(h) + i * GOLDEN)
  * — a standard pairwise-independent-ish family. Signature values are
  * engine-internal: they only drive LSH banding (candidate
  * generation); membership of the final output is decided by the exact
  * Jaccard verify, so the family choice affects recall probability
  * only, with the same (1-t^r)^b bound as any well-mixed family.
  */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {
  require(numPerm > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.expressions.MinHashSig$$.MODULE$$.signature($v, $numPerm);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}

object MinHashSig {
  private final val Golden = 0x9e3779b97f4a7c15L

  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signature(set: ArrayData, numPerm: Int): GenericArrayData = {
    val sig = new Array[Long](numPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = set.numElements()
    var j = 0
    while (j < n) {
      val base = mix64(set.getLong(j))
      var i = 0
      while (i < numPerm) {
        val v = mix64(base + i * Golden)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** minhash_sig(array<bigint>, numPerm) → array<bigint>. */
  def minhash_sig(set: Column, numPerm: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(set), numPerm))
}
