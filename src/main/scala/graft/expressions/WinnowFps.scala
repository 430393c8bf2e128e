package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole winnowing fingerprint set in ONE pass: k-char md5 window
  * hashes ([[Md5Shingles]] kernel) → sliding w-window minima
  * (monotonic deque, O(1) amortized per position) → distinct in
  * first-occurrence order. Value-identical to the composed
  * `array_distinct(transform(sequence(1, greatest(1, size(hs)-w+1)),
  *   j -> array_min(slice(hs, j, w))))` over `hs = md5_shingles32(...)`
  * (NativeExprSpec pins it).
  *
  * Why a fused expression instead of the two-step column pipeline: the
  * positional hash array hs is ~one int per character of text, and any
  * plan that carries it as a column either materializes it (a
  * checkpoint of corpus-sized intermediate state) or risks Catalyst
  * inlining it into each of its three downstream references —
  * CollapseProject folds `withColumn("hs",...)` into the consuming
  * lambda, re-running the ENTIRE md5 stage per slice element (the
  * round-4 quadratic, reachable through projection collapse even with
  * InferFiltersFromGenerate excluded). Fusing hash+winnow into one
  * node means hs lives only in a task-local scratch array: nothing to
  * materialize, nothing for the optimizer to duplicate.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "shingle size and window must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps32 requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFps.fps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.expressions.WinnowFps$$.MODULE$$.fps($v, $k, $w);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFps = copy(child = newChild)
}

object WinnowFps {
  /** Distinct sliding-window minima of the positional window hashes,
    * in first-occurrence order (array_distinct semantics). */
  def fps(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val hs = Md5Shingles.hashes(s, k).toLongArray()
    val nh = hs.length
    val nw = if (nh <= w) 1 else nh - w + 1
    // monotonic ascending deque of indices: head is the window min
    val deque = new Array[Int](nh)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nw)
    var nOut = 0
    var i = 0
    while (i < nh) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (i >= w - 1 || i == nh - 1) {
        // window [i-w+1, i] complete (or the single short window)
        while (deque(head) < i - w + 1) head += 1
        val m = hs(deque(head))
        if (seen.add(m)) { out(nOut) = m; nOut += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** winnow_fps32(text, k, w) → array<bigint> distinct winnowed
    * fingerprints (k-char shingles, w-hash windows). */
  def winnow_fps32(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(Bridge.expression(text), k, w))
}
