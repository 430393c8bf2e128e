package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-frame code-point sums in ONE pass: split a byte/char stream
  * into consecutive fixed-length frames (full frames only — the
  * ragged tail is dropped, as a fixed-rate decoder would) and emit
  * each frame's exact code-point sum. This is the "frame energy"
  * primitive under scene-cut detection: consecutive-frame sum deltas
  * approximate the pixel-intensity-difference cut score that is the
  * classical shot-boundary baseline, and the sums are integers so
  * the oracle recomputes them bit-exactly.
  *
  * Why native: the composed-SQL form (`transform(sequence(...),
  * i -> aggregate(split(substring(text, i*L+1, L), ''), ...))`)
  * allocates one String per character and re-enters substring/split
  * once per frame — the exact allocation pattern whose 61-pass cousin
  * measured 163 s at sf0.1 before [[BlockMeanHash60]] replaced it.
  * Here: one loop over the bytes, zero per-char allocation, static
  * call from whole-stage codegen (the [[WinnowFps]] pattern).
  *
  * Semantics are over Unicode code points (Spark `length`/`ascii`
  * semantics): ASCII fast path, code-point fallback for general
  * input — frame boundaries count code points, not bytes.
  */
case class FrameSums(child: Expression, frameLen: Int)
    extends UnaryExpression {
  require(frameLen > 0, "frame length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"frame_sums requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    FrameSums.sums(input.asInstanceOf[UTF8String], frameLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.expressions.FrameSums$$.MODULE$$.sums($v, $frameLen);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): FrameSums = copy(child = newChild)
}

object FrameSums {
  def sums(s: UTF8String, frameLen: Int): GenericArrayData = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) {
      val nf = bytes.length / frameLen
      val out = new Array[Long](nf)
      var f = 0
      while (f < nf) {
        var sum = 0L
        var j = f * frameLen
        val end = j + frameLen
        while (j < end) { sum += bytes(j); j += 1 }
        out(f) = sum
        f += 1
      }
      new GenericArrayData(out)
    } else {
      val str = s.toString
      val n = str.codePointCount(0, str.length)
      val nf = n / frameLen
      val out = new Array[Long](nf)
      var f = 0
      var ci = 0
      var off = 0
      var sum = 0L
      while (f < nf) {
        val cp = str.codePointAt(off)
        sum += cp
        ci += 1
        off += Character.charCount(cp)
        if (ci % frameLen == 0) { out(f) = sum; sum = 0L; f += 1 }
      }
      new GenericArrayData(out)
    }
  }

  /** frame_sums(text, frameLen) → array<bigint> of per-frame
    * code-point sums (full frames only). */
  def frame_sums(text: Column, frameLen: Int): Column =
    Bridge.column(FrameSums(Bridge.expression(text), frameLen))
}
