package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Block-mean perceptual hash (Yang et al. 2006) over a byte/char
  * stream in ONE pass: split the stream into 60 equal blocks
  * (boundaries `i*n div 60`, the same integer arithmetic as the
  * SQL oracle), bit i = (block i's sum · n > total sum · block len) —
  * the block-vs-global mean compare cross-multiplied so it stays
  * integer-exact, no division, bit-identical across engines.
  *
  * Why a native expression: the composed-SQL formulation
  * (`aggregate(sequence(0,59), …, split(substring(text,…),''))`)
  * re-splits and re-scans the text once per bit plus once for the
  * total — 61 full passes, each allocating one String per character.
  * That measured 163 s at sf0.1 (52% of the whole bench). This
  * expression is two tight primitive loops over the bytes (each
  * position visited exactly twice: total, then its one block), zero
  * per-char allocation, and stays inside whole-stage codegen via a
  * static call — the [[WinnowFps]]/[[SimHash64]] pattern. At 100 TB
  * the signature pass is then scan-bound, which is the point.
  *
  * Semantics are over Unicode code points (Spark's `length`/`split`/
  * `ascii` semantics): the corpus is ASCII so the byte fast path
  * covers it, with a code-point fallback for general input.
  */
case class BlockMeanHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"block_mean_hash60 requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      BlockMeanHash60.hash(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.expressions.BlockMeanHash60$$.MODULE$$.hash($v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BlockMeanHash60 = copy(child = newChild)
}

object BlockMeanHash60 {
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) hashAscii(bytes) else hashCodePoints(s.toString)
  }

  /** ASCII fast path: bytes ARE the code points. */
  private def hashAscii(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var tsum = 0L
    var i = 0
    while (i < n) { tsum += bytes(i); i += 1 }
    var sig = 0L
    var b = 0
    while (b < 60) {
      val start = (b.toLong * n / 60).toInt
      val end = ((b + 1).toLong * n / 60).toInt
      var bsum = 0L
      var j = start
      while (j < end) { bsum += bytes(j); j += 1 }
      if (bsum * n > tsum * (end - start)) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private def hashCodePoints(str: String): Long = {
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    var tsum = 0L
    var i = 0
    while (i < n) { tsum += cps(i); i += 1 }
    var sig = 0L
    var b = 0
    while (b < 60) {
      val start = (b.toLong * n / 60).toInt
      val end = ((b + 1).toLong * n / 60).toInt
      var bsum = 0L
      var j = start
      while (j < end) { bsum += cps(j); j += 1 }
      if (bsum * n > tsum * (end - start)) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column-level entry point: block_mean_hash60(string) → bigint. */
  def blockMeanHash60(c: Column): Column =
    Bridge.column(BlockMeanHash60(Bridge.expression(c)))
}
