package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5 hash of every whitespace token of a string, in document
  * order (duplicates kept — SimHash votes per occurrence).
  *
  * Replaces the composed pipeline
  * `transform(filter(split(text,'\\s+'), t -> t != ''),
  *            t -> cast(conv(substring(md5(t),1,15),16,10) as bigint))`
  * which allocates, per token: a UTF8String slice from the regex
  * split, a 32-char hex UTF8String from md5, a 15-char substring, and
  * a decimal string from conv that cast then re-parses. Here the
  * UTF-8 bytes are walked once — token boundaries are ASCII
  * whitespace bytes (Java regex `\s` = [ \t\n\x0B\f\r], all < 0x80,
  * so a byte scan is exact even on multi-byte text) — and each
  * token's md5 is taken directly from the parent byte array, keeping
  * only the first 15 hex nibbles (= first 60 bits big-endian) as a
  * long.
  *
  * md5 (not xxhash) is load-bearing: it is the one hash DuckDB and
  * Spark share, which is what lets the dedup_simhash oracle recompute
  * the IDENTICAL fingerprint (`('0x' || substr(md5(t),1,15))::BIGINT`)
  * and brute-force the same pair set. NativeExprSpec pins equality
  * with the composed formulation.
  */
case class TokenMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_md5_60 requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TokenMd5.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.expressions.TokenMd5$$.MODULE$$.hashes($v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): TokenMd5 = copy(child = newChild)
}

object TokenMd5 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Per-token 60-bit md5 values, in order, empties dropped. */
  def hashes(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val md = digest.get()
    // count tokens first: exact-size primitive array, no builder boxing
    var nTok = 0
    var i = 0
    while (i < n) {
      if (!isSpace(bytes(i)) && (i == 0 || isSpace(bytes(i - 1)))) nTok += 1
      i += 1
    }
    val out = new Array[Long](nTok)
    var t = 0
    i = 0
    while (i < n) {
      if (isSpace(bytes(i))) { i += 1 }
      else {
        val start = i
        while (i < n && !isSpace(bytes(i))) i += 1
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 15 hex chars of the digest = first 60 bits big-endian:
        // bytes 0..6 in full plus the high nibble of byte 7
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
        out(t) = v >>> 4
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  /** token_md5_60(string) → array<bigint> of per-token 60-bit md5s. */
  def token_md5_60(text: Column): Column =
    Bridge.column(TokenMd5(Bridge.expression(text)))
}
