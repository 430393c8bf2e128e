package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit md5 hash of every k-char window of a string, in position
  * order (duplicates kept — winnowing's sliding-window min needs the
  * positional sequence, not a set).
  *
  * Replaces the composed pipeline
  * `transform(sequence(1, greatest(1, length(text)-k+1)),
  *            i -> cast(conv(substring(md5(substring(text,i,k)),1,8),16,10) as bigint))`
  * which allocates, per window: a UTF8String slice, a 32-char hex
  * UTF8String from md5, an 8-char substring, and a decimal string from
  * conv that cast re-parses — ~290 windows per document, recomputed on
  * every consuming plan leg. Here the UTF-8 bytes are walked once with
  * a char-start offset table (multi-byte text windows correctly, same
  * walk as [[ShingleHashes]]) and each window's md5 is taken directly
  * from the parent byte array, keeping the first 8 hex nibbles
  * (= first 32 bits big-endian, a non-negative long) per window.
  *
  * md5 (not xxhash) is load-bearing: the winnow oracles recompute the
  * IDENTICAL hashes in DuckDB (`('0x' || substr(md5(...),1,8))::BIGINT`).
  * Strings shorter than k chars yield exactly one hash of the whole
  * string, matching the truncated-substring semantics. NativeExprSpec
  * pins equality with the composed formulation.
  */
case class Md5Shingles(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_shingles32 requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Shingles.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.expressions.Md5Shingles$$.MODULE$$.hashes($v, $k);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): Md5Shingles = copy(child = newChild)
}

object Md5Shingles {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Positional 32-bit md5 window hashes (see class doc). */
  def hashes(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // char-start byte offsets (UTF-8 continuation bytes are 10xxxxxx)
    val starts = new Array[Int](nBytes + 1)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(nChars) = i; nChars += 1 }
      i += 1
    }
    starts(nChars) = nBytes
    val nWin = if (nChars <= k) 1 else nChars - k + 1
    val md = digest.get()
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      val b0 = starts(w)
      val b1 = starts(math.min(w + k, nChars))
      md.reset()
      md.update(bytes, b0, b1 - b0)
      val d = md.digest()
      // first 8 hex chars of the digest = first 4 bytes big-endian,
      // as an unsigned (non-negative) long
      out(w) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** md5_shingles32(string, k) → array<bigint> of positional 32-bit
    * md5 window hashes. */
  def md5_shingles32(text: Column, k: Int): Column =
    Bridge.column(Md5Shingles(Bridge.expression(text), k))
}
