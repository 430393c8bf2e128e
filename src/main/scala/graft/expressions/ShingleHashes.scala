package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of all character k-gram shingles of a string,
  * in one zero-copy pass over the UTF-8 bytes.
  *
  * Replaces the composed pipeline
  * `array_distinct(transform(sequence(...), i -> substring(text,i,k)))`
  * + `xxhash64`, which allocates one UTF8String per window (hundreds
  * per document) before hashing and then pays an O(n²)-ish
  * array_distinct over string equality. Here each window is hashed
  * directly from the parent string's bytes (XXH64, seed 42) and
  * dedup is sort+unique over the primitive longs.
  *
  * The hash values are engine-internal: dedup correctness only needs
  * per-document shingle-set intersection counts to equal the exact
  * string-set counts, which holds absent 64-bit collisions (birthday
  * bound ~1e-7 at 10^6 distinct shingles — the same contract the
  * previous xxhash64-of-substring formulation relied on).
  *
  * Character (not byte) windows: a char-start offset table is walked
  * so multi-byte UTF-8 text shingles correctly. Strings shorter than
  * k chars yield exactly one hash (the whole string), matching
  * `sequence(1, greatest(1, len - k + 1))` + truncated substring.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.distinct(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.expressions.ShingleHashes$$.MODULE$$.distinct($v, $k);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L

  /** Sorted distinct XXH64 hashes of the k-char windows of `s`. */
  def distinct(s: UTF8String, k: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes()
    // char-start byte offsets (UTF-8 continuation bytes are 10xxxxxx);
    // starts has one entry per char plus a terminal nBytes sentinel
    val starts = new Array[Int](nBytes + 1)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xC0)
          != 0x80) {
        starts(nChars) = i
        nChars += 1
      }
      i += 1
    }
    starts(nChars) = nBytes
    val nWin = if (nChars <= k) 1 else nChars - k + 1
    val hashes = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      val b0 = starts(w)
      val b1 = starts(math.min(w + k, nChars))
      hashes(w) = XXH64.hashUnsafeBytes(base, off + b0, b1 - b0, Seed)
      w += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place unique
    var out = 0
    var j = 0
    while (j < nWin) {
      if (j == 0 || hashes(j) != hashes(j - 1)) {
        hashes(out) = hashes(j)
        out += 1
      }
      j += 1
    }
    val trimmed = if (out == nWin) hashes
      else java.util.Arrays.copyOf(hashes, out)
    new GenericArrayData(trimmed)
  }

  /** shingle_hashes(string, k) → sorted array<bigint> of distinct
    * k-gram window hashes. */
  def shingle_hashes(text: Column, k: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), k))
}
