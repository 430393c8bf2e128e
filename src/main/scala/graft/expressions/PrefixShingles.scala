package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** AllPairs/PPJoin prefix selection as a narrow per-row expression.
  *
  * Given a document's sorted distinct shingle-hash set, returns the
  * hashes that fall inside its length-`plen` prefix under the GLOBAL
  * rarest-first (document-frequency, hash) order, excluding df=1
  * singletons (which can never be a meeting point of two prefixes).
  * plen = min(n, n - ceil(n*thrNum/thrDen) + k).
  *
  * The document-frequency table rides along as two sorted parallel
  * arrays (hash → df, df >= 2 entries only; absent ⇒ df = 1). It is
  * vocabulary-bounded — ~13k entries at sf0.1 and growing sublinearly
  // with corpus size — so embedding it beats the relational
  * alternative (broadcast-join every (doc, shingle) row against the
  * df table, then regroup with collect_list + array_sort: that
  * shuffled and sorted the full shingle stream just to pick ~20
  * elements per document).
  *
  * Interpreted eval (CodegenFallback) is deliberate: one call per
  * document row, microseconds each — codegen would only add a compile.
  */
case class PrefixShingles(child: Expression, dfKeys: Array[Long],
    dfCounts: Array[Int], k: Int, thrNum: Int, thrDen: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"prefix_shingles requires array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val set = input.asInstanceOf[ArrayData]
    val n = set.numElements()
    // doc's df>=2 shingles, as parallel (df, h) arrays
    var n2 = 0
    val dfs = new Array[Int](n)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = set.getLong(i)
      val pos = java.util.Arrays.binarySearch(dfKeys, h)
      if (pos >= 0) {
        dfs(n2) = dfCounts(pos)
        hs(n2) = h
        n2 += 1
      }
      i += 1
    }
    // prefix length under the full (df=1-inclusive) order; df=1
    // entries all sort first, so the kept slice starts plen - n1 in.
    // ceil(n*thrNum/thrDen) as exact integer arithmetic.
    val plen = math.min(n, n - ((n * thrNum + thrDen - 1) / thrDen) + k)
    val take = math.max(0, math.min(n2, plen - (n - n2)))
    if (take == 0) return new GenericArrayData(Array.emptyLongArray)
    // order the doc's df>=2 entries by (df, h): pack df into the high
    // 32 bits (df and n2 are int-bounded, h ties broken by index
    // since hs is ascending)
    val packed = new Array[Long](n2)
    var j = 0
    while (j < n2) {
      // (df, index) lexicographic == (df, h) because hs is ascending
      packed(j) = (dfs(j).toLong << 32) | j.toLong
      j += 1
    }
    java.util.Arrays.sort(packed)
    val out = new Array[Long](take)
    j = 0
    while (j < take) {
      out(j) = hs((packed(j) & 0xFFFFFFFFL).toInt)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PrefixShingles = copy(child = newChild)
}

object PrefixShingles {
  /** prefix_shingles(set) under a collected df table (df>=2 rows as
    * (hash, df) pairs, any order). */
  def prefix_shingles(set: Column, df: Array[(Long, Int)], k: Int,
      thrNum: Int, thrDen: Int): Column = {
    val sorted = df.sortBy(_._1)
    Bridge.column(PrefixShingles(Bridge.expression(set),
      sorted.map(_._1), sorted.map(_._2), k, thrNum, thrDen))
  }
}
