package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All sign-projection LSH table codes of a float vector in ONE pass.
  *
  * Semantically identical to computing, per table t and bit b, the
  * strict sequential double fold `FloatDot(vec, planeWeights(t, b))`
  * and packing sign bits — but as a single expression node instead of
  * `tables × bits` FloatDot calls each carrying a 64-element array
  * literal. The literal formulation put ~6k expression nodes into the
  * plan; Catalyst analysis + Janino compilation of that tree dominated
  * the query's wall time (the arithmetic itself is microseconds per
  * row). Same ±1.0 weights, same left-to-right accumulation, so the
  * result — and the DuckDB oracle hash — is bit-identical.
  *
  * Weights are ±1.0 exactly, so `acc += v * w` here equals the
  * float→double product fold FloatDot computes and the
  * `list_dot_product(emb, [±1.0,...]::DOUBLE[])` the oracle computes.
  */
case class LshCodes(child: Expression, numTables: Int, bitsPerTable: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_codes requires array<float>, got $other")
    }

  @transient private lazy val weights: Array[Array[Double]] =
    LshCodes.weightMatrix(numTables, bitsPerTable)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var code = 0
      var b = 0
      while (b < bitsPerTable) {
        val w = weights(t * bitsPerTable + b)
        val n = math.min(v.numElements(), w.length)
        var acc = 0.0
        var j = 0
        while (j < n) {
          acc += v.getFloat(j).toDouble * w(j)
          j += 1
        }
        if (acc >= 0) code |= 1 << b
        b += 1
      }
      codes(t) = code
      t += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lshWeights", weights, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val code = ctx.freshName("code")
      s"""
         |int[] $codes = new int[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  int $code = 0;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    double[] $w = $wRef[$t * $bitsPerTable + $b];
         |    int $n = java.lang.Math.min($v.numElements(), $w.length);
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += ((double) $v.getFloat($j)) * $w[$j];
         |    }
         |    if ($acc >= 0) $code |= 1 << $b;
         |  }
         |  $codes[$t] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshCodes =
    copy(child = newChild)
}

object LshCodes {
  private val Dim = 64

  /** Deterministic Rademacher (±1) hyperplane weights — THE single
    * source of truth shared by this expression and the SQL-literal
    * oracle generator in Similarity. */
  def planeWeights(table: Int, bit: Int): Seq[Double] =
    (0 until Dim).map { j =>
      val h = (table * 1315423911L + bit * 2654435761L + j * 97531L) *
        0x9e3779b97f4a7c15L
      if (((h >>> 31) & 1L) == 1L) 1.0 else -1.0
    }

  def weightMatrix(numTables: Int, bitsPerTable: Int): Array[Array[Double]] =
    Array.tabulate(numTables * bitsPerTable) { p =>
      planeWeights(p / bitsPerTable, p % bitsPerTable).toArray
    }

  /** lsh_codes(array<float>) → array<int>, one code per table. */
  def lsh_codes(v: Column, numTables: Int, bitsPerTable: Int): Column =
    Bridge.column(LshCodes(Bridge.expression(v), numTables, bitsPerTable))
}
