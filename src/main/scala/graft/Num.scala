package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers that make floating-point aggregates *deterministic and
  * engine-portable* so Spark results hash-match the DuckDB oracle.
  *
  * A plain `sum(double)` is order-dependent (IEEE addition is not
  * associative): Spark's partial-aggregation merge order differs
  * run-to-run and engine-to-engine. We instead fix one explicit
  * quantization — `round(x * 1e8)` (half-away-from-zero on the IEEE
  * product, which is what both Spark's Round-on-double and C llround
  * compute) — sum the resulting integers exactly in decimal, and divide
  * back at the end. Every step is bit-identical across engines and
  * association orders, so the map-side partial aggregation Catalyst
  * generates at 1000-executor scale produces the same answer as a
  * single-threaded oracle.
  *
  * Why not CAST(x AS DECIMAL(p,s))? The cast itself is engine-specific:
  * DuckDB rounds the scaled *double* (llround(x*1e8)) while Spark rounds
  * the exact decimal expansion of x (BigDecimal HALF_UP) — these differ
  * ~1e-3 per row on multi-factor products, which is why the explicit
  * shared quantization above is the portable primitive.
  */
object Num {
  private val SCALE = 1e8

  /** Deterministic sum of a double column, exact to 1e-8 per value. */
  def dsum(c: Column): Column =
    sum(round(c * SCALE).cast("decimal(38,0)")).cast("double") / SCALE

  /** Deterministic average: deterministic sum / count, identical double
    * division on both engines. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Deterministic windowed running sum (same quantization, exact
    * decimal accumulation under DuckDB's segment-tree reassociation). */
  def dsumExpr(c: Column): Column =
    round(c * SCALE).cast("decimal(38,0)")

  /** DuckDB fragments, kept adjacent so the dialects stay in lock-step. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(round(($expr) * 1e8) AS HUGEINT)) AS DOUBLE) / 1e8"

  /** Same quantized sum in Spark SQL dialect (DECIMAL(38,0) instead of
    * HUGEINT), for queries written through spark.sql. */
  def sqlSumSpark(expr: String): String =
    s"CAST(SUM(CAST(round(($expr) * 1e8) AS DECIMAL(38,0))) AS DOUBLE) / 1e8"
  def sqlAvg(expr: String): String =
    s"${sqlSum(expr)} / COUNT($expr)"
}
