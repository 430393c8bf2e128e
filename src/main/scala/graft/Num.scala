package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers that make floating-point aggregates *deterministic and
  * engine-portable* so Spark results hash-match the DuckDB oracle.
  *
  * A plain `sum(double)` is order-dependent (IEEE addition is not
  * associative) and Spark's partial aggregation order differs run-to-run
  * and engine-to-engine. We instead cast each value to an exact DECIMAL,
  * sum exactly (associative), and cast the final sum back to DOUBLE.
  * Both engines then produce bit-identical doubles. This also holds at
  * 100 TB: decimal sums are exact regardless of partition count, so the
  * map-side partial aggregation Catalyst generates stays correct.
  */
object Num {
  /** Exact sum of a double column: SUM(CAST(x AS DECIMAL(28,8))) → DOUBLE.
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE).
    */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(28,8)")).cast("double")

  /** Deterministic average: exact decimal sum divided by count, both
    * engines perform the identical double division.
    * DuckDB: CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) / COUNT(x).
    */
  def davg(c: Column): Column =
    sum(c.cast("decimal(28,8)")).cast("double") / count(c)

  /** SQL fragment builders for the DuckDB oracle side, kept adjacent so
    * the two dialects stay in lock-step.
    */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,8))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,8))) AS DOUBLE) / COUNT($expr)"
}
