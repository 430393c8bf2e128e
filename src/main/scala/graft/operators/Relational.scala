package graft.operators

import graft.{Num, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Batch relational surface over the TPC-H-ish tables: the generalized
  * analytics capabilities BASELINE.json obliges on top of the reference's
  * streaming dataflow (SURVEY.md §2.1 checklist, right column).
  *
  * All queries are declarative DataFrame plans — Catalyst provides filter
  * pushdown into the parquet scan, column pruning, and join-strategy
  * selection; at 100 TB these run as map-side-combined hash aggregations
  * over the scan partitioning with no extra shuffles beyond the group-by.
  *
  * Float determinism: every double aggregate goes through Num.dsum/davg
  * (exact decimal accumulation) so results hash-match DuckDB regardless
  * of partition count or merge order.
  */
object Relational extends QueryModule {
  import Tables._
  import Num._

  override def queries: Map[String, Q] = Map(
    // TPC-H Q1: pricing summary. Single scan → partial agg → final agg;
    // the shipdate filter is pushed to the parquet reader.
    "q1_pricing" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q6: selective filter + scalar aggregate. Entirely pushdown +
    // one-row result; at scale this is a scan-only job.
    "q6_forecast" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSum("l_quantity")} AS sum_qty,
         |  ${sqlSum("l_extendedprice")} AS sum_base_price,
         |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${sqlSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${sqlAvg("l_quantity")} AS avg_qty,
         |  ${sqlAvg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_forecast" ->
      s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin
  )
}
