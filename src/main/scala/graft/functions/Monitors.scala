package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared batch/streaming kernels for the monitoring operators —
  * the same discipline as [[Sketches]]: the oracle-checked batch
  * query and its streaming face build the IDENTICAL lineage from one
  * definition, so parity is provable rather than approximate.
  */
object Monitors {

  /** Zone-map statistics for one layout: per file, the [min, max]
    * month-index range and row count — the table a lakehouse reader
    * prunes against. `df` must carry the integer month index `m`.
    * Batch face: q_zone_map_prune (both layouts, unioned). Streaming
    * face: the same min/max/count aggregate maintained incrementally
    * in complete mode — zone maps are maintained AT WRITE TIME in
    * production, which is exactly the ingest-side aggregate
    * (StreamingMonitorParitySpec pins stream == batch). */
  def zoneStats(df: DataFrame, layout: String, fileCol: Column)
      : DataFrame =
    df.groupBy(fileCol.as("file"))
      .agg(min(col("m")).as("min_m"), max(col("m")).as("max_m"),
        count(lit(1)).as("rows"))
      .withColumn("layout", lit(layout))

  /** The cents-exact monthly revenue spine — the ONE aggregate the
    * time-series family (q_acf, q_forecast_backtest) reads: month
    * index year·12+month, revenue as decimal(38,0) cents. `df` must
    * carry `o_orderdate`/`o_totalprice`. Streaming face: the same
    * sum maintained incrementally in complete mode — the spine is
    * CALENDAR-bounded, so its full state is ~tens of rows however
    * large the feed (StreamingMonitorParitySpec pins stream ==
    * batch). */
  def monthlyCents(df: DataFrame): DataFrame =
    df.groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
      .as("m"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as decimal(38,0))"))
        .as("rq"))

  /** Per-(event_type, user) engagement counts — the contingency input
    * under q_ab_readout's 2×2 chi-square. Batch face: q_ab_readout.
    * Streaming face: the count maintained incrementally (complete
    * mode), so the experiment readout can be recomputed from live
    * state at any micro-batch boundary. */
  def engagementCounts(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
}
