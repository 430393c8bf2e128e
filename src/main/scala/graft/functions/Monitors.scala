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

  /** Per-(event_type, user) engagement counts — the contingency input
    * under q_ab_readout's 2×2 chi-square. Batch face: q_ab_readout.
    * Streaming face: the count maintained incrementally (complete
    * mode), so the experiment readout can be recomputed from live
    * state at any micro-batch boundary. */
  def engagementCounts(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
}
