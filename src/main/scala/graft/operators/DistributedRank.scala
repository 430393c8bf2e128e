package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed positional rank / running sum over a GLOBAL total order.
  *
  * `Window.orderBy(...)` with no partition spec is the one Spark window
  * shape that does NOT distribute: WindowExec plans a single hash
  * partition and one task sorts (and holds) the entire input. Fine for
  * a calendar spine or a 1024-cell histogram; a scale cliff the moment
  * the input grows with the corpus (per-customer aggregates, blob
  * manifests). This kernel is the production swap the engine's four
  * former global windows (q_ntile_spend, q_revenue_pareto,
  * mm_shard_pack, mm_shard_index) now ride — the classic two-pass
  * distributed rank:
  *
  *  1. `repartitionByRange(parts, order)` — Spark's own sampled
  *     RangePartitioner splits the total order into `parts` contiguous,
  *     balanced key ranges (a reservoir-sample job, NOT a full
  *     pre-scan; this is the same primitive `df.orderBy` itself uses,
  *     and why it beats hand-rolled bounded pre-histograms: no min/max
  *     pass, no monotone cell function per key type, skew-balanced by
  *     construction).
  *  2. Per-range (count, Σvalue) — a `parts`-row table. The cumulative
  *     offsets BEFORE each range are a window over that bounded table
  *     (≤ `parts` rows by construction — the one place an
  *     unpartitioned window is legitimate, whitelisted as such in
  *     PlanAuditSpec's global-window audit).
  *  3. Broadcast the offsets back onto the ranged rows: global
  *     position = range's row offset + row_number WITHIN the range,
  *     running sum = range's value offset + within-range running sum.
  *     Both windows are partitioned by the range id, so the sort runs
  *     as `parts` parallel tasks instead of one.
  *
  * The range exchange is built once and read by both the offsets
  * aggregate and the main window pass (AQE stage reuse — the executed
  * plan shows ReusedExchange; one shuffle write, two reads). The main
  * pass pays one extra hash exchange on the range id before its
  * window: Catalyst cannot prove rangepartitioning(order) clusters the
  * derived `spark_partition_id` column, so it re-shuffles by it. That
  * exchange is linear, fully distributed, and moves the (already
  * pre-aggregated) kernel input only — a constant factor, not a
  * cliff. Output is EXACT and partition-invariant:
  * range boundaries only decide WHERE a row is ranked, never what its
  * rank is, because `order` must be a total order (callers include a
  * unique tiebreaker) and the offset arithmetic is exact integer /
  * decimal addition. The sampled boundaries are deterministic given
  * the input (seeded per partition index), and even if they were not,
  * the result would be byte-identical — which is what lets the swapped
  * queries keep hash-matching their single-threaded DuckDB oracles.
  *
  * Scale: `parts` defaults to the session's shuffle parallelism — at
  * 10⁹ manifest rows on a 1000-executor cluster the same code runs
  * with shuffle.partitions=2000 and each task ranks ~500k rows.
  */
object DistributedRank {

  /** Rank `df` by `order` (MUST be a total order — include a unique
    * tiebreaker column, or equal rows get arbitrary-but-some rank).
    *
    * Returns (ranked, totals):
    *  - `ranked` = df plus `rnName` (1-based global position, long)
    *    and, when `value` is set, `cumName` (inclusive running sum of
    *    `value` in the global order, same type as `sum(value)`);
    *  - `totals` = ONE-row frame `(__n: long, __vtot)` — the global
    *    row count and value total, derived from the bounded per-range
    *    table so callers needing n (NTILE arithmetic, Pareto shares)
    *    don't rescan the input.
    */
  def rankPrefix(
      df: DataFrame,
      order: Seq[Column],
      rnName: String,
      value: Option[Column] = None,
      cumName: String = "__cum",
      parts: Int = 0): (DataFrame, DataFrame) = {
    val nParts = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val v = value.getOrElse(lit(0L))
    val parted = df
      .withColumn("__v", v)
      .repartitionByRange(nParts, order: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
    // Bounded: ≤ nParts rows (one per non-empty range). The
    // unpartitioned windows below run over THIS table only.
    val perRange = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__v")).as("__vsum"))
    val wCum = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = perRange
      .withColumn("__cntOff", sum(col("__cnt")).over(wCum) - col("__cnt"))
      .withColumn("__vOff", sum(col("__vsum")).over(wCum) - col("__vsum"))
      .select(col("__pid"), col("__cntOff"), col("__vOff"))
    val totals = perRange.agg(sum(col("__cnt")).as("__n"),
      sum(col("__vsum")).as("__vtot"))
    val wRank = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val wRun = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankedBase = parted
      .join(broadcast(offs), Seq("__pid"))
      .withColumn(rnName, (col("__cntOff") + row_number().over(wRank))
        .cast("long"))
    val ranked = value match {
      case Some(_) => rankedBase.withColumn(cumName,
        col("__vOff") + sum(col("__v")).over(wRun))
      case None => rankedBase
    }
    (ranked.drop("__pid", "__v", "__cntOff", "__vOff"), totals)
  }

  /** NTILE(k) bucket from a global position: the SQL-standard
    * equal-fill-remainder-first split (first `n mod k` buckets take
    * `n div k + 1` rows, the rest `n div k`) computed arithmetically
    * from [[rankPrefix]]'s rank instead of a single-task WindowExec.
    * Exact while n ≤ 2^53 (double division of exactly-divisible
    * longs); `greatest(q, 1)` keeps the dead branch from dividing by
    * zero under ANSI when n < k.
    */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long")
    val r = (n % k).cast("long")
    val cut = (q + lit(1L)) * r
    when(rn <= cut,
      floor((rn - 1) / (q + lit(1L))).cast("long") + lit(1L))
      .otherwise(r +
        floor((rn - cut - 1) / greatest(q, lit(1L))).cast("long") + lit(1L))
  }
}
