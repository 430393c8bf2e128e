package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained per-group aggregates from a CDC change
  * feed — the IVM (incremental view maintenance) face of
  * [[MaterializedTable]]: instead of materializing the table itself,
  * maintain `GROUP BY grp → (row count, exact sum)` under inserts,
  * deletes AND updates, touching only per-batch deltas. This is the
  * consumer the reference's full-change mode exists to enable: without
  * the pre-image riding along (wal2json `oldkeys`,
  * /root/reference/README.rst:107-117), a delete or update cannot be
  * SUBTRACTED from an aggregate, and the maintainer would have to
  * rescan the whole table per batch.
  *
  * Change rows: (operation STRING, grp STRING, value_m LONG,
  * old_grp STRING, old_value_m LONG) — values pre-quantized to
  * micro-unit longs (the Num discipline) so every addition is exact
  * and merge-order-free. Each change maps to signed delta rows:
  *
  *   insert →                       (grp, +1, +value_m)
  *   delete → (old_grp, −1, −old_value_m)
  *   update → (old_grp, −1, −old_value_m) AND (grp, +1, +value_m)
  *            (the group itself may change — both sides adjust)
  *
  * The batch's delta table is one map-side-combinable aggregate over
  * those rows; the merge into state is a full-outer join on grp with
  * coalesced addition, and groups whose row count hits zero drop out.
  * Scale shape: per-batch work is O(batch + |touched state|), and the
  * aggregate state itself is groups-bounded — tiny relative to the
  * feed — so each version writes whole (bucketing state by group
  * hash, à la MaterializedTable, is the upgrade path if |groups| ever
  * stops being small; the commit protocol would not change).
  *
  * Commit protocol = [[CommitLog]] exactly as MaterializedTable uses
  * it: versions write BEFORE the (batchId, version) log line, replayed
  * batchIds are skipped, torn lines heal on append — so an
  * at-least-once feed maintains effectively-once aggregates. Empty
  * batches commit log-only. Retention: once the log exceeds 4× the
  * window, it is rewritten to its tail and unreferenced version
  * directories below the newest live version are deleted.
  */
class MaterializedAggregate(dir: String, retainVersions: Int = 8)
  extends Serializable {
  require(retainVersions >= 2,
    "retainVersions must cover the current version plus the replay window")

  private def logPath = Paths.get(dir, "_commits")
  private def versionDir(v: Long) = s"$dir/v=$v"

  /** (batchId, version) pairs in commit order; version -1 = committed
    * while the state was still empty. */
  def commits(): Seq[(Long, Long)] =
    CommitLog.read(logPath, 2).map(f => (f(0), f(1)))

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long)].toDF("grp", "n_rows", "sum_m")
  }

  private def readState(spark: SparkSession, v: Long): DataFrame =
    if (v < 0) emptyState(spark)
    else spark.read.parquet(versionDir(v))
      .select(col("grp"), col("n_rows"), col("sum_m"))

  /** Current aggregate state (grp, n_rows, sum_m); empty before any
    * commit. */
  def current(spark: SparkSession): DataFrame =
    readState(spark, commits().lastOption.map(_._2).getOrElse(-1L))

  /** Merge one micro-batch of changes. Returns false on a replayed
    * batchId (no-op). Operations compare case-insensitively
    * (test_decoding emits uppercase). */
  def applyBatch(changes: DataFrame, batchId: Long): Boolean = {
    val done = commits()
    if (done.exists(_._1 == batchId)) false
    else {
      val spark = changes.sparkSession
      val prev = done.lastOption.map(_._2).getOrElse(-1L)
      if (changes.isEmpty) {
        CommitLog.append(logPath, batchId, prev)
      } else {
        val next = prev + 1
        val op = lower(col("operation"))
        val plus = changes.filter(op.isin("insert", "update"))
          .select(col("grp"), lit(1L).as("dn"),
            col("value_m").as("dv"))
        val minus = changes.filter(op.isin("delete", "update"))
          .select(col("old_grp").as("grp"), lit(-1L).as("dn"),
            (-col("old_value_m")).as("dv"))
        val delta = plus.unionByName(minus)
          .groupBy(col("grp"))
          .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
        readState(spark, prev)
          .join(delta, Seq("grp"), "full_outer")
          .select(col("grp"),
            (coalesce(col("n_rows"), lit(0L)) +
              coalesce(col("dn"), lit(0L))).as("n_rows"),
            (coalesce(col("sum_m"), lit(0L)) +
              coalesce(col("dv"), lit(0L))).as("sum_m"))
          .filter(col("n_rows") > 0)
          .write.mode("overwrite").parquet(versionDir(next))
        CommitLog.append(logPath, batchId, next)
      }
      compact()
      true
    }
  }

  /** Prune the commit log and unreferenced versions once the log
    * outgrows 4x the retention window (amortized, same contract as
    * MaterializedTable.compact). */
  private def compact(): Unit = {
    val all = commits()
    if (all.size > 4 * retainVersions) {
      val tail = all.takeRight(retainVersions)
      CommitLog.rewrite(logPath, tail.map(t => Seq(t._1, t._2)))
      val live = tail.map(_._2).filter(_ >= 0).toSet
      val maxLive = (live + Long.MinValue).max
      val root = Paths.get(dir)
      val listing = Files.list(root)
      try {
        listing.iterator().forEachRemaining { p =>
          val nm = p.getFileName.toString
          if (nm.startsWith("v=")) {
            val v =
              try nm.stripPrefix("v=").toLong
              catch { case _: NumberFormatException => Long.MinValue }
            // only versions BELOW the newest live one: a crashed
            // in-flight v=<next> above it must survive for replay
            if (v >= 0 && v < maxLive && !live(v)) deleteTree(p)
          }
        }
      } finally listing.close()
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    val walk = Files.walk(p)
    try {
      walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().forEachRemaining(Files.deleteIfExists(_))
    } finally walk.close()
  }
}
