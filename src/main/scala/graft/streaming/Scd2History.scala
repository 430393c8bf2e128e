package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally-maintained SCD2 history from a CDC change feed — the
  * streaming face of the batch `cdc_scd2` query (CdcQueries.scala):
  * every non-delete change opens a validity interval at its LSN, the
  * next change on the same key closes it, and an open `valid_to_lsn`
  * marks the current version. The batch query computes the whole
  * history in one window pass; this maintainer produces the SAME table
  * incrementally, touching only keys the batch mentions (proved
  * row-identical by Scd2ParitySpec on the shared synthetic feed).
  *
  * Change rows: (id LONG, op STRING, new_value DOUBLE, lsn LONG).
  * Per micro-batch:
  *   1. within-batch chains: per key, sort by LSN; each non-delete
  *      change becomes a version row closed by the key's NEXT change
  *      in the same batch (lead), open if it is the last;
  *   2. the key's FIRST change in the batch closes the key's existing
  *      open version (if any) at that LSN;
  *   3. deletes emit nothing — they only close (a key whose last
  *      change is a delete ends with no current row, exactly as the
  *      batch query's `filter(op =!= "delete")` after lead()).
  *
  * Ordering contract: per-key LSNs must be non-decreasing across
  * batches — the guarantee the reference's single replication slot
  * provides (total order, /root/reference/README.rst:20-27). Within a
  * batch, order is re-derived by sort, so at-least-once delivery of
  * whole batches is safe: replayed batchIds are skipped via the same
  * [[CommitLog]] protocol as MaterializedTable/MaterializedAggregate
  * (versions write BEFORE the log line; torn lines heal on append).
  *
  * Scale shape: per-batch work is one shuffle of the batch on the key
  * (for the lead window + first-change aggregate) plus a key join
  * against current state. State rewrites whole per version here; the
  * history table is append-mostly (closed rows never change again),
  * so the production upgrade is the same bucketed/partitioned state
  * MaterializedTable documents — partition by is_current so the
  * immutable closed-history partitions are never rewritten.
  */
class Scd2History(dir: String, retainVersions: Int = 8)
  extends Serializable {
  require(retainVersions >= 2,
    "retainVersions must cover the current version plus the replay window")

  private def logPath = Paths.get(dir, "_commits")
  private def versionDir(v: Long) = s"$dir/v=$v"

  def commits(): Seq[(Long, Long)] =
    CommitLog.read(logPath, 2).map(f => (f(0), f(1)))

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Double, Long, Option[Long])]
      .toDF("id", "value", "valid_from_lsn", "valid_to_lsn")
  }

  private def readState(spark: SparkSession, v: Long): DataFrame =
    if (v < 0) emptyState(spark)
    else spark.read.parquet(versionDir(v))
      .select(col("id"), col("value"), col("valid_from_lsn"),
        col("valid_to_lsn"))

  /** Current SCD2 table (id, value, valid_from_lsn, valid_to_lsn,
    * is_current); empty before any commit. */
  def current(spark: SparkSession): DataFrame =
    readState(spark, commits().lastOption.map(_._2).getOrElse(-1L))
      .withColumn("is_current",
        col("valid_to_lsn").isNull.cast("long"))

  /** Merge one micro-batch of changes (id, op, new_value, lsn).
    * Returns false on a replayed batchId (no-op). */
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
        val b = changes.select(col("id"), lower(col("op")).as("op"),
          col("new_value"), col("lsn"))
        val wLead = Window.partitionBy(col("id")).orderBy(col("lsn"))
        val fresh = b
          .withColumn("next_lsn", lead(col("lsn"), 1).over(wLead))
          .filter(col("op") =!= "delete")
          .select(col("id"), col("new_value").as("value"),
            col("lsn").as("valid_from_lsn"),
            col("next_lsn").as("valid_to_lsn"))
        val firsts = b.groupBy(col("id"))
          .agg(min(col("lsn")).as("first_lsn"))
        readState(spark, prev)
          .join(firsts, Seq("id"), "left")
          .select(col("id"), col("value"), col("valid_from_lsn"),
            when(col("valid_to_lsn").isNull && col("first_lsn").isNotNull,
              col("first_lsn"))
              .otherwise(col("valid_to_lsn")).as("valid_to_lsn"))
          .unionByName(fresh)
          .write.mode("overwrite").parquet(versionDir(next))
        CommitLog.append(logPath, batchId, next)
      }
      compact()
      true
    }
  }

  /** Same amortized log/version pruning as MaterializedAggregate. */
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
