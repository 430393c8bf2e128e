package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-maintained key/value table state from a CDC change feed —
  * the full consumer loop the reference only feeds: parse → (this)
  * merge each micro-batch of changes into queryable table state.
  *
  * State is a chain of immutable parquet versions `v=<n>` plus an
  * append-only commit log of `(batchId, version)` lines ([[CommitLog]]
  * — torn-write tolerant, replay self-healing); the current state is
  * the version of the LAST log line. Per micro-batch:
  *
  *  - reduce the batch to its latest change per key — ordered by LSN,
  *    then by the optional `ord` column (the within-message change
  *    index): every change of one wal2json transaction shares the
  *    transaction's LSN after explode, so without the ordinal the
  *    intra-transaction winner would be shuffle-order nondeterministic,
  *  - full-outer merge against the current version: upserts replace the
  *    payload, deletes (case-insensitive — the test_decoding parser
  *    emits uppercase operations) drop the key, untouched keys carry
  *    over,
  *  - write `v=<n+1>` (overwrite — a torn write from a crashed attempt
  *    is rewritten on replay), then append to the log. An EMPTY batch
  *    (idle trigger) commits log-only against the previous version
  *    instead of rewriting the whole table as a new version.
  *
  * Replayed batchIds are skipped (the merge already committed), so the
  * at-least-once feed materializes into effectively-once table state.
  * The merge is one window + one shuffle-join per batch — the same
  * scalable MERGE shape as the batch `cdc_apply` query
  * (CdcQueries.scala); if the merge semantics change here, change them
  * there too.
  *
  * Retention: without pruning, a long-running stream accrues one
  * parquet version per non-empty batch forever and every batch
  * re-reads an ever-growing commit log (O(batches^2) cumulative log
  * work). After each commit, once the log exceeds 4x the retention
  * window, it is atomically rewritten to its last `retainVersions`
  * lines ([[CommitLog.rewrite]] — the torn-write healing protocol
  * already tolerates rewrite) and `v=<n>` directories older than the
  * oldest retained line are deleted. `retainVersions` must exceed the
  * replay window of the feeding stream (Structured Streaming replays
  * at most the last batch, so even 2 is safe); keeping a few more
  * preserves short time-travel for debugging.
  */
class MaterializedTable(dir: String, retainVersions: Int = 8)
    extends Serializable {
  require(retainVersions >= 2,
    "retainVersions must cover at least the current version plus the replay window")

  private def logPath = Paths.get(dir, "_commits")

  /** (batchId, version) pairs in commit order; version -1 = committed
    * while the table was still empty. */
  def commits(): Seq[(Long, Long)] =
    CommitLog.read(logPath, 2).map(f => (f(0), f(1)))

  private def readVersion(spark: SparkSession, v: Long): DataFrame =
    if (v < 0) {
      import spark.implicits._
      Seq.empty[(String, String)].toDF("pkey", "payload")
    } else spark.read.parquet(s"$dir/v=$v")

  /** Current table state (pkey, payload), empty before any commit. */
  def current(spark: SparkSession): DataFrame =
    readVersion(spark, commits().lastOption.map(_._2).getOrElse(-1L))

  /** Merge one micro-batch of changes — columns (pkey STRING,
    * operation STRING, payload STRING, lsn LONG, [ord INT]); operation
    * `delete` (any case) drops the key, anything else upserts. Returns
    * false on a replayed batchId (no-op). */
  def applyBatch(changes: DataFrame, batchId: Long): Boolean = {
    val done = commits()
    if (done.exists(_._1 == batchId)) false
    else {
      val spark = changes.sparkSession
      val prev = done.lastOption.map(_._2).getOrElse(-1L)
      if (changes.isEmpty) {
        // idle trigger: nothing to merge — commit against the previous
        // version instead of rewriting the table
        CommitLog.append(logPath, batchId, prev)
      } else {
        val next = prev + 1
        val ordCol =
          if (changes.columns.contains("ord")) col("ord") else lit(0)
        val w = Window.partitionBy(col("pkey"))
          .orderBy(col("lsn").desc, ordCol.desc)
        val latest = changes
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("pkey"), col("operation"),
            col("payload").as("new_payload"))
        readVersion(spark, prev).join(latest, Seq("pkey"), "full_outer")
          .filter(lower(coalesce(col("operation"), lit("keep"))) =!= "delete")
          .select(col("pkey"),
            when(col("operation").isNull, col("payload"))
              .otherwise(col("new_payload")).as("payload"))
          .write.mode("overwrite").parquet(s"$dir/v=$next")
        CommitLog.append(logPath, batchId, next)
      }
      compact()
      true
    }
  }

  /** Prune the commit log and dead versions once the log outgrows 4x
    * the retention window (amortized: one rewrite per ~3x window of
    * commits, not per batch). Versions still referenced by a retained
    * log line are never deleted — empty-batch commits re-reference an
    * old version, so the live set is derived from the tail's contents,
    * not from arithmetic on the latest version number. */
  private def compact(): Unit = {
    val all = commits()
    if (all.size > 4 * retainVersions) {
      val tail = all.takeRight(retainVersions)
      CommitLog.rewrite(logPath, tail.map(t => Seq(t._1, t._2)))
      val minLive = tail.map(_._2).min
      val root = Paths.get(dir)
      val versions = java.nio.file.Files.list(root)
      try {
        versions.iterator().forEachRemaining { p =>
          val nm = p.getFileName.toString
          if (nm.startsWith("v=")) {
            val v = try nm.drop(2).toLong
            catch { case _: NumberFormatException => Long.MinValue }
            if (v >= 0 && v < minLive) deleteTree(p)
          }
        }
      } finally versions.close()
    }
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(p)
    try {
      walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().forEachRemaining(java.nio.file.Files.deleteIfExists(_))
    } finally walk.close()
  }
}
