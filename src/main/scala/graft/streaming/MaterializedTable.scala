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
  */
class MaterializedTable(dir: String) extends Serializable {

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
      true
    }
  }
}
