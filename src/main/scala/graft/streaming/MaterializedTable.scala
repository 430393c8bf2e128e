package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-maintained key/value table state from a CDC change feed —
  * the full consumer loop the reference only feeds: parse → (this)
  * merge each micro-batch of changes into queryable table state.
  *
  * State is a chain of immutable parquet versions `v=<n>` plus an
  * append-only commit log of `(batchId, version)` lines; the current
  * state is the version of the LAST log line. Per micro-batch:
  *
  *  - reduce the batch to its latest change per key (LSN order — a key
  *    updated twice in one batch applies once, last wins),
  *  - full-outer merge against the current version: upserts replace the
  *    payload, deletes drop the key, untouched keys carry over,
  *  - write `v=<n+1>` (overwrite — a torn write from a crashed attempt
  *    is rewritten on replay), then append to the log.
  *
  * Replayed batchIds are skipped (the merge already committed), so the
  * at-least-once feed materializes into effectively-once table state —
  * same protocol as [[ShardedCorpusSink]], applied to upserts. The
  * merge is one window + one shuffle-join per batch: the standard
  * scalable MERGE shape (no row-at-a-time logic), identical for a
  * backfill batch or a 13-second micro-batch.
  */
class MaterializedTable(dir: String) extends Serializable {

  private def logPath = Paths.get(dir, "_commits")

  /** (batchId, version) pairs in commit order. */
  def commits(): Seq[(Long, Long)] =
    if (!Files.exists(logPath)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(logPath).asScala.filter(_.nonEmpty).toSeq
        .map { l => val a = l.split(","); (a(0).toLong, a(1).toLong) }
    }

  /** Current table state (pkey, payload), empty before any commit. */
  def current(spark: SparkSession): DataFrame =
    commits().lastOption match {
      case Some((_, v)) => spark.read.parquet(s"$dir/v=$v")
      case None =>
        import spark.implicits._
        Seq.empty[(String, String)].toDF("pkey", "payload")
    }

  /** Merge one micro-batch of changes — columns (pkey STRING,
    * operation STRING, payload STRING, lsn LONG); operation `delete`
    * drops the key, anything else upserts. Returns false on a
    * replayed batchId (no-op). */
  def applyBatch(changes: DataFrame, batchId: Long): Boolean = {
    val done = commits()
    if (done.exists(_._1 == batchId)) false
    else {
      val spark = changes.sparkSession
      val next = done.lastOption.map(_._2 + 1).getOrElse(0L)
      val w = Window.partitionBy(col("pkey")).orderBy(col("lsn").desc)
      val latest = changes
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("pkey"), col("operation"),
          col("payload").as("new_payload"))
      current(spark).join(latest, Seq("pkey"), "full_outer")
        .filter(coalesce(col("operation"), lit("keep")) =!= "delete")
        .select(col("pkey"),
          when(col("operation").isNull, col("payload"))
            .otherwise(col("new_payload")).as("payload"))
        .write.mode("overwrite").parquet(s"$dir/v=$next")
      Files.createDirectories(Paths.get(dir))
      Files.write(logPath,
        s"$batchId,$next\n".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND,
        StandardOpenOption.SYNC)
      true
    }
  }
}
