package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Effectively-once sharded corpus writer — the terminal stage of the
  * streaming ingest pipeline (accepted docs → training-shard store).
  *
  * Structured Streaming's `foreachBatch` replays a batch with the SAME
  * batchId after a failure (offsets commit after the batch function
  * returns), so an at-least-once writer duplicates rows on recovery —
  * the caveat the reference documents and lives with
  * (README.rst:15-18). A store that can write per-epoch directories
  * atomically upgrades that to effectively-once, idempotently:
  *
  *  - each epoch writes to `out/epoch=<batchId>` (overwrite mode: a
  *    torn write from a crashed attempt is simply rewritten),
  *  - the epoch is then recorded in a commit log (`_committed`,
  *    append-only, one fsync'd line per epoch),
  *  - a replayed batchId found in the log is SKIPPED — the write
  *    already happened, byte-for-byte.
  *
  * Readers take `out/epoch=*` filtered to logged epochs (or just trust
  * overwrite semantics: an uncommitted directory is rewritten by the
  * replay before the log line appears). On a real cluster the same
  * shape uses the object store's atomic rename/commit; the commit-log
  * protocol is identical.
  *
  * Rows are partitioned by the shared content-hash shard expression
  * (same as the batch `shard_assign` operator and
  * `IngestPipeline.shardOf`), so streaming ingest, batch re-sharding
  * and the reader's layout all agree.
  */
class ShardedCorpusSink(outDir: String, nShards: Int = 32)
    extends Serializable {

  private def logPath = Paths.get(outDir, "_committed")

  def committedEpochs(): Set[Long] =
    CommitLog.read(logPath, 1).map(_.head).toSet

  /** The foreachBatch function: idempotent per batchId. Returns true
    * when the epoch was written, false when it was a replay skip. */
  def writeEpoch(batch: DataFrame, batchId: Long): Boolean = {
    if (committedEpochs().contains(batchId)) false
    else if (batch.isEmpty) {
      // an all-rejected epoch commits without a directory — an empty
      // parquet dir would break readers' schema inference
      CommitLog.append(logPath, batchId)
      true
    } else {
      // A shard column computed upstream (IngestPipeline verdicts) is
      // authoritative — recomputing with a different nShards here would
      // make the physical layout disagree with the verdict metadata the
      // pipeline already published — but it must agree with THIS
      // store's layout: out-of-range values (a mismatched nShards
      // config, or reject rows with shard = -1 that the caller forgot
      // to filter) fail loudly instead of silently growing stray
      // partition directories. Shard-less batches get the sink's own
      // assignment (same expression as batch shard_assign).
      val sharded =
        if (batch.columns.contains("shard"))
          batch.withColumn("shard",
            when(col("shard") >= 0 && col("shard") < nShards,
              col("shard").cast("long"))
              .otherwise(raise_error(concat(
                lit(s"shard out of range [0, $nShards): "),
                col("shard").cast("string"))).cast("long")))
        else batch.withColumn("shard", expr(
          s"cast(conv(substring(md5(concat('sh', cast(doc_id as string)))," +
            s" 1, 8), 16, 10) as bigint) % $nShards"))
      sharded
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(s"$outDir/epoch=$batchId")
      CommitLog.append(logPath, batchId)
      true
    }
  }

  /** Read back every committed epoch as one DataFrame (empty-commit
    * epochs have no directory and contribute nothing). A stream whose
    * every epoch committed empty (all rows rejected upstream) is a
    * LEGITIMATE state — there is then no parquet footer anywhere to
    * infer the corpus schema from, so the reader returns an empty
    * frame with the caller-declared `schema` (or zero columns when the
    * caller has no expectation to declare) instead of crashing.
    *
    * A declared schema is a CONTRACT, not just the empty-state
    * fallback: the non-empty path selects (and casts to) exactly the
    * declared columns too, so the reader's shape never depends on
    * whether some epoch happened to carry data — and a declared column
    * the store doesn't actually have fails loudly instead of being
    * silently ignored. Callers that declare nothing get the inferred
    * data columns plus the discovered `shard` partition column. */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType =
        org.apache.spark.sql.types.StructType(Nil)): DataFrame = {
    val epochs = committedEpochs().toSeq.sorted
      .filter(e => Files.isDirectory(Paths.get(outDir, s"epoch=$e")))
    if (epochs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      // one multi-path scan, not a union per epoch: a long-running
      // stream accrues thousands of epochs and an N-leg union plan
      // grows (and re-analyzes) with N, while a single file-source
      // relation lists all epoch directories into one scan. basePath
      // anchors partition discovery at the store root (only the
      // committed epoch paths listed here are actually read); the
      // discovered epoch partition column is an implementation detail
      // of the layout, so it is dropped from the reader's schema.
      val df = spark.read.option("basePath", outDir)
        .parquet(epochs.map(e => s"$outDir/epoch=$e"): _*)
        .drop("epoch")
      if (schema.isEmpty) df
      else {
        val missing = schema.fieldNames.filterNot(df.columns.contains)
        require(missing.isEmpty,
          s"declared schema columns ${missing.mkString(", ")} not present " +
            s"in committed corpus (has: ${df.columns.mkString(", ")})")
        df.select(schema.fields.toSeq
          .map(f => col(f.name).cast(f.dataType)): _*)
      }
    }
  }
}
