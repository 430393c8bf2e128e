package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-maintained key/value table state from a CDC change feed —
  * the full consumer loop the reference only feeds: parse → (this)
  * merge each micro-batch of changes into queryable table state.
  *
  * State is hash-bucketed: a key lives in bucket
  * `pmod(hash(pkey), nBuckets)`, and each version writes ONLY the
  * buckets the batch touched (`v=<n>/bucket=<b>` parquet via
  * partitionBy). Untouched buckets carry forward BY REFERENCE through
  * a per-version manifest `m=<n>` of (bucket, version-that-holds-it)
  * lines — so per-batch write cost is O(touched buckets), not
  * O(table). A full-table rewrite per micro-batch is the design that
  * dies first at scale: a 100 TB table fed by single-key batches
  * would re-copy 100 TB per trigger; here it re-copies ~1/nBuckets of
  * the table per touched bucket, and nBuckets is sized so a bucket is
  * a comfortable rewrite unit (the same reasoning as Delta/Iceberg
  * file-level copy-on-write, expressed at bucket granularity).
  *
  * The commit protocol is unchanged ([[CommitLog]] — torn-write
  * tolerant, replay self-healing): an append-only `_commits` log of
  * (batchId, version) lines; the current state is the manifest of the
  * LAST log line's version. Manifests are written atomically
  * ([[CommitLog.rewrite]]) BEFORE the commit line, so a crash between
  * the two leaves an orphan manifest that the replay simply
  * overwrites. Per micro-batch:
  *
  *  - reduce the batch to its latest change per key — ordered by LSN,
  *    then by the optional `ord` column (the within-message change
  *    index): every change of one wal2json transaction shares the
  *    transaction's LSN after explode, so without the ordinal the
  *    intra-transaction winner would be shuffle-order nondeterministic,
  *  - full-outer merge against the CURRENT CONTENT OF TOUCHED BUCKETS
  *    only: upserts replace the payload, deletes (case-insensitive —
  *    the test_decoding parser emits uppercase operations) drop the
  *    key, untouched keys in touched buckets carry over; untouched
  *    buckets are not read at all,
  *  - write `v=<n+1>/bucket=<b>` for the touched buckets (overwrite —
  *    a torn write from a crashed attempt is rewritten on replay),
  *    write manifest `m=<n+1>`, then append to the log. An EMPTY
  *    batch (idle trigger) commits log-only against the previous
  *    version instead of touching the table.
  *
  * Replayed batchIds are skipped (the merge already committed), so the
  * at-least-once feed materializes into effectively-once table state.
  * The merge is one window + one shuffle-join per batch — the same
  * scalable MERGE shape as the batch `cdc_apply` query
  * (CdcQueries.scala); if the merge semantics change here, change them
  * there too.
  *
  * Retention: without pruning, a long-running stream accrues versions
  * forever and every batch re-reads an ever-growing commit log
  * (O(batches^2) cumulative log work). After each commit, once the
  * log exceeds 4x the retention window, it is atomically rewritten to
  * its last `retainVersions` lines and every version directory NOT
  * referenced by a retained manifest is deleted — liveness is derived
  * from manifest CONTENTS, never from version-number arithmetic,
  * because an old version stays live for as long as some retained
  * manifest still references one of its buckets. `retainVersions`
  * must exceed the replay window of the feeding stream (Structured
  * Streaming replays at most the last batch, so even 2 is safe);
  * keeping a few more preserves short time-travel for debugging.
  */
class MaterializedTable(dir: String, retainVersions: Int = 8,
    nBuckets: Int = 16) extends Serializable {
  require(retainVersions >= 2,
    "retainVersions must cover at least the current version plus the replay window")
  require(nBuckets >= 1, "nBuckets must be positive")

  private def logPath = Paths.get(dir, "_commits")
  private def manifestPath(v: Long) = Paths.get(dir, s"m=$v")
  private def metaPath = Paths.get(dir, "_meta")

  /** Layout metadata — (format version, nBuckets) — written once at
    * first commit and validated on every open. The bucket function is
    * baked into every on-disk manifest: reopening an existing table
    * with a different nBuckets would route a key's next update to its
    * NEW bucket while the stale copy in the old bucket carries forward
    * by manifest reference — current() would then return duplicate and
    * stale keys with no error. So a mismatch (or a committed table
    * with no metadata at all) fails loudly instead of guessing. */
  private def checkOrWriteMeta(write: Boolean): Unit = {
    val meta = CommitLog.read(metaPath, 2)
    if (meta.nonEmpty) {
      val fmt = meta.head(0)
      val nb = meta.head(1)
      require(fmt == 1L, s"table at $dir has unsupported format version $fmt")
      require(nb == nBuckets.toLong,
        s"table at $dir was committed with nBuckets=$nb but opened with " +
          s"nBuckets=$nBuckets — a key's bucket is part of the on-disk " +
          "layout; reopen with the original bucket count")
    } else if (commits().nonEmpty) {
      throw new IllegalStateException(
        s"table at $dir has a commit log but no _meta file — refusing to " +
          "guess its bucket count")
    } else if (write) {
      CommitLog.rewrite(metaPath, Seq(Seq(1L, nBuckets.toLong)))
    }
  }

  /** (batchId, version) pairs in commit order; version -1 = committed
    * while the table was still empty. */
  def commits(): Seq[(Long, Long)] =
    CommitLog.read(logPath, 2).map(f => (f(0), f(1)))

  /** (bucket, version-that-holds-it) for a committed version; empty
    * for the pre-first-commit version -1. */
  private def manifest(v: Long): Seq[(Long, Long)] =
    if (v < 0) Seq.empty
    else CommitLog.read(manifestPath(v), 2).map(f => (f(0), f(1)))

  private def bucketDir(v: Long, b: Long) = s"$dir/v=$v/bucket=$b"

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("pkey", "payload")
  }

  private def readBuckets(spark: SparkSession,
      entries: Seq[(Long, Long)]): DataFrame =
    if (entries.isEmpty) emptyState(spark)
    else spark.read
      .parquet(entries.map { case (b, v) => bucketDir(v, b) }: _*)
      .select(col("pkey"), col("payload"))

  /** Current table state (pkey, payload), empty before any commit. */
  def current(spark: SparkSession): DataFrame = {
    checkOrWriteMeta(write = false)
    readBuckets(spark,
      manifest(commits().lastOption.map(_._2).getOrElse(-1L)))
  }

  /** Time travel: the table as of the commit for `batchId` — the
    * debugging/audit read the retained manifest window exists for
    * (manifests reference buckets by version, so an old state is just
    * an old manifest; no data is copied to serve this). Throws if the
    * batch's version has been compacted away — silently returning the
    * nearest surviving state would hand an auditor the WRONG table. */
  def asOf(spark: SparkSession, batchId: Long): DataFrame = {
    checkOrWriteMeta(write = false)
    val v = commits().collectFirst { case (b, ver) if b == batchId => ver }
      .getOrElse(throw new IllegalArgumentException(
        s"batchId $batchId not in the retained commit window of $dir" +
          " (compacted or never committed)"))
    readBuckets(spark, manifest(v))
  }

  /** Left-join a batch against the CURRENT table state — the
    * CDC-maintained slowly-changing-dimension pattern: one stream
    * keeps this table current via [[applyBatch]], another stream calls
    * this from its own foreachBatch to decorate events with the
    * dimension as-of that micro-batch. Unmatched keys keep a null
    * `payload` (route them to a dead-letter flow or coalesce a
    * default — dropping them silently is the classic enrichment bug).
    * The join is left to AQE: a small dimension broadcasts, a huge one
    * shuffle-joins — both correct, and the bucketed layout keeps the
    * state read O(table), never O(history). */
  def enrich(batch: DataFrame, joinCol: String): DataFrame =
    batch.join(
      current(batch.sparkSession).withColumnRenamed("pkey", joinCol),
      Seq(joinCol), "left")

  /** Merge one micro-batch of changes — columns (pkey STRING,
    * operation STRING, payload STRING, lsn LONG, [ord INT]); operation
    * `delete` (any case) drops the key, anything else upserts. Returns
    * false on a replayed batchId (no-op). */
  def applyBatch(changes: DataFrame, batchId: Long): Boolean = {
    checkOrWriteMeta(write = true)
    val done = commits()
    if (done.exists(_._1 == batchId)) false
    else {
      val spark = changes.sparkSession
      val prev = done.lastOption.map(_._2).getOrElse(-1L)
      if (changes.isEmpty) {
        // idle trigger: nothing to merge — commit against the previous
        // version instead of touching the table
        CommitLog.append(logPath, batchId, prev)
      } else {
        val next = prev + 1
        val ordCol =
          if (changes.columns.contains("ord")) col("ord") else lit(0)
        val w = Window.partitionBy(col("pkey"))
          .orderBy(col("lsn").desc, ordCol.desc)
        val bucketOf = pmod(hash(col("pkey")), lit(nBuckets)).cast("long")
        val latest = changes
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("pkey"), col("operation"),
            col("payload").as("new_payload"))
        // the touched-bucket list is <= nBuckets small integers — a
        // bounded driver round-trip by construction, not a data collect
        val touched = latest.select(bucketOf.as("b"))
          .distinct().collect().map(_.getLong(0)).toSet
        val prevMan = manifest(prev)
        val cur = readBuckets(spark,
          prevMan.filter { case (b, _) => touched(b) })
        cur.join(latest, Seq("pkey"), "full_outer")
          .filter(lower(coalesce(col("operation"), lit("keep"))) =!= "delete")
          .select(col("pkey"),
            when(col("operation").isNull, col("payload"))
              .otherwise(col("new_payload")).as("payload"))
          .withColumn("bucket", bucketOf)
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$dir/v=$next")
        // new manifest: touched buckets point at v=next (when the
        // merge left them any rows — a fully-deleted bucket drops out),
        // untouched buckets keep their previous reference
        val entries =
          prevMan.filterNot { case (b, _) => touched(b) } ++
            touched.toSeq.sorted
              .filter(b => Files.isDirectory(Paths.get(bucketDir(next, b))))
              .map(b => (b, next))
        CommitLog.rewrite(manifestPath(next),
          entries.map { case (b, v) => Seq(b, v) })
        CommitLog.append(logPath, batchId, next)
      }
      compact()
      true
    }
  }

  /** Prune the commit log, manifests and unreferenced versions once
    * the log outgrows 4x the retention window (amortized: one rewrite
    * per ~3x window of commits, not per batch). */
  private def compact(): Unit = {
    val all = commits()
    if (all.size > 4 * retainVersions) {
      val tail = all.takeRight(retainVersions)
      CommitLog.rewrite(logPath, tail.map(t => Seq(t._1, t._2)))
      val liveManifests = tail.map(_._2).filter(_ >= 0).distinct
      val liveVersions =
        (liveManifests ++ liveManifests.flatMap(manifest).map(_._2)).toSet
      val maxLive = (liveVersions + Long.MinValue).max
      val root = Paths.get(dir)
      val listing = Files.list(root)
      try {
        listing.iterator().forEachRemaining { p =>
          val nm = p.getFileName.toString
          def num(prefix: String) =
            try nm.stripPrefix(prefix).toLong
            catch { case _: NumberFormatException => Long.MinValue }
          if (nm.startsWith("v=")) {
            val v = num("v=")
            // only versions BELOW the newest live one are fair game: a
            // crashed in-flight v=<next> above it must survive for its
            // replay to overwrite
            if (v >= 0 && v < maxLive && !liveVersions(v)) deleteTree(p)
          } else if (nm.startsWith("m=")) {
            val v = num("m=")
            if (v >= 0 && v < maxLive && !liveManifests.contains(v))
              Files.deleteIfExists(p)
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
