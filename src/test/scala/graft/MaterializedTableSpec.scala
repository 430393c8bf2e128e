package graft

import graft.catalog.PkCatalog
import graft.core.PrimaryKeyMapItem
import graft.functions.Cdc
import graft.streaming.MaterializedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** CDC feed → maintained table state: upsert/delete/last-wins per
  * batch, version chain, and replay idempotence. */
class MaterializedTableSpec extends SparkSpec {
  import spark.implicits._

  private def state(mt: MaterializedTable): Map[String, String] =
    mt.current(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("upserts, deletes and in-batch last-wins materialize correctly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt").toString
    val mt = new MaterializedTable(dir)
    // batch 0: two inserts, plus an immediate same-batch update of k1
    // (LSN order within the batch must apply last-wins, not both)
    assert(mt.applyBatch(Seq(
      ("k1", "insert", "a0", 1L), ("k2", "insert", "b0", 2L),
      ("k1", "update", "a1", 3L))
      .toDF("pkey", "operation", "payload", "lsn"), 0L))
    assert(state(mt) == Map("k1" -> "a1", "k2" -> "b0"))
    // batch 1: update k2, delete k1, insert k3
    assert(mt.applyBatch(Seq(
      ("k2", "update", "b1", 4L), ("k1", "delete", null, 5L),
      ("k3", "insert", "c0", 6L))
      .toDF("pkey", "operation", "payload", "lsn"), 1L))
    assert(state(mt) == Map("k2" -> "b1", "k3" -> "c0"))
    // replay batch 1 (at-least-once feed): must be a no-op
    assert(!mt.applyBatch(Seq(("k9", "insert", "x", 7L))
      .toDF("pkey", "operation", "payload", "lsn"), 1L))
    assert(state(mt) == Map("k2" -> "b1", "k3" -> "c0"))
    // versions chain monotonically with one entry per applied batch
    assert(mt.commits() == Seq((0L, 0L), (1L, 1L)))
  }

  test("incremental table over the synthetic feed equals batch cdc_apply") {
    // the same change stream, two execution models: cdc_apply merges
    // it in ONE batch query; MaterializedTable applies it as three
    // LSN-ordered micro-batches. The results must be identical — the
    // batch/streaming parity claim, actually checked. The initial
    // table state rides in as batch 0 (synthetic initial load).
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-parity").toString
    val mt = new MaterializedTable(dir)
    val d = sf
    val base = Tables.events(spark, d)
      .select(col("event_id"), col("value"))
    val changes = operators.CdcQueries.syntheticChangesForTest(base)
      .select(col("event_id").cast("string").as("pkey"),
        col("op").as("operation"),
        col("new_value").cast("string").as("payload"), col("lsn"))
    mt.applyBatch(base.select(col("event_id").cast("string").as("pkey"),
      lit("insert").as("operation"),
      col("value").cast("string").as("payload"), lit(-1L).as("lsn")), 0L)
    // split by LSN terciles so later batches supersede earlier ones
    val cuts = changes.select(col("lsn")).agg(
      max(col("lsn")).as("mx")).collect().head.getLong(0)
    mt.applyBatch(changes.filter(col("lsn") <= cuts / 3), 1L)
    mt.applyBatch(changes.filter(col("lsn") > cuts / 3 &&
      col("lsn") <= 2 * cuts / 3), 2L)
    mt.applyBatch(changes.filter(col("lsn") > 2 * cuts / 3), 3L)
    val streaming = state(mt)
    val batch = SparkEntry.queries("cdc_apply")(spark, d)
      .select(col("event_id").cast("string"),
        col("value").cast("string")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streaming == batch)
    assert(batch.nonEmpty)
  }

  test("asOf time travel reads any retained version; missing batch throws") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-asof").toString
    val mt = new MaterializedTable(dir)
    mt.applyBatch(Seq(("k1", "insert", "a0", 1L))
      .toDF("pkey", "operation", "payload", "lsn"), 0L)
    mt.applyBatch(Seq(("k1", "update", "a1", 2L),
      ("k2", "insert", "b0", 3L))
      .toDF("pkey", "operation", "payload", "lsn"), 1L)
    def asOfMap(b: Long) = mt.asOf(spark, b).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(asOfMap(0L) == Map("k1" -> "a0"))
    assert(asOfMap(1L) == Map("k1" -> "a1", "k2" -> "b0"))
    assert(state(mt) == asOfMap(1L))
    intercept[IllegalArgumentException](mt.asOf(spark, 99L))
  }

  test("intra-transaction LSN ties break on the ord column, deterministically") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-ord").toString
    val mt = new MaterializedTable(dir)
    // one transaction = one LSN for every exploded change; the ord
    // column (within-message index) must decide, not shuffle order
    assert(mt.applyBatch(Seq(
      ("k1", "insert", "a", 1L, 0), ("k1", "update", "b", 1L, 1),
      ("k2", "insert", "c", 1L, 2))
      .toDF("pkey", "operation", "payload", "lsn", "ord"), 0L))
    assert(state(mt) == Map("k1" -> "b", "k2" -> "c"))
  }

  test("uppercase DELETE drops the key (test_decoding operations)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-del").toString
    val mt = new MaterializedTable(dir)
    mt.applyBatch(Seq(("k1", "INSERT", "a", 1L))
      .toDF("pkey", "operation", "payload", "lsn"), 0L)
    mt.applyBatch(Seq(("k1", "DELETE", null, 2L))
      .toDF("pkey", "operation", "payload", "lsn"), 1L)
    assert(state(mt) == Map.empty)
  }

  test("empty batch commits log-only without rewriting the table") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-idle").toString
    val mt = new MaterializedTable(dir)
    mt.applyBatch(Seq(("k1", "insert", "a", 1L))
      .toDF("pkey", "operation", "payload", "lsn"), 0L)
    assert(mt.applyBatch(Seq.empty[(String, String, String, Long)]
      .toDF("pkey", "operation", "payload", "lsn"), 1L))
    assert(mt.commits() == Seq((0L, 0L), (1L, 0L)),
      "idle trigger must reference the previous version, not rewrite")
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dir, "v=1")))
    assert(state(mt) == Map("k1" -> "a"))
  }

  test("a torn commit-log line is dropped and heals on the next append") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-torn").toString
    val mt = new MaterializedTable(dir)
    mt.applyBatch(Seq(("k1", "insert", "a", 1L))
      .toDF("pkey", "operation", "payload", "lsn"), 0L)
    // simulate a crash mid-append: partial line, no trailing newline
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_commits"),
      "7".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    assert(mt.commits() == Seq((0L, 0L)), "partial line must be ignored")
    // the next apply must not concatenate into a corrupt "71,1" line
    assert(mt.applyBatch(Seq(("k2", "insert", "b", 2L))
      .toDF("pkey", "operation", "payload", "lsn"), 1L))
    assert(mt.commits() == Seq((0L, 0L), (1L, 1L)))
    assert(state(mt) == Map("k1" -> "a", "k2" -> "b"))
  }

  test("retention compacts the commit log and prunes dead versions") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-ret").toString
    val mt = new MaterializedTable(dir, retainVersions = 2)
    // 9 updates of the SAME key: one bucket, so each version fully
    // supersedes the last and pruning is deterministic. Compaction
    // triggers once the log exceeds 4 x retainVersions = 8 lines.
    for (b <- 0L to 8L)
      assert(mt.applyBatch(Seq(("k", "update", "p" + b, b))
        .toDF("pkey", "operation", "payload", "lsn"), b))
    val after = mt.commits()
    assert(after == Seq((7L, 7L), (8L, 8L)),
      s"log must be rewritten to its live tail, got $after")
    // pruned: versions referenced by no retained manifest; kept: the
    // tail's versions (each retained manifest references only its own
    // version here — single bucket, always touched)
    for (v <- 0L to 6L)
      assert(!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, s"v=$v")), s"v=$v must be pruned")
    for (v <- 7L to 8L)
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, s"v=$v")), s"v=$v must survive")
    // state is intact and the retained replay window still dedupes
    assert(state(mt) == Map("k" -> "p8"))
    assert(!mt.applyBatch(Seq(("k9", "insert", "x", 99L))
      .toDF("pkey", "operation", "payload", "lsn"), 8L),
      "latest batchId must still be recognized as a replay")
  }

  test("untouched buckets carry forward by reference, not by rewrite") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-buck").toString
    val mt = new MaterializedTable(dir)
    // 20 keys spread across the 16 buckets, then one single-key update
    assert(mt.applyBatch((0 until 20)
      .map(i => (s"k$i", "insert", s"p$i", i.toLong))
      .toDF("pkey", "operation", "payload", "lsn"), 0L))
    assert(mt.applyBatch(Seq(("k3", "update", "p3b", 100L))
      .toDF("pkey", "operation", "payload", "lsn"), 1L))
    // v=1 must hold exactly ONE bucket directory — k3's — while every
    // other bucket still lives in v=0 and is reached via the manifest
    val v1Buckets = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "v=1")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    v1Buckets.forEachRemaining(p => {
      val n = p.getFileName.toString
      if (n.startsWith("bucket=")) names += n
    })
    assert(names.size == 1,
      s"single-key batch must rewrite one bucket, wrote: $names")
    val expected = (0 until 20).map(i => s"k$i" ->
      (if (i == 3) "p3b" else s"p$i")).toMap
    assert(state(mt) == expected)
  }

  test("retention keeps a version re-referenced by an empty-batch commit") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-ret-idle").toString
    val mt = new MaterializedTable(dir, retainVersions = 2)
    mt.applyBatch(Seq(("k0", "insert", "a", 1L))
      .toDF("pkey", "operation", "payload", "lsn"), 0L)
    // 8 idle commits all re-reference v=0; the 9th commit compacts and
    // the tail is (7,0),(8,0) — v=0 is old numerically but still live
    for (b <- 1L to 8L)
      mt.applyBatch(Seq.empty[(String, String, String, Long)]
        .toDF("pkey", "operation", "payload", "lsn"), b)
    assert(mt.commits() == Seq((7L, 0L), (8L, 0L)))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dir, "v=0")),
      "a version referenced by the retained tail must not be deleted")
    assert(state(mt) == Map("k0" -> "a"))
  }

  test("layout metadata pins nBuckets: mismatched reopen fails loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-meta").toString
    val mt = new MaterializedTable(dir, nBuckets = 16)
    mt.applyBatch(Seq(("k1", "insert", "a", 1L))
      .toDF("pkey", "operation", "payload", "lsn"), 0L)
    // same params: reopen reads and writes fine
    val same = new MaterializedTable(dir, nBuckets = 16)
    assert(state(same) == Map("k1" -> "a"))
    // different bucket count: both the reader and the writer refuse —
    // a key's bucket is part of the on-disk layout
    val other = new MaterializedTable(dir, nBuckets = 8)
    val eR = intercept[IllegalArgumentException] { other.current(spark) }
    assert(eR.getMessage.contains("nBuckets"))
    val eW = intercept[IllegalArgumentException] {
      other.applyBatch(Seq(("k2", "insert", "b", 2L))
        .toDF("pkey", "operation", "payload", "lsn"), 1L)
    }
    assert(eW.getMessage.contains("nBuckets"))
    // a committed table with no _meta (pre-metadata layout) is refused
    // rather than guessed at
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_meta"))
    val eM = intercept[IllegalStateException] {
      new MaterializedTable(dir, nBuckets = 16).current(spark)
    }
    assert(eM.getMessage.contains("_meta"))
  }

  test("end-to-end: wal2json feed parses and materializes per micro-batch") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mt-e2e").toString
    val mt = new MaterializedTable(dir)
    val cat = PkCatalog.fromItems(spark, Seq(
      PrimaryKeyMapItem("public.species", "id", "integer", 1)))
    def payload(xid: Long, kind: String, id: Int): String =
      s"""{"xid": $xid, "change": [{"kind": "$kind", "schema": "public",
         |"table": "species", "columnnames": ["id"],
         |"columntypes": ["integer"], "columnvalues": [$id]}]}"""
        .stripMargin.replace("\n", " ")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("lsn", "payload")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val parsed = Cdc.parseWal2Json(b, "payload", cat)
        mt.applyBatch(parsed.selectExpr("pkey",
          "operation", "concat('xid=', xid) AS payload", "lsn"), id)
        ()
      }
      .start()
    in.addData((1L, payload(100, "insert", 7)), (2L, payload(101, "insert", 8)))
    q.processAllAvailable()
    in.addData((3L, payload(102, "update", 7)), (4L, payload(103, "delete", 8)))
    q.processAllAvailable()
    q.stop()
    assert(state(mt) == Map("7" -> "xid=102"))
  }
}
