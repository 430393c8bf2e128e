package graft

import graft.streaming.Scd2History
import org.apache.spark.sql.functions._

/** Streaming SCD2 maintenance vs the batch cdc_scd2 window query: the
  * same synthetic change feed, two execution models, row-identical
  * history tables. */
class Scd2ParitySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Double, Long, Option[Long], Long)] =
    df.select(col("id"), col("value"), col("valid_from_lsn"),
      col("valid_to_lsn"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
      .toSet

  test("incremental SCD2 over the synthetic feed equals batch cdc_scd2") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scd2").toString
    val h = new Scd2History(dir)
    val d = sf
    val base = Tables.events(spark, d)
      .select(col("event_id"), col("value"))
    val changes = operators.CdcQueries.syntheticChangesForTest(base)
      .select(col("event_id").as("id"), col("op"),
        col("new_value"), col("lsn"))
    // batch 0 = the synthetic initial load at LSN -1, exactly the row
    // the batch query unions in
    h.applyBatch(base.select(col("event_id").as("id"),
      lit("insert").as("op"), col("value").as("new_value"),
      lit(-1L).as("lsn")), 0L)
    // LSN terciles: per-key LSNs are non-decreasing across batches
    // because the split is by LSN itself
    val mx = changes.agg(max(col("lsn"))).collect().head.getLong(0)
    h.applyBatch(changes.filter(col("lsn") <= mx / 3), 1L)
    h.applyBatch(changes.filter(col("lsn") > mx / 3 &&
      col("lsn") <= 2 * mx / 3), 2L)
    h.applyBatch(changes.filter(col("lsn") > 2 * mx / 3), 3L)
    // replay of an already-applied batch must be a no-op
    assert(!h.applyBatch(changes.limit(1)
      .select(col("id"), col("op"), col("new_value"), col("lsn")), 2L))

    val streaming = rows(h.current(spark))
    val batch = rows(SparkEntry.queries("cdc_scd2")(spark, d)
      .withColumnRenamed("event_id", "id"))
    assert(batch.nonEmpty)
    assert(streaming == batch)
  }

  test("streaming e2e: foreachBatch maintains SCD2 history across micro-batches") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scd2-e2e").toString
    val h = new Scd2History(dir)
    val in = MemoryStream[(Long, String, Double, Long)]
    val q = in.toDF().toDF("id", "op", "new_value", "lsn")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        h.applyBatch(b, id); ()
      }
      .start()
    in.addData((1L, "insert", 10.0, 0L), (2L, "insert", 20.0, 1L))
    q.processAllAvailable()
    in.addData((1L, "update", 11.0, 2L))
    q.processAllAvailable()
    q.stop()
    val cur = rows(h.current(spark))
    assert(cur == Set(
      (1L, 10.0, 0L, Some(2L), 0L),
      (1L, 11.0, 2L, None, 1L),
      (2L, 20.0, 1L, None, 1L)))
  }

  test("a key whose last change is a delete ends with no current row") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scd2-del").toString
    val h = new Scd2History(dir)
    h.applyBatch(Seq((1L, "insert", 10.0, 0L), (2L, "insert", 20.0, 1L))
      .toDF("id", "op", "new_value", "lsn"), 0L)
    // in-batch chain: update then delete of key 1 in ONE batch
    h.applyBatch(Seq((1L, "update", 11.0, 2L), (1L, "delete", 0.0, 3L))
      .toDF("id", "op", "new_value", "lsn"), 1L)
    val cur = h.current(spark)
    assert(cur.filter(col("is_current") === 1).select(col("id"))
      .as[Long].collect().toSet == Set(2L))
    // key 1's history: two closed versions (insert 0→2, update 2→3)
    val k1 = cur.filter(col("id") === 1)
      .select(col("valid_from_lsn"), col("valid_to_lsn"))
      .as[(Long, Long)].collect().toSet
    assert(k1 == Set((0L, 2L), (2L, 3L)))
  }
}
