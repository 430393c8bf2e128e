package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream/batch parity for the monitoring kernels (Monitors.scala):
  * zone-map statistics and A/B engagement counts are maintained AT
  * WRITE TIME in production — the ingest-side complete-mode aggregate
  * over the live feed must land on the same tables the oracle-checked
  * batch queries (q_zone_map_prune, q_ab_readout) compute from rest.
  * Same closure pattern as StreamingSketchParitySpec. */
class StreamingMonitorParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming zone-map stats across batches == batch zoneStats") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val o = Tables.orders(spark, sf)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"), col("o_orderkey"))
      .as[(Long, Long)].collect().toSeq
    assert(o.size >= 100, s"feed too small: ${o.size}")

    val in = MemoryStream[(Long, Long)]
    val stats = graft.functions.Monitors.zoneStats(
      in.toDF().toDF("m", "o_orderkey"), "clustered",
      expr("m div 12 - 1995"))
    val q = stats.writeStream.format("memory").queryName("zm_stream")
      .outputMode(OutputMode.Complete).start()
    o.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .foreach { case (_, b) =>
        in.addData(b.map(_._1)); q.processAllAvailable()
      }
    val streamed = spark.table("zm_stream")
      .select("layout", "file", "min_m", "max_m", "rows")
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    q.stop()

    val batch = graft.functions.Monitors.zoneStats(
      Tables.orders(spark, sf).select(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"), col("o_orderkey")),
      "clustered", expr("m div 12 - 1995"))
      .select("layout", "file", "min_m", "max_m", "rows")
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streaming zone-map stats != batch (${streamed} vs ${batch})")
  }

  test("streaming monthly revenue spine across batches == batch spine") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val o = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("string"), col("o_totalprice"))
      .as[(String, Double)].collect().toSeq
    assert(o.size >= 100)
    val in = MemoryStream[(String, Double)]
    val spine = graft.functions.Monitors.monthlyCents(
      in.toDF().toDF("o_orderdate", "o_totalprice")
        .withColumn("o_orderdate", col("o_orderdate").cast("date")))
    val q = spine.writeStream.format("memory").queryName("spine_stream")
      .outputMode(OutputMode.Complete).start()
    o.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .foreach { case (_, b) =>
        in.addData(b.map(_._1)); q.processAllAvailable()
      }
    val streamed = spark.table("spine_stream")
      .select(col("m"), col("rq").cast("string"))
      .as[(Int, String)].collect().sorted.toSeq
    q.stop()
    val batch = graft.functions.Monitors.monthlyCents(
      Tables.orders(spark, sf))
      .select(col("m"), col("rq").cast("string"))
      .as[(Int, String)].collect().sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streaming spine != batch (${streamed.size} vs ${batch.size})")
  }

  test("streaming engagement counts across batches == batch counts") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select("event_type", "user_id").as[(String, Long)]
      .collect().toSeq
    val in = MemoryStream[(String, Long)]
    val counts = graft.functions.Monitors.engagementCounts(
      in.toDF().toDF("event_type", "user_id"))
    val q = counts.writeStream.format("memory").queryName("eng_stream")
      .outputMode(OutputMode.Complete).start()
    ev.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .foreach { case (_, b) =>
        in.addData(b.map(_._1)); q.processAllAvailable()
      }
    val streamed = spark.table("eng_stream")
      .as[(String, Long, Long)].collect().sorted.toSeq
    q.stop()

    val batch = graft.functions.Monitors.engagementCounts(
      Tables.events(spark, sf).select("event_type", "user_id"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streaming engagement counts != batch" +
        s" (${streamed.size} vs ${batch.size})")
  }
}
