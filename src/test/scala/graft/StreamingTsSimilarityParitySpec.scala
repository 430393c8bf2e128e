package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream/batch parity for time-series similarity's ingest face
  * (graft.functions.TimeSeries): at 100 TB the ONLY stage that scans
  * raw events is the per-(user, week) count aggregate, so that is
  * what streams — a Complete-mode maintained table over the live
  * feed (the Monitors.scala discipline). The corpus-adaptive
  * blocking + exact-Pearson verify kernel
  * ([[graft.functions.TimeSeries.similarPairs]]) then runs over the
  * bounded maintained table — the SAME definition the batch
  * q_ts_similarity calls, so the per-refresh pair output must equal
  * the batch query row for row. (The blocking keys — SAX word ladder
  * and equi-depth volume bucket — are corpus-global by design, so
  * the production shape is incremental state + periodic re-block of
  * the |users|-bounded feature table, exactly what this pins.) */
class StreamingTsSimilarityParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming weekly counts + shared kernel == batch q_ts_similarity") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("string"))
      .as[(Long, String)].collect().toSeq
    assert(ev.size >= 100, s"feed too small: ${ev.size}")

    val in = MemoryStream[(Long, String)]
    val counts = graft.functions.TimeSeries.weeklyCounts(
      in.toDF().toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp")))
    val q = counts.writeStream.format("memory").queryName("ts_weekly")
      .outputMode(OutputMode.Complete).start()
    // three micro-batches split by arrival order, so per-(user, week)
    // counts genuinely accumulate across batches
    ev.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .foreach { case (_, b) =>
        in.addData(b.map(_._1)); q.processAllAvailable()
      }
    val streamed = graft.functions.TimeSeries
      .similarPairs(spark.table("ts_weekly"))
      .as[(Long, Long, String, Long)].collect().sorted.toSeq
    q.stop()

    val batch = SparkEntry.queries("q_ts_similarity")(spark, sf)
      .as[(Long, Long, String, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty, "batch similarity output must be non-trivial")
    assert(streamed == batch,
      s"stream (${streamed.size} pairs) != batch (${batch.size} pairs)")
  }
}
